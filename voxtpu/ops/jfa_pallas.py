"""Pallas TPU JFA — VMEM-tiled flood steps over a packed-seed state.

Performance path for the SDF op (reference: `jfa/tiled.cu`). Design,
driven by measurement (BENCH_NOTES.md):

- **State is ONE int32 grid** of 10-bit-packed (z, y, x) seed indices
  (-1 = no seed). The flood is HBM-bound on state re-reads, so the
  smallest state wins; the sdf value is recomputed from the seed (8
  flops) instead of traveling between steps, and validity is `seed >= 0`
  (the reference's `isfinite` test, `jfa/sequential.cpp:96-101`).
- Each flood step at stride k runs one Pallas kernel with a grid over Z
  planes; the kernel receives the three source planes z-k, z, z+k as
  VMEM blocks. **In-plane (y, x) shifts are circular rolls + validity
  masks** — no padded-buffer materialization anywhere (the reference's
  shared-memory tiling only engages for k <= 2, `jfa/tiled.cu:297-323`;
  every element here is read <= 3x from HBM per step at any k, vs its 26
  strided global reads in the k > 2 fallback, `jfa/naive.cu:62-119`).
- The k sequence N/2 ... 1 is static, so the entire flood (log2 N pallas
  calls + the XLA seed init) compiles as ONE jit; ping-pong buffers are
  SSA values. World coordinates are reconstructed exactly as the
  reference computes them (origin + idx * voxel_size, float32), so
  distances match the oracle to float rounding.

Seeds are 10-bit packed (supports N <= 1024). The full-plane kernel's
per-step live set (~26 candidate planes) fits scoped VMEM to N = 512;
N = 1024 uses the y-blocked kernel below (row-band outputs, same
selection bit-for-bit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.ops.jfa import jfa_init_seed

_MASK10 = 0x3FF


def _step_kernel(n: int, k: int):
    from jax.experimental import pallas as pl

    def kernel(seed_m, seed_0, seed_p, org_ref, out_seed):
        z = pl.program_id(0)
        ox, oy, oz, vs = org_ref[0], org_ref[1], org_ref[2], org_ref[3]

        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)  # y
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)  # x
        px = ox + cols.astype(jnp.float32) * vs
        py = oy + rows.astype(jnp.float32) * vs
        pz = oz + jnp.float32(z) * vs

        # Float world-space selection, the reference's exact formula
        # (`jfa/jfa.h:19-20`). NOTE (round-3 negative result, kept for
        # the record): selecting by exact integer voxel distance is ~2x
        # less VPU work and measured 10.5 ms vs 12.75 ms @256^3 — but
        # exact-int ties break differently than the oracle's float
        # comparisons, tie decisions CASCADE through later flood steps,
        # and ~0.3% of voxels end with a different (sometimes several-%
        # farther) seed. Bit-parity with the sequential oracle on
        # hardware is part of this kernel's contract (tpu_smoke gates
        # on it), so the float formula stays.
        def seed_d2(seed):
            sx = (seed & _MASK10).astype(jnp.float32)
            sy = ((seed >> 10) & _MASK10).astype(jnp.float32)
            sz = ((seed >> 20) & _MASK10).astype(jnp.float32)
            d2 = ((px - (ox + sx * vs)) ** 2
                  + (py - (oy + sy * vs)) ** 2
                  + (pz - (oz + sz * vs)) ** 2)
            return jnp.where(seed < 0, jnp.float32(jnp.inf), d2)

        best_seed = seed_0[0]
        best_d2 = seed_d2(best_seed)

        planes = ((seed_m, -1), (seed_0, 0), (seed_p, 1))
        for seed_ref, dz in planes:
            zn = z + dz * k
            plane_ok = jnp.logical_and(zn >= 0, zn < n)
            plane = seed_ref[0]
            for dy in (-1, 0, 1):
                # neighbor row i reads plane row i + dy*k: circular roll
                # by -dy*k, rows pushed past the edge masked invalid.
                ry = jnp.roll(plane, -dy * k, axis=0) if dy else plane
                vy = (rows + dy * k >= 0) & (rows + dy * k < n) if dy else None
                for dx in (-1, 0, 1):
                    if dz == 0 and dy == 0 and dx == 0:
                        continue
                    nseed = jnp.roll(ry, -dx * k, axis=1) if dx else ry
                    valid = plane_ok
                    if vy is not None:
                        valid = vy & valid
                    if dx:
                        valid = valid & (cols + dx * k >= 0) & (cols + dx * k < n)
                    nseed = jnp.where(valid, nseed, jnp.int32(-1))
                    d2 = seed_d2(nseed)
                    better = d2 < best_d2
                    best_d2 = jnp.where(better, d2, best_d2)
                    best_seed = jnp.where(better, nseed, best_seed)
        out_seed[0] = best_seed

    return kernel


def _flood_step_pallas(seed, org, k: int, n: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def zmap(dz):
        return lambda z: (jnp.clip(z + dz * k, 0, n - 1), 0, 0)

    plane = lambda dz: pl.BlockSpec((1, n, n), zmap(dz))
    return pl.pallas_call(
        _step_kernel(n, k),
        grid=(n,),
        in_specs=[plane(-1), plane(0), plane(1),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, n, n), lambda z: (z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n, n), jnp.int32),
        # 26 live (n, n) intermediates: let Mosaic spill beyond the
        # default scoped-VMEM budget at n = 512; at n = 1024 a plane is
        # 4 MB, so open up to the v5e VMEM ceiling.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 if n <= 512 else 127) * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(seed, seed, seed, org)


# ---------------------------------------------------------------------------
# Round-5 y-blocked flood step (the "y-half-blocked kernel" flagged
# unbuilt in `jfa_pallas`'s 1024 routing note).
#
# At n = 1024 the full-plane `_step_kernel` holds ~26 live (n, n) f32
# candidate intermediates -> 151.6 MB of scoped VMEM, past the v5e's
# PHYSICAL 128 MB (no vmem_limit raise can admit it). This variant
# computes the output in (1, H, n) row bands, shrinking the candidate
# live set n/H-fold, and resolves the dy*k row shift ENTIRELY in block
# index maps + static slices (Mosaic's TC lowering has no
# dynamic_slice-of-value, and sublane shifts as dynamic ops cost VPU
# the legacy kernel does not pay):
#
# - Nine (1, H, n) input blocks, one per (dz, dy): block (z + dz*k,
#   h + dy*(k//H)) when H | k (the dy-shifted band is block-aligned),
#   or blocks (z + dz*k, h + {-1, 0, 1}) when k < H, concatenated and
#   statically sliced at rows [H + dy*k, 2H + dy*k) (dy*k is a trace
#   constant). Edge clamping is safe: a clamped band's rows are
#   exactly the rows the validity mask kills (for H | k, h + dy*q
#   clips iff every row's y + dy*k is out of grid; for k < H the
#   clamped neighbor's mis-mapped rows are precisely the |dy*k| rows
#   with y + dy*k outside [0, n)).
# - dx shifts stay circular lane rolls of (H, n) bands, as in
#   `_step_kernel`.
#
# Selection formula, candidate order, and strict-< tie-breaks are
# exactly `_step_kernel`'s, so outputs are bit-identical
# (`tests/test_jfa_pallas.py::test_yblocked_step_bit_matches_full_plane`
# + the `jfa_yblocked_vs_full_plane@32` hardware smoke gate).
#
# HBM traffic per step is 9 band-reads + 1 write per element (vs the
# full-plane kernel's 3 + 1), but the flood is VPU-bound (round-4
# micro-probe) with ~2.4x headroom to the roofline at this ratio.
# ---------------------------------------------------------------------------


def _step_kernel_yblocked(n: int, k: int, H: int):
    from jax.experimental import pallas as pl

    def kernel(*refs):
        bands = refs[:9]       # (dz, dy) row-major: dz -1,0,1 x dy -1,0,1
        org_ref, out_seed = refs[9], refs[10]
        z = pl.program_id(0)
        h = pl.program_id(1)
        y0 = h * H
        ox, oy, oz, vs = org_ref[0], org_ref[1], org_ref[2], org_ref[3]

        rows = jax.lax.broadcasted_iota(jnp.int32, (H, n), 0) + y0  # global y
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, n), 1)       # x
        px = ox + cols.astype(jnp.float32) * vs
        py = oy + rows.astype(jnp.float32) * vs
        pz = oz + jnp.float32(z) * vs

        def seed_d2(seed):
            sx = (seed & _MASK10).astype(jnp.float32)
            sy = ((seed >> 10) & _MASK10).astype(jnp.float32)
            sz = ((seed >> 20) & _MASK10).astype(jnp.float32)
            d2 = ((px - (ox + sx * vs)) ** 2
                  + (py - (oy + sy * vs)) ** 2
                  + (pz - (oz + sz * vs)) ** 2)
            return jnp.where(seed < 0, jnp.float32(jnp.inf), d2)

        def band(dzi, dy):
            """Rows [y0 + dy*k, y0 + dy*k + H) of source plane dzi."""
            if dy == 0 or k % H == 0:
                return bands[dzi * 3 + (dy + 1)][0]
            tri = jnp.concatenate(
                [bands[dzi * 3 + j][0] for j in (0, 1, 2)], axis=0)
            return jax.lax.slice_in_dim(tri, H + dy * k, 2 * H + dy * k,
                                        axis=0)

        best_seed = band(1, 0)
        best_d2 = seed_d2(best_seed)

        for dzi, dz in enumerate((-1, 0, 1)):
            zn = z + dz * k
            plane_ok = jnp.logical_and(zn >= 0, zn < n)
            for dy in (-1, 0, 1):
                ry = band(dzi, dy)
                vy = (rows + dy * k >= 0) & (rows + dy * k < n) if dy else None
                for dx in (-1, 0, 1):
                    if dz == 0 and dy == 0 and dx == 0:
                        continue
                    nseed = jnp.roll(ry, -dx * k, axis=1) if dx else ry
                    valid = plane_ok
                    if vy is not None:
                        valid = vy & valid
                    if dx:
                        valid = valid & (cols + dx * k >= 0) & (cols + dx * k < n)
                    nseed = jnp.where(valid, nseed, jnp.int32(-1))
                    d2 = seed_d2(nseed)
                    better = d2 < best_d2
                    best_d2 = jnp.where(better, d2, best_d2)
                    best_seed = jnp.where(better, nseed, best_seed)
        out_seed[0] = best_seed

    return kernel


def _flood_step_pallas_yblocked(seed, org, k: int, n: int, H: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n % H == 0 and H % 8 == 0, (n, H)
    if k > H and k % H:
        # The block-aligned dy shift needs H | k and the concat shift
        # needs k < H; the halving sequence violates both only at
        # non-power-of-two n (e.g. n = 544 -> k = 272 with H = 256),
        # where the candidate live set is small enough for the
        # full-plane kernel anyway.
        return _flood_step_pallas(seed, org, k, n)
    nb = n // H
    q = k // H  # 0 when k < H: neighbor blocks, sliced statically

    def bmap(dz, dy):
        hoff = dy * q if q else dy
        return lambda z, h: (jnp.clip(z + dz * k, 0, n - 1),
                             jnp.clip(h + hoff, 0, nb - 1), 0)

    in_specs = [pl.BlockSpec((1, H, n), bmap(dz, dy))
                for dz in (-1, 0, 1) for dy in (-1, 0, 1)]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    return pl.pallas_call(
        _step_kernel_yblocked(n, k, H),
        grid=(n, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, n), lambda z, h: (z, h, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # 9 (H, n) source bands (double-buffered) + ~26 (H, n) live
            # candidate intermediates; at n = 1024, H = 256 this is
            # ~18 + ~40 MB — inside the v5e's 128 MB where the
            # full-plane kernel's 151.6 MB is not.
            vmem_limit_bytes=127 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*([seed] * 9), org)


# ---------------------------------------------------------------------------
# Round-4 pipelined flood step.
#
# The 3-plane kernel above DMAs every plane 3x per step (as z-k, z, z+k
# source) and unpacks/world-converts each seed once PER CANDIDATE (26x).
# This variant walks each stride-k residue class r (planes r, r+k,
# r+2k, ... are exactly the z+/-k neighbors of each other) with a grid
# of (k, n/k + 1): step (r, j) fetches plane r + j*k ONCE, unpacks it
# once into world-coordinate planes (sxw = ox + sx*vs etc. — the exact
# per-candidate expressions of `_step_kernel`, hoisted), and computes
# the output for plane r + (j-1)*k from scratch-carried (prev, cur) +
# the just-fetched next. HBM traffic per step drops from 3 reads +
# 1 write to 1 + 1, and the per-candidate VPU work drops from
# unpack+convert+fma+distance (~24 ops) to distance-only (~12 ops +
# 3 extra rolls). Selection VALUES and ORDER are bit-identical to
# `_step_kernel` (same float formula, same candidate sequence, same
# strict-< tie-breaks), so oracle bit-parity is preserved — the
# round-3 exact-int lesson says that is the contract.
#
# `emit_sdf=True` additionally fuses the final signed-distance pass
# into the k=1 step (reads occ for the sign, writes f32 sign*d2 — the
# selected best_d2 IS the final kernel's recomputed d2, same formula).
# ---------------------------------------------------------------------------


def _pipe_kernel(n: int, k: int, emit_sdf: bool):
    from jax.experimental import pallas as pl

    L = n // k

    def _unpack(pk, ox, oy, oz, vs):
        sx = (pk & _MASK10).astype(jnp.float32)
        sy = ((pk >> 10) & _MASK10).astype(jnp.float32)
        sz = ((pk >> 20) & _MASK10).astype(jnp.float32)
        sxw = ox + sx * vs
        syw = oy + sy * vs
        szw = oz + sz * vs
        # Invalid (-1) seeds poison the z term: any d2 using them is
        # +inf, exactly `_step_kernel`'s where(seed < 0, inf, d2).
        szw = jnp.where(pk < 0, jnp.float32(jnp.inf), szw)
        return sxw, syw, szw

    def kernel(*refs):
        if emit_sdf:
            (seed_in, occ_in, org_ref, out_ref,
             pw_ref, pk_ref, cw_ref, ck_ref) = refs
        else:
            (seed_in, org_ref, out_ref,
             pw_ref, pk_ref, cw_ref, ck_ref) = refs
        r = pl.program_id(0)
        j = pl.program_id(1)
        ox, oy, oz, vs = org_ref[0], org_ref[1], org_ref[2], org_ref[3]

        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)  # y
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)  # x
        px = ox + cols.astype(jnp.float32) * vs
        py = oy + rows.astype(jnp.float32) * vs

        nk_pk = seed_in[0]
        nk_w = _unpack(nk_pk, ox, oy, oz, vs)

        @pl.when(j > 0)
        def _():
            z = r + (j - 1) * k
            pz = oz + z.astype(jnp.float32) * vs
            prev_ok = j >= 2          # z - k >= 0 (r < k)
            next_ok = j <= L - 1      # z + k <= n - 1

            # In-plane wrap masks, shared by all three levels.
            vy = {dy: (rows + dy * k >= 0) & (rows + dy * k < n)
                  for dy in (-1, 1)}
            vx = {dx: (cols + dx * k >= 0) & (cols + dx * k < n)
                  for dx in (-1, 1)}

            cur_w = (cw_ref[0], cw_ref[1], cw_ref[2])
            cur_pk = ck_ref[...]
            prev_w = (pw_ref[0], pw_ref[1], pw_ref[2])
            prev_pk = pk_ref[...]

            def d2_of(w):
                sxw, syw, szw = w
                return (px - sxw) ** 2 + (py - syw) ** 2 + (pz - szw) ** 2

            best_seed = cur_pk
            best_d2 = d2_of(cur_w)

            levels = ((prev_w, prev_pk, prev_ok, -1),
                      (cur_w, cur_pk, None, 0),
                      (nk_w, nk_pk, next_ok, 1))
            for (w, pk, ok, dz) in levels:
                for dy in (-1, 0, 1):
                    if dy:
                        ry_w = tuple(jnp.roll(a, -dy * k, axis=0) for a in w)
                        ry_pk = jnp.roll(pk, -dy * k, axis=0)
                    else:
                        ry_w, ry_pk = w, pk
                    for dx in (-1, 0, 1):
                        if dz == 0 and dy == 0 and dx == 0:
                            continue
                        if dx:
                            q_w = tuple(jnp.roll(a, -dx * k, axis=1)
                                        for a in ry_w)
                            q_pk = jnp.roll(ry_pk, -dx * k, axis=1)
                        else:
                            q_w, q_pk = ry_w, ry_pk
                        d2 = d2_of(q_w)
                        valid = None
                        if dy:
                            valid = vy[dy]
                        if dx:
                            valid = vx[dx] if valid is None else valid & vx[dx]
                        if ok is not None:
                            valid = ok if valid is None else valid & ok
                        if valid is not None:
                            d2 = jnp.where(valid, d2, jnp.float32(jnp.inf))
                        better = d2 < best_d2
                        best_d2 = jnp.where(better, d2, best_d2)
                        best_seed = jnp.where(better, q_pk, best_seed)

            if emit_sdf:
                sign = jnp.where(occ_in[0], jnp.float32(1), jnp.float32(-1))
                out_ref[0] = sign * best_d2
            else:
                out_ref[0] = best_seed

        # Rotate the pipeline: prev <- cur, cur <- just-fetched.
        pw_ref[...] = cw_ref[...]
        pk_ref[...] = ck_ref[...]
        cw_ref[0], cw_ref[1], cw_ref[2] = nk_w
        ck_ref[...] = nk_pk

    return kernel


def _flood_step_pipelined(seed, org, k: int, n: int,
                          occ=None, emit_sdf: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = n // k
    zmap = lambda r, j: (r + jnp.minimum(j, L - 1) * k, 0, 0)
    omap = lambda r, j: (r + jnp.maximum(j - 1, 0) * k, 0, 0)
    in_specs = [pl.BlockSpec((1, n, n), zmap)]
    args = [seed]
    if emit_sdf:
        in_specs.append(pl.BlockSpec((1, n, n), omap))
        args.append(occ)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    args.append(org)
    return pl.pallas_call(
        _pipe_kernel(n, k, emit_sdf),
        grid=(k, L + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, n), omap),
        out_shape=jax.ShapeDtypeStruct(
            (n, n, n), jnp.float32 if emit_sdf else jnp.int32),
        scratch_shapes=[pltpu.VMEM((3, n, n), jnp.float32),
                        pltpu.VMEM((n, n), jnp.int32),
                        pltpu.VMEM((3, n, n), jnp.float32),
                        pltpu.VMEM((n, n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            # n = 1024 planes are 4 MB; the 8 scratch planes + carried
            # world-coord quads need most of the v5e VMEM ceiling.
            vmem_limit_bytes=(100 if n <= 512 else 127) * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _final_kernel(n: int):
    from jax.experimental import pallas as pl

    def kernel(seed_ref, occ_ref, org_ref, out_ref):
        z = pl.program_id(0)
        ox, oy, oz, vs = org_ref[0], org_ref[1], org_ref[2], org_ref[3]
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        px = ox + cols.astype(jnp.float32) * vs
        py = oy + rows.astype(jnp.float32) * vs
        pz = oz + jnp.float32(z) * vs
        seed = seed_ref[0]
        sx = (seed & _MASK10).astype(jnp.float32)
        sy = ((seed >> 10) & _MASK10).astype(jnp.float32)
        sz = ((seed >> 20) & _MASK10).astype(jnp.float32)
        d2 = ((px - (ox + sx * vs)) ** 2
              + (py - (oy + sy * vs)) ** 2
              + (pz - (oz + sz * vs)) ** 2)
        d2 = jnp.where(seed < 0, jnp.float32(jnp.inf), d2)
        sign = jnp.where(occ_ref[0], jnp.float32(1), jnp.float32(-1))
        out_ref[0] = sign * d2

    return kernel


def _sdf_from_seed_pallas(seed, occ, org, n: int):
    """Final signed squared distance, one z-plane per grid step (avoids
    materializing 3D coordinate arrays in HBM at large N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _final_kernel(n),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, n, n), lambda z: (z, 0, 0)),
                  pl.BlockSpec((1, n, n), lambda z: (z, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, n, n), lambda z: (z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(seed, occ, org)


@functools.partial(jax.jit, static_argnames=("n", "pipe"))
def _jfa_pallas(occ, origin, voxel_size, *, n: int, pipe: bool = True):
    origin = jnp.asarray(origin, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    seed = jfa_init_seed(occ)
    org = jnp.concatenate([origin, vs[None]]).astype(jnp.float32)
    k = n // 2
    while k >= 2:
        # The residue walk covers all planes only when k | n (its grid
        # is (k, n//k + 1)); the halving sequence hits non-divisor
        # strides on non-power-of-two N (first at N = 224 = 32*7 ->
        # k = 3) — those steps use the bit-identical three-plane kernel.
        if pipe and n % k == 0:
            seed = _flood_step_pipelined(seed, org, k, n)
        else:
            seed = _flood_step_pallas(seed, org, k, n)
        k //= 2
    if pipe:  # k = 1 step fused with the final signed-distance pass
        return _flood_step_pipelined(seed, org, 1, n, occ=occ, emit_sdf=True)
    seed = _flood_step_pallas(seed, org, 1, n)
    return _sdf_from_seed_pallas(seed, occ, org, n)


@functools.partial(jax.jit, static_argnames=("n",))
def _init_jit(occ, *, n: int):
    return jfa_init_seed(occ)


@functools.partial(jax.jit, static_argnames=("k", "n", "pipe", "yblock"))
def _step_jit(seed, org, *, k: int, n: int, pipe: bool = True,
              yblock: int = 0):
    if yblock:
        return _flood_step_pallas_yblocked(seed, org, k, n, yblock)
    if pipe and n % k == 0:  # see _jfa_pallas: residue walk needs k | n
        return _flood_step_pipelined(seed, org, k, n)
    return _flood_step_pallas(seed, org, k, n)


@functools.partial(jax.jit, static_argnames=("n",))
def _final_step_jit(seed, occ, org, *, n: int):
    return _flood_step_pipelined(seed, org, 1, n, occ=occ, emit_sdf=True)


@functools.partial(jax.jit, static_argnames=("n",))
def _final_jit(seed, occ, org, *, n: int):
    return _sdf_from_seed_pallas(seed, occ, org, n)


def _jfa_pallas_stepped(occ, origin, voxel_size, *, n: int,
                        pipe: bool = True, yblock: int = 0):
    """Per-step dispatch for large N: one jit per flood step, so buffers
    free between steps. The single whole-flood jit OOMs at 1024^3 — XLA's
    buffer assignment keeps every pallas step's 4 GB output live for the
    duration of the program instead of ping-ponging two buffers. (Buffer
    donation on the step was tried and reverted: donated inputs abort
    through the remote-execution tunnel.)

    `yblock=H` routes every step through the (1, H, n) row-band kernel
    (required at n = 1024, where the full-plane kernel's candidate live
    set exceeds physical VMEM). Steps whose outputs are large enough to
    stack under the runtime's enqueue-ahead are fenced host-side with
    the same depth-windowed mechanism as the stepped XLA flood
    (`voxtpu.ops.jfa._FenceWindow` — the round-5 jfa@1024 OOM lesson).
    """
    import os

    from voxtpu.ops.jfa import _FENCE_BYTES, _FenceWindow

    org = jnp.concatenate(
        [jnp.asarray(origin, jnp.float32),
         jnp.asarray(voxel_size, jnp.float32)[None]]
    ).astype(jnp.float32)
    # Depth 1 by default here, NOT the stepped-XLA flood's depth 2: a
    # pallas step is not donated (see above), so every in-flight step
    # pins its input AND output — depth d holds d+1 seed grids (~4.3 GB
    # each at 1024^3) where the donated XLA steps hold ~d. Depth 2 with
    # everything else live measured RESOURCE_EXHAUSTED on the 15.75 GB
    # v5e (battery r7). JFA_FENCE_DEPTH still overrides for A/Bs.
    env_depth = os.environ.get("JFA_FENCE_DEPTH")
    depth = max(1, int(env_depth)) if env_depth else 1
    win = _FenceWindow(n ** 3 * 4 >= _FENCE_BYTES, depth)
    seed = _init_jit(occ, n=n)
    k = n // 2
    while k >= 2:
        seed = _step_jit(seed, org, k=k, n=n, pipe=pipe, yblock=yblock)
        win.push(seed)
        k //= 2
    if pipe and not yblock:
        win.drain()
        return _final_step_jit(seed, occ, org, n=n)
    seed = _step_jit(seed, org, k=1, n=n, pipe=False, yblock=yblock)
    win.push(seed)
    win.drain()
    return _final_jit(seed, occ, org, n=n)


def jfa_pallas(occ, spec: GridSpec):
    """Signed squared distance field via VMEM-tiled Pallas flood steps.

    N <= 512 runs as one fused jit. N = 1024 runs per-step y-blocked
    kernels (`_step_kernel_yblocked`, fence-windowed dispatch): the
    full-plane kernel's ~26 live candidate planes demand 151.6M of
    scoped VMEM there — past the v5e's physical 128M — so the kernel
    computes (1, H, n) row bands instead (JFA_YBLOCK sets H,
    JFA_PALLAS_1024=0 restores the stepped-XLA delegation). Above 1024
    the packed 10-bit seed layout no longer fits an int32 AND the wide
    (hi, lo) pair's 6 source-plane blocks (3 z-planes x 2 arrays,
    16.8 MB each at 2048) exceed VMEM regardless of banding — those
    sizes delegate to the stepped wide XLA flood
    (`voxtpu.ops.jfa.jfa_xla_stepped`). Memory, not encoding, is then
    the only limit, and multi-chip grids belong to the Z-sharded path
    (`voxtpu.parallel.sharded_jfa`).
    """
    import os

    # JFA_PIPE=1 selects the round-4 pipelined kernel (A/B knob): same
    # bit-exact selection, each plane DMA'd once instead of 3x and seeds
    # unpacked once per plane instead of per candidate. MEASURED SLOWER
    # on the v5e (battery 2026-08-18: 15.4 vs 13.2 ms @256^3, 147 vs
    # 123 ms @512^3) despite 2.3x less HBM traffic — the flood is
    # VPU-bound and the 4-plane world-coordinate quad costs ~4 rolls
    # per in-plane candidate where the legacy kernel rolls one packed
    # plane; the residue-walk grid also pipelines worse than the dense
    # z-grid. Kept for A/B and as the documented negative result
    # (BENCH_NOTES round 4); the three-plane kernel is the default.
    pipe = os.environ.get("JFA_PIPE", "0") == "1"
    if spec.n > 1024 or (
            spec.n > 512 and os.environ.get("JFA_PALLAS_1024", "1") == "0"):
        # Above 1024 the packed 10-bit seed no longer fits an int32 and
        # the three (1, n, n) source-plane blocks exceed VMEM regardless
        # of banding — delegate to the stepped wide XLA flood.
        # JFA_PALLAS_1024=0 restores that delegation at 1024 too (the
        # round-5 default before the y-blocked kernel landed).
        from voxtpu.ops.jfa import jfa_xla_stepped

        return jfa_xla_stepped(occ, spec.origin, spec.voxel_size, n=spec.n)
    if spec.n > 512:
        # 1024^3: the full-plane kernel's ~26 live candidate planes
        # demand 151.6M of scoped VMEM — past the v5e's PHYSICAL 128M,
        # so no vmem_limit raise can admit it (round-4/5 batteries both
        # failed the compile). The y-blocked kernel computes (1, H, n)
        # row bands over full-plane source blocks, shrinking the live
        # set n/H-fold; per-step dispatch keeps step buffers from
        # accumulating in one program's assignment, and the fence
        # window keeps enqueue-ahead temps from stacking.
        yblock = int(os.environ.get("JFA_YBLOCK", "256"))
        return _jfa_pallas_stepped(occ, spec.origin, spec.voxel_size,
                                   n=spec.n, pipe=pipe, yblock=yblock)
    return _jfa_pallas(occ, spec.origin, spec.voxel_size, n=spec.n, pipe=pipe)
