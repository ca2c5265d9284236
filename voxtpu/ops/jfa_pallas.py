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

Seeds are 10-bit packed (supports N <= 1024); VMEM per grid step is
4 planes of N^2 i32 -> N <= 1024 on a 16MB core (N <= 512 verified).
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
        # default scoped-VMEM budget at n = 512.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(seed, seed, seed, org)


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


@functools.partial(jax.jit, static_argnames=("n",))
def _jfa_pallas(occ, origin, voxel_size, *, n: int):
    origin = jnp.asarray(origin, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    seed = jfa_init_seed(occ)
    org = jnp.concatenate([origin, vs[None]]).astype(jnp.float32)
    k = n // 2
    while k >= 1:
        seed = _flood_step_pallas(seed, org, k, n)
        k //= 2
    return _sdf_from_seed_pallas(seed, occ, org, n)


@functools.partial(jax.jit, static_argnames=("n",))
def _init_jit(occ, *, n: int):
    return jfa_init_seed(occ)


@functools.partial(jax.jit, static_argnames=("k", "n"))
def _step_jit(seed, org, *, k: int, n: int):
    return _flood_step_pallas(seed, org, k, n)


@functools.partial(jax.jit, static_argnames=("n",))
def _final_jit(seed, occ, org, *, n: int):
    return _sdf_from_seed_pallas(seed, occ, org, n)


def _jfa_pallas_stepped(occ, origin, voxel_size, *, n: int):
    """Per-step dispatch for large N: one jit per flood step, so buffers
    free between steps. The single whole-flood jit OOMs at 1024^3 — XLA's
    buffer assignment keeps every pallas step's 4 GB output live for the
    duration of the program instead of ping-ponging two buffers. (Buffer
    donation on the step was tried and reverted: donated inputs abort
    through the remote-execution tunnel.)
    """
    org = jnp.concatenate(
        [jnp.asarray(origin, jnp.float32),
         jnp.asarray(voxel_size, jnp.float32)[None]]
    ).astype(jnp.float32)
    seed = _init_jit(occ, n=n)
    k = n // 2
    while k >= 1:
        seed = _step_jit(seed, org, k=k, n=n)
        k //= 2
    return _final_jit(seed, occ, org, n=n)


def jfa_pallas(occ, spec: GridSpec):
    """Signed squared distance field via VMEM-tiled Pallas flood steps.

    N <= 512 runs as one fused jit; N = 1024 dispatches per flood step
    (the whole-flood jit keeps every step's 4 GB output live — beyond a
    single 16 GB chip). For N > 1024 the packed 10-bit seed layout no
    longer fits an int32 AND the wide (hi, lo) pair's 6 source-plane
    blocks (3 z-planes x 2 arrays, 16.8 MB each at 2048) exceed VMEM —
    such grids also exceed one chip's HBM (2048^3 seeds alone = 34 GB),
    so this backend delegates them to the stepped wide XLA flood
    (`voxtpu.ops.jfa.jfa_xla_stepped`); memory, not encoding, is then
    the only limit, and multi-chip grids belong to the Z-sharded path
    (`voxtpu.parallel.sharded_jfa`).
    """
    if spec.n > 1024:
        from voxtpu.ops.jfa import jfa_xla_stepped

        return jfa_xla_stepped(occ, spec.origin, spec.voxel_size, n=spec.n)
    if spec.n > 512:
        # Above 512 the whole-flood jit's per-step output buffers (XLA
        # keeps each pallas step's result live) approach chip HBM.
        return _jfa_pallas_stepped(occ, spec.origin, spec.voxel_size, n=spec.n)
    return _jfa_pallas(occ, spec.origin, spec.voxel_size, n=spec.n)
