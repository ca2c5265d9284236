"""Fused (tile, triangle) soft voxelizer — coefficient tables in VMEM.

Round-1's Pallas soft engine (`voxtpu.ops.soft_vox_pallas`) streams
per-FRAGMENT traced arrays (weight, x_hit) through HBM and pays two
F-sized permutation sorts per step to lay them out in batch order
(BENCH_NOTES.md: the sorts + XLA fragment generation dominate the
80 ms fwd+bwd at 256^3, not the MXU kernels). This engine removes the
per-fragment traced data entirely:

- XLA computes 13 *per-triangle* coefficients (edge-function planes,
  the X-hit plane, the facing sign) — T rows, not F.
- Each batch carries a VMEM table of its triangles' coefficient rows
  (TBL unique triangles max; slots hold a static table index).
- The kernel reconstructs every fragment from its (static) cell and
  its triangle's coefficients — edge functions, sigmoid coverage,
  X-hit, sigmoid profile — and accumulates the same
  (TC, 128) @ (128, N) MXU contraction as before.
- The backward kernel chain-rules fragment cotangents to COEFFICIENT
  cotangents in-kernel (two extra small matmuls) and emits one
  (TBL, 16) block per batch; custom gather-transpose VJPs (not
  scatter-adds — 30x slower on TPU) carry them back through the table
  expansion and the coords->triangle gather to vertex coordinates.

Traced data per step: coefficient tables (~F/4 rows of 64 B) instead
of F fragments x 2 arrays x fwd/bwd sorts.

Math (reference semantics, `vox/sequential.cpp:18-61` relaxed as in
`voxtpu.ops.soft_vox`): edge k of triangle (a, b, c) against a cell
center (cy, cz) is

    e_k(cy, cz) = u_k * cz + v_k * cy + w_k          (sign-folded)
    cov = sigmoid(e0/te) * sigmoid(e1/te) * sigmoid(e2/te)
    weight = wmul * cov,   wmul = sign (0 if degenerate)
    x_hit = P - Q * cy - R * cz,  (P, Q, R) = (D, B, C) / A

Coefficient layout (16 lanes; blocks arrive row-major (TBL, 16) and
are transposed in-kernel so attributes read as sublane rows):
    0..8: (u, v, w) for e0, e1, e2     9..11: P, Q, R     12: wmul

TBL defaults to 128: tighter batch bins nearly halve the padded table
slots (the dominant traced data) vs 256, and the per-panel attribute
matmul K dim shrinks with it.

Precision (round 3, VERDICT r2 weak #2): the TPU MXU's default f32
path rounds operands to single-pass bf16. That is fatal ONLY for the
one-hot table-gather dots — edge-function coefficients are differences
of large coordinate products, so a 0.4% relative rounding on a
coefficient becomes an unbounded relative error on the near-zero edge
values they cancel to (observed: >10% FD gradcheck failures on
hardware). The gathers are therefore EXACT: coefficients are bitcast
to int32, split into four sign-extended int8 byte planes, gathered by
four int8 x int8 -> int32 matmuls (the MXU's fastest path, same trick
as `vox_pallas_we.py`), and recombined — bit-exact reads at full
speed. The profile/accumulate dots multiply O(1) smooth values with no
cancellation, but 1-pass bf16 still fails FD gradchecks by ~12%
(measured) — they run the manual bf16_3x algorithm instead (2 passes
when one operand is 0/1), since Mosaic rejects Precision.HIGH. That is
mode="exact8" (the default): 2-3 bf16 passes + int8 gathers, vs
mode="highest"'s 6-pass f32 everywhere (round-2 behavior, kept for A/B
against the FD gradchecks in `scripts/tpu_smoke.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Shared with the hard suffix kernel whose `tile_batches`/`_cut_batches`
# layouts these kernels consume — one definition, no drift.
from voxtpu.ops.vox_pallas import FLAG_FIRST, FLAG_LAST, TB_LANE

NATTR = 16
MODES = ("exact8", "highest")


def _dot_hi(a, b, dims):
    """f32-fidelity matmul in 3 bf16 MXU passes (the bf16_3x algorithm:
    a*b ~= a_hi*b_hi + a_hi*b_lo + a_lo*b_hi, f32 accumulation).
    Measured necessary-and-sufficient for the FD gradchecks: 1-pass
    DEFAULT fails them by ~12% on hardware, Mosaic rejects
    Precision.HIGH, and HIGHEST costs 6 passes."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _dot_hi_onehot(a, b, dims, onehot_side: int):
    """2-pass variant of `_dot_hi` when one operand is 0/1-valued
    (exact in bf16): only the smooth side needs the hi+lo split."""
    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.float32)

    if onehot_side == 0:
        a16 = a.astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return d(a16, b_hi) + d(a16, b_lo)
    b16 = b.astype(jnp.bfloat16)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return d(a_hi, b16) + d(a_lo, b16)


def _mode_dots(mode: str):
    """(gather_exact, smooth_dot) — smooth_dot(a, b, dims) runs the
    profile/accumulate contractions."""
    if mode == "exact8":
        return True, _dot_hi
    if mode == "highest":
        def highest(a, b, dims):
            return jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        return False, highest
    raise ValueError(f"unknown precision mode {mode!r}")


def _byte_planes(table_t):
    """f32 (16, TBL) -> four sign-extended int8 byte planes (bit-exact
    carrier for the MXU gather)."""
    ti = jax.lax.bitcast_convert_type(table_t, jnp.int32)
    planes = []
    for k in range(4):
        byte = (ti >> (8 * k)) & 0xFF
        planes.append(((byte << 24) >> 24).astype(jnp.int8))
    return planes


def _gather_exact(planes, onehot_i8):
    """Gather f32 rows exactly: 4 int8 matmuls + byte recombination.
    Uniqueness of the one-hot columns makes each int32 sum a single
    sign-extended byte, recovered with & 0xFF."""
    accs = [
        jax.lax.dot_general(
            p, onehot_i8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        for p in planes
    ]
    word = (
        (accs[0] & 0xFF)
        | ((accs[1] & 0xFF) << 8)
        | ((accs[2] & 0xFF) << 16)
        | ((accs[3] & 0xFF) << 24)
    )
    return jax.lax.bitcast_convert_type(word, jnp.float32)


def triangle_coeffs(tri: jnp.ndarray) -> jnp.ndarray:
    """(T, 3, 3) vertex coords -> (T, 16) fragment-reconstruction
    coefficients (differentiable)."""
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]

    nx = (b[:, 1] - a[:, 1]) * (c[:, 2] - b[:, 2]) - (
        b[:, 2] - a[:, 2]) * (c[:, 1] - b[:, 1])
    sign = jnp.where(nx >= 0, jnp.float32(1), jnp.float32(-1))

    def edge(v0, v1):
        # e = (cz - v0z)(v1y - v0y) - (cy - v0y)(v1z - v0z)
        u = v1[:, 1] - v0[:, 1]
        v = -(v1[:, 2] - v0[:, 2])
        w = v0[:, 1] * (v1[:, 2] - v0[:, 2]) - v0[:, 2] * (v1[:, 1] - v0[:, 1])
        return u * sign, v * sign, w * sign

    u0, v0_, w0 = edge(a, b)
    u1, v1_, w1 = edge(b, c)
    u2, v2_, w2 = edge(c, a)

    # Same op as the XLA engine (`soft_vox._soft_fragments`): for
    # exactly-X-degenerate triangles (n_x = 0, e.g. icosphere side
    # walls) the knife-edge outcome depends on how the compiler rounds
    # this cross product; using the identical expression keeps the two
    # engines aligned everywhere float rounding allows (meshes in
    # generic position match to float32 tolerance).
    cr = jnp.cross(b - a, c - a)
    A, B, C = cr[:, 0], cr[:, 1], cr[:, 2]
    D = A * a[:, 0] + B * a[:, 1] + C * a[:, 2]
    degenerate = jnp.abs(A) < 1e-20
    safe_A = jnp.where(degenerate, jnp.float32(1e-20), A)
    P = D / safe_A
    Q = B / safe_A
    R = C / safe_A
    wmul = jnp.where(degenerate, 0.0, sign)

    zeros = jnp.zeros_like(A)
    return jnp.stack(
        [u0, v0_, w0, u1, v1_, w1, u2, v2_, w2, P, Q, R, wmul,
         zeros, zeros, zeros], axis=1)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fused_fwd_kernel(n: int, tc: int, tb_sub: int, tbl: int,
                      mode: str = "highest"):
    from jax.experimental import pallas as pl

    exact, sdot = _mode_dots(mode)

    def kernel(batch_tile_ref, flags_ref, cell_ref, idx_ref, tab_ref,
               prm_ref, out_ref, acc):
        b = pl.program_id(0)
        flags = flags_ref[b]
        tile = batch_tile_ref[b]
        ox, oy, oz = prm_ref[0], prm_ref[1], prm_ref[2]
        vs, tau_e, tau_x = prm_ref[3], prm_ref[4], prm_ref[5]

        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, TB_LANE), 0)
        tbl_iota = jax.lax.broadcasted_iota(jnp.int32, (tbl, TB_LANE), 0)
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (TB_LANE, n), 1)
        cx = ox + (x_iota.astype(jnp.float32) * vs + vs * 0.5)
        # In-kernel transpose: tables arrive row-major (TBL, 16) straight
        # from the gather; transposing here (once per batch, fused into
        # the pipeline) replaces two 500 MB XLA transposes per step.
        table_t = tab_ref[0].T  # (16, TBL)
        planes = _byte_planes(table_t) if exact else None

        # Per-sub-batch VPU math stays 128-lane; the accumulate
        # contraction is stacked across sub-batches into ONE deep-K MXU
        # dot (tc, tb) @ (tb, n) instead of tb_sub shallow ones (round
        # 3, mirrors soft_vox_seg).
        ow_l, sig_l = [], []
        for s in range(tb_sub):
            cells_s = cell_ref[0, s, :]          # local cell, -1 pad
            idx_s = idx_ref[0, s, :]             # table slot
            gcell = tile * tc + cells_s
            cy = oy + ((gcell % n).astype(jnp.float32) * vs + vs * 0.5)
            cz = oz + ((gcell // n).astype(jnp.float32) * vs + vs * 0.5)

            if exact:  # (16, 128) attribute rows per slot, bit-exact
                at = _gather_exact(
                    planes, (tbl_iota == idx_s[None, :]).astype(jnp.int8))
            else:
                onehot_t = (tbl_iota == idx_s[None, :]).astype(jnp.float32)
                at = jax.lax.dot_general(
                    table_t, onehot_t,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            s0 = jax.nn.sigmoid((at[0] * cz + at[1] * cy + at[2]) / tau_e)
            s1 = jax.nn.sigmoid((at[3] * cz + at[4] * cy + at[5]) / tau_e)
            s2 = jax.nn.sigmoid((at[6] * cz + at[7] * cy + at[8]) / tau_e)
            w_s = at[12] * (s0 * s1 * s2)
            xh = at[9] - at[10] * cy - at[11] * cz

            ow_l.append(jnp.where(
                cell_iota == cells_s[None, :], w_s[None, :], 0.0
            ).astype(jnp.float32))
            sig_l.append(jax.nn.sigmoid((xh[:, None] - cx) / tau_x))
        part = sdot(jnp.concatenate(ow_l, axis=1),
                    jnp.concatenate(sig_l, axis=0),
                    (((1,), (0,)), ((), ())))

        @pl.when((flags & FLAG_FIRST) != 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += part

        @pl.when((flags & FLAG_LAST) != 0)
        def _():
            out_ref[0] = acc[:]

    return kernel


def _fused_bwd_kernel(n: int, tc: int, tb_sub: int, tbl: int,
                      mode: str = "highest"):
    from jax.experimental import pallas as pl

    exact, sdot = _mode_dots(mode)

    def kernel(batch_tile_ref, flags_ref, cell_ref, idx_ref, tab_ref,
               prm_ref, g_ref, dtab_ref):
        b = pl.program_id(0)
        tile = batch_tile_ref[b]
        ox, oy, oz = prm_ref[0], prm_ref[1], prm_ref[2]
        vs, tau_e, tau_x = prm_ref[3], prm_ref[4], prm_ref[5]
        g_tile = g_ref[0]  # (TC, N)
        table_t = tab_ref[0].T  # (16, TBL), see fwd kernel note
        planes = _byte_planes(table_t) if exact else None

        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, TB_LANE), 0)
        tbl_iota = jax.lax.broadcasted_iota(jnp.int32, (tbl, TB_LANE), 0)
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (TB_LANE, n), 1)
        cx = ox + (x_iota.astype(jnp.float32) * vs + vs * 0.5)

        # Stacked MXU dots (round 3, mirrors soft_vox_seg): the slot
        # gradient gather runs once at (tc, tb) @ (tc, n) -> (tb, n),
        # the coefficient-cotangent reduction once at (16, tb).
        oh_l, ot_l, da_l, vals = [], [], [], []
        for s in range(tb_sub):
            cells_s = cell_ref[0, s, :]
            idx_s = idx_ref[0, s, :]
            gcell = tile * tc + cells_s
            cy = oy + ((gcell % n).astype(jnp.float32) * vs + vs * 0.5)
            cz = oz + ((gcell // n).astype(jnp.float32) * vs + vs * 0.5)

            ot_l.append((tbl_iota == idx_s[None, :]).astype(jnp.float32))
            if exact:
                at = _gather_exact(
                    planes, (tbl_iota == idx_s[None, :]).astype(jnp.int8))
            else:
                at = jax.lax.dot_general(
                    table_t, ot_l[-1],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            s0 = jax.nn.sigmoid((at[0] * cz + at[1] * cy + at[2]) / tau_e)
            s1 = jax.nn.sigmoid((at[3] * cz + at[4] * cy + at[5]) / tau_e)
            s2 = jax.nn.sigmoid((at[6] * cz + at[7] * cy + at[8]) / tau_e)
            cov = s0 * s1 * s2
            w_s = at[12] * cov
            xh = at[9] - at[10] * cy - at[11] * cz
            oh_l.append((cell_iota == cells_s[None, :]).astype(jnp.float32))
            vals.append((at, s0, s1, s2, cov, w_s, xh, cy, cz))

        onehot_all = jnp.concatenate(oh_l, axis=1)       # (tc, tb)
        dims_pg = (((0,), (0,)), ((), ()))
        pg_all = (_dot_hi_onehot(onehot_all, g_tile, dims_pg, 0) if exact
                  else sdot(onehot_all, g_tile, dims_pg))  # (tb, N)

        for s in range(tb_sub):
            at, s0, s1, s2, cov, w_s, xh, cy, cz = vals[s]
            pg = pg_all[s * TB_LANE:(s + 1) * TB_LANE]
            sig = jax.nn.sigmoid((xh[:, None] - cx) / tau_x)
            dw = jnp.sum(pg * sig, axis=1)                       # (128,)
            dxh = (w_s / tau_x) * jnp.sum(pg * sig * (1.0 - sig), axis=1)

            dcov = dw * at[12]
            dwmul = dw * cov
            de0 = dcov * cov * (1.0 - s0) / tau_e
            de1 = dcov * cov * (1.0 - s1) / tau_e
            de2 = dcov * cov * (1.0 - s2) / tau_e
            da_l.append(jnp.concatenate([
                (de0 * cz)[None, :], (de0 * cy)[None, :], de0[None, :],
                (de1 * cz)[None, :], (de1 * cy)[None, :], de1[None, :],
                (de2 * cz)[None, :], (de2 * cy)[None, :], de2[None, :],
                dxh[None, :], (-dxh * cy)[None, :], (-dxh * cz)[None, :],
                dwmul[None, :],
                jnp.zeros((3, TB_LANE), jnp.float32),
            ], axis=0))  # (16, 128)
        dims_dt = (((1,), (1,)), ((), ()))
        dattrs_all = jnp.concatenate(da_l, axis=1)       # (16, tb)
        onehot_t_all = jnp.concatenate(ot_l, axis=1)     # (tbl, tb)
        dtab = (_dot_hi_onehot(dattrs_all, onehot_t_all, dims_dt, 1)
                if exact else sdot(dattrs_all, onehot_t_all, dims_dt))
        dtab_ref[0] = dtab.T  # row-major (TBL, 16), matching the tables

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp ops
# ---------------------------------------------------------------------------
#
# All large static arrays (slot layouts, index tables) are PASSED AS
# ARGUMENTS, never closed over: this JAX embeds every closure constant
# as an HLO literal, and at 1.35M faces the ~240 MB of layout data blew
# the remote-compile request limit (HTTP 413). Integer/bool primal
# arguments take float0 cotangents.


def _float0(x):
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_accumulate(tables, batch_tile, flags, cells_b, tblidx_b,
                      tile_mask, cfg):
    """(B, TBL, 16) tables -> (n, n, n) occupancy. cfg = hashable
    (n, tc, tb_sub, tbl, num_batches, prm, mode[, extra_tiles]).
    `extra_tiles` (default 0) appends masked dummy output tiles: pad
    batches in sharded layouts aim there so their zero panels can't
    overwrite a real tile's block (voxtpu.parallel.sharded_soft_fused).
    """
    return _fused_fwd_call(tables, batch_tile, flags, cells_b, tblidx_b,
                           tile_mask, cfg)


def _cfg_unpack(cfg):
    n, tc, tb_sub, tbl, num_batches, prm, mode = cfg[:7]
    extra_tiles = cfg[7] if len(cfg) > 7 else 0
    return n, tc, tb_sub, tbl, num_batches, prm, mode, extra_tiles


def _fused_fwd_call(tables, batch_tile, flags, cells_b, tblidx_b,
                    tile_mask, cfg):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, tc, tb_sub, tbl, num_batches, prm, mode, xt = _cfg_unpack(cfg)
    num_tiles = (n * n) // tc
    pr = jnp.asarray(np.asarray(prm, np.float32))
    slot = pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0))
    tiles = pl.pallas_call(
        _fused_fwd_kernel(n, tc, tb_sub, tbl, mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_batches,),
            in_specs=[
                slot, slot,
                pl.BlockSpec((1, tbl, NATTR), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, tc, n),
                                   lambda b, bt, fl: (bt[b], 0, 0)),
            scratch_shapes=[pltpu.VMEM((tc, n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles + xt, tc, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(batch_tile, flags, cells_b, tblidx_b, tables, pr)
    tiles = jnp.where(tile_mask[:, None, None], tiles, 0.0)
    return tiles[:num_tiles].reshape(n, n, n)


def _fused_fwd_rule(tables, batch_tile, flags, cells_b, tblidx_b,
                    tile_mask, cfg):
    out = _fused_fwd_call(tables, batch_tile, flags, cells_b, tblidx_b,
                          tile_mask, cfg)
    return out, (tables, batch_tile, flags, cells_b, tblidx_b, tile_mask)


def _fused_bwd_rule(cfg, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tables, batch_tile, flags, cells_b, tblidx_b, tile_mask = res
    n, tc, tb_sub, tbl, num_batches, prm, mode, xt = _cfg_unpack(cfg)
    g_tiles = g.reshape((n * n) // tc, tc, n)
    if xt:
        g_tiles = jnp.concatenate(
            [g_tiles, jnp.zeros((xt, tc, n), g.dtype)])
    pr = jnp.asarray(np.asarray(prm, np.float32))
    slot = pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0))
    dtab = pl.pallas_call(
        _fused_bwd_kernel(n, tc, tb_sub, tbl, mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_batches,),
            in_specs=[
                slot, slot,
                pl.BlockSpec((1, tbl, NATTR), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tc, n), lambda b, bt, fl: (bt[b], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tbl, NATTR),
                                   lambda b, *_: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((num_batches, tbl, NATTR),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(batch_tile, flags, cells_b, tblidx_b, tables, pr, g_tiles)
    return (dtab, _float0(batch_tile), _float0(flags), _float0(cells_b),
            _float0(tblidx_b), _float0(tile_mask))


_fused_accumulate.defvjp(_fused_fwd_rule, _fused_bwd_rule)


# jnp.take's automatic VJP is a scatter-add — measured ~710 ms for the
# (B*TBL, 16) -> (T, 16) reduction at 256^3 / 1.35M faces (TPU scatter
# runs at element-gather speed, ~0.3 GB/s). ROW gathers run at ~10 GB/s,
# so the transposes below gather instead — and (round 3) the position
# tables are CLASS-SPLIT by per-target count: a flat (max_k, T) table
# gathered max_k x T rows (2.4x the real data at this mesh, 351 ms of
# the 609 ms fwd+bwd); per-count classes gather exactly the real rows,
# reassembled into target order by one final permutation gather.


def _build_classed_reduction(item_ids: np.ndarray, num_targets: int):
    """Static layout for an exact gather-based segment reduction.

    item_ids (S,): target id per source row (< 0 = contributes nowhere).
    Returns (cls_pos, inv): `cls_pos` is a tuple of (c, Tc) int32
    position tables — the Tc targets with exactly c sources, listing
    their source rows; `inv` (num_targets,) maps each target to its row
    in the concatenated per-class output (targets with zero sources map
    to the appended zero row)."""
    item_ids = np.asarray(item_ids)
    order = np.argsort(item_ids, kind="stable")
    ids_sorted = item_ids[order]
    v0 = int(np.searchsorted(ids_sorted, 0))
    vo = order[v0:].astype(np.int64)
    vi = ids_sorted[v0:]
    starts = np.searchsorted(vi, np.arange(num_targets + 1))
    counts = np.diff(starts)
    cls_pos, targ_order = [], []
    for c in sorted(set(counts[counts > 0].tolist())):
        t_c = np.nonzero(counts == c)[0]
        pos = np.empty((c, t_c.size), np.int32)
        for j in range(c):
            pos[j] = vo[starts[t_c] + j]
        cls_pos.append(jnp.asarray(pos))
        targ_order.append(t_c)
    nonzero = (np.concatenate(targ_order) if targ_order
               else np.zeros(0, np.int64))
    inv = np.full(num_targets, nonzero.size, np.int32)  # -> zero row
    inv[nonzero] = np.arange(nonzero.size, dtype=np.int32)
    return tuple(cls_pos), jnp.asarray(inv)


def _classed_reduce(g, cls_pos, inv, width: int):
    """Sum source rows per target: exact row count, short exact sums
    (no long prefix cancellation), one reassembly gather."""
    parts = []
    for pos in cls_pos:
        acc = jnp.take(g, pos[0], axis=0)
        for j in range(1, pos.shape[0]):
            acc = acc + jnp.take(g, pos[j], axis=0)
        parts.append(acc)
    parts.append(jnp.zeros((1, width), g.dtype))
    return jnp.take(jnp.concatenate(parts, axis=0), inv, axis=0)


@jax.custom_vjp
def _expand_rows(coeffs_ext, fidx, cls_pos, inv):
    """(T+1, 16) coefficient rows -> (B*TBL, 16) table slots."""
    return jnp.take(coeffs_ext, fidx, axis=0)


def _expand_fwd(coeffs_ext, fidx, cls_pos, inv):
    return jnp.take(coeffs_ext, fidx, axis=0), (fidx, cls_pos, inv)


def _expand_bwd(res, g):
    fidx, cls_pos, inv = res
    acc = _classed_reduce(g, cls_pos, inv, NATTR)
    dcoeffs = jnp.concatenate(
        [acc, jnp.zeros((1, NATTR), g.dtype)], axis=0)
    return (dcoeffs, _float0(fidx),
            tuple(_float0(p) for p in cls_pos), _float0(inv))


_expand_rows.defvjp(_expand_fwd, _expand_bwd)


@jax.custom_vjp
def _gather_tri(coords, faces, cls_pos, inv):
    """coords (V, 3) -> (T, 3, 3); VJP sums each vertex's static
    (face, corner) source rows via the classed reduction."""
    return coords[faces]


def _gather_tri_fwd(coords, faces, cls_pos, inv):
    # Zero-row token records coords' row count: the reduction is sized
    # by faces.max()+1, which undercounts meshes with unreferenced
    # trailing vertices — the cotangent must still match coords' shape.
    shape_token = jnp.zeros((coords.shape[0], 0), coords.dtype)
    return coords[faces], (faces, cls_pos, inv, shape_token)


def _gather_tri_bwd(res, g):
    faces, cls_pos, inv, shape_token = res
    acc = _classed_reduce(g.reshape(-1, 3), cls_pos, inv, 3)
    ncoords = shape_token.shape[0]
    if ncoords > acc.shape[0]:  # unreferenced vertices: zero gradient
        acc = jnp.concatenate(
            [acc, jnp.zeros((ncoords - acc.shape[0], 3), g.dtype)], axis=0)
    return (acc, _float0(faces),
            tuple(_float0(p) for p in cls_pos), _float0(inv))


_gather_tri.defvjp(_gather_tri_fwd, _gather_tri_bwd)


# ---------------------------------------------------------------------------
# Plan (all static host-side layout)
# ---------------------------------------------------------------------------


def _cut_batches(run_key, faces, local, *, tb_sub: int, tbl: int):
    """Greedy batch layout shared by FusedSoftPlan and SegSoftPlan.

    Inputs are per-slot arrays PRE-SORTED by (run_key, faces): `run_key`
    the batching domain (tile for the fused plan, tile*n + panel for
    the segmented one — batches never span two keys), `faces` the
    triangle id (pairs = unique (run_key, face) runs = table rows),
    `local` the int32 in-kernel cell code stored per slot.  Cuts
    batches of <= tb_sub*TB_LANE slots and <= tbl unique triangles,
    vectorized as rounds over the still-open runs (a python loop over
    4M+ pairs took ~30 s at 1.35M faces); rounds = max batches in any
    one run (a handful).

    Returns dict(batch_key, nonempty, flags, cells_b, tblidx_b,
    table_face, num_pairs): `cells_b`/`tblidx_b` are (B, tb_sub,
    TB_LANE) with -1/0 padding, `table_face` (B, tbl) with -1 padding,
    `nonempty` marks batches holding at least one pair, `flags` the
    per-(run_key) FIRST/LAST accumulation markers.
    """
    tb = tb_sub * TB_LANE
    f_total = run_key.shape[0]
    if f_total:
        newpair = np.empty(f_total, bool)
        newpair[0] = True
        newpair[1:] = (run_key[1:] != run_key[:-1]) | (
            faces[1:] != faces[:-1])
        pair_start = np.nonzero(newpair)[0]
        pair_end = np.append(pair_start[1:], f_total)
        pair_run = run_key[pair_start]
        pair_face = faces[pair_start]
        pair_size = pair_end - pair_start
    else:
        newpair = np.zeros((0,), bool)
        pair_start = pair_end = pair_run = pair_face = pair_size = (
            np.zeros((0,), np.int64))
    num_pairs = pair_start.size

    if num_pairs:
        run_starts = np.nonzero(
            np.concatenate([[True], pair_run[1:] != pair_run[:-1]]))[0]
        run_ends = np.append(run_starts[1:], num_pairs)
        run_k = pair_run[run_starts]
        csum = np.concatenate([[0], np.cumsum(pair_size)])
        cur = run_starts.copy()
        bk_l, p0_l, p1_l = [], [], []
        open_m = cur < run_ends
        while open_m.any():
            c = cur[open_m]
            j_slots = np.searchsorted(csum, csum[c] + tb,
                                      side="right") - 1
            j = np.minimum(np.minimum(j_slots, c + tbl),
                           run_ends[open_m])
            if not (j > c).all():  # pair larger than tb: can't happen
                raise AssertionError("pair exceeds batch capacity")
            bk_l.append(run_k[open_m])
            p0_l.append(c)
            p1_l.append(j)
            cur[open_m] = j
            open_m = cur < run_ends
        batch_p0 = np.concatenate(p0_l)
        batch_p1 = np.concatenate(p1_l)
        batch_key = np.concatenate(bk_l)
        order_b = np.argsort(batch_p0, kind="stable")
        batch_p0 = batch_p0[order_b]
        batch_p1 = batch_p1[order_b]
        batch_key = batch_key[order_b]
    else:
        batch_p0 = batch_p1 = np.zeros((1,), np.int64)
        batch_key = np.zeros((1,), run_key.dtype)
    bcount = batch_p0.size

    cells_b = np.full((bcount, tb), -1, np.int32)
    tblidx_b = np.zeros((bcount, tb), np.int32)
    table_face = np.full((bcount, tbl), -1, np.int32)
    if f_total:
        pidx = np.cumsum(newpair, dtype=np.int32) - 1  # pair id/slot
        b_of_pair = np.searchsorted(batch_p0, np.arange(num_pairs),
                                    side="right") - 1
        fb = b_of_pair[pidx]                     # batch per slot
        fstart_b = pair_start[batch_p0]          # slot start per batch
        slot = np.arange(f_total) - fstart_b[fb]
        cells_b[fb, slot] = local
        tblidx_b[fb, slot] = (pidx - batch_p0[fb]).astype(np.int32)
        tslot = np.arange(num_pairs) - batch_p0[b_of_pair]
        table_face[b_of_pair, tslot] = pair_face

    first = np.empty(bcount, bool)
    first[0] = True
    first[1:] = batch_key[1:] != batch_key[:-1]
    last = np.empty(bcount, bool)
    last[-1] = True
    last[:-1] = batch_key[:-1] != batch_key[1:]
    return dict(
        batch_key=batch_key,
        nonempty=batch_p1 > batch_p0,
        flags=(first * FLAG_FIRST + last * FLAG_LAST).astype(np.int32),
        cells_b=cells_b.reshape(bcount, tb_sub, TB_LANE),
        tblidx_b=tblidx_b.reshape(bcount, tb_sub, TB_LANE),
        table_face=table_face,
        num_pairs=int(num_pairs),
    )


class FusedSoftPlan:
    """Static (tile, triangle) batch layout + per-batch triangle tables.

    Built from a `make_soft_plan` FragmentPlan. Fragments (candidate
    raster cells) are ordered by (tile, face, cell); batches are greedy
    cuts respecting BOTH the slot budget (tb_sub * 128) and the unique-
    triangle budget (tbl) per batch. Everything here is integer layout —
    no traced data."""

    def __init__(self, soft_plan, tc: int = 128, tb_sub: int = 4,
                 tbl: int = 128):
        spec = soft_plan.spec
        n = spec.n
        if (n * n) % tc != 0:
            raise ValueError("n*n must divide tile cells")
        self.spec = spec
        self.soft_plan = soft_plan
        self.tc = tc
        self.tb_sub = tb_sub
        self.tbl = tbl
        tb = tb_sub * TB_LANE

        cells_l, faces_l = [], []
        for bucket in soft_plan.buckets:
            window = bucket[0]
            sy = np.asarray(bucket[4])
            sz = np.asarray(bucket[5])
            fi = np.asarray(bucket[6])
            dy = np.arange(window)[None, None, :]
            dz = np.arange(window)[None, :, None]
            ys = sy[:, None, None] + dy
            zs = sz[:, None, None] + dz
            ok = (ys >= 0) & (ys < n) & (zs >= 0) & (zs < n)
            cell = np.where(ok, zs * n + ys, -1)
            cells_l.append(cell.reshape(fi.shape[0], -1))
            faces_l.append(np.broadcast_to(
                fi[:, None], (fi.shape[0], window * window)))
        if cells_l:
            cells = np.concatenate([c.reshape(-1) for c in cells_l])
            faces = np.concatenate([f.reshape(-1) for f in faces_l])
        else:
            cells = np.zeros((0,), np.int32)
            faces = np.zeros((0,), np.int32)
        keep = cells >= 0
        cells = cells[keep].astype(np.int32)
        faces = faces[keep].astype(np.int32)

        tile = cells // tc
        order = np.lexsort((cells, faces, tile))
        cells = cells[order]
        faces = faces[order]
        tile = tile[order]
        f_total = cells.size

        num_tiles = (n * n) // tc
        cut = _cut_batches(tile, faces, (cells % tc).astype(np.int32),
                           tb_sub=tb_sub, tbl=tbl)
        batch_tile = cut["batch_key"].astype(np.int32)
        bcount = batch_tile.shape[0]
        self.flags = cut["flags"]
        self.batch_tile = batch_tile
        self.cells_b = cut["cells_b"]
        self.tblidx_b = cut["tblidx_b"]
        tm = np.zeros(num_tiles, bool)
        if f_total:
            tm[batch_tile[cut["nonempty"]]] = True
        self.tile_mask = tm
        self.num_batches = bcount
        self.num_pairs = cut["num_pairs"]
        self.num_fragments = int(f_total)
        # Flat face ids for the table gather: -1 -> T (a zero row).
        self.table_face_flat = cut["table_face"].reshape(-1)
        self.num_faces = int(np.asarray(soft_plan.faces_array).shape[0])

        # Classed slot->face reduction layout for the expand VJP (round
        # 3: gathers exactly the real slot rows; the flat (max_k, T)
        # table gathered 2.4x that and dominated fwd+bwd — BENCH_NOTES).
        self.expand_cls_d, self.expand_inv_d = _build_classed_reduction(
            self.table_face_flat, self.num_faces)

        # Classed (face, corner)->vertex reduction for the coords VJP.
        faces_np = np.asarray(soft_plan.faces_array).reshape(-1)
        self.num_vertices = int(faces_np.max(initial=-1)) + 1
        self.vert_cls_d, self.vert_inv_d = _build_classed_reduction(
            faces_np, self.num_vertices)

        # Pytree leaves (device arrays): passed through jit boundaries
        # as ARGUMENTS — closure-captured arrays embed as HLO literals
        # and overflow the remote-compile request at large face counts.
        fidx = np.where(self.table_face_flat < 0, self.num_faces,
                        self.table_face_flat).astype(np.int32)
        self.batch_tile_d = jnp.asarray(self.batch_tile, jnp.int32)
        self.flags_d = jnp.asarray(self.flags, jnp.int32)
        self.cells_d = jnp.asarray(self.cells_b, jnp.int32)
        self.tblidx_d = jnp.asarray(self.tblidx_b, jnp.int32)
        self.tile_mask_d = jnp.asarray(self.tile_mask)
        self.fidx_d = jnp.asarray(fidx)
        self.faces_d = jnp.asarray(np.asarray(soft_plan.faces_array))

    # -- pytree protocol: arrays are leaves, layout config is aux ------
    _LEAVES = ("batch_tile_d", "flags_d", "cells_d", "tblidx_d",
               "tile_mask_d", "fidx_d", "expand_cls_d", "expand_inv_d",
               "vert_cls_d", "vert_inv_d", "faces_d")
    _AUX = ("spec", "tc", "tb_sub", "tbl", "num_batches", "num_pairs",
            "num_fragments", "num_faces", "num_vertices")

    def tree_flatten(self):
        return (tuple(getattr(self, k) for k in self._LEAVES),
                tuple(getattr(self, k) for k in self._AUX))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        for k, v in zip(cls._AUX, aux):
            setattr(obj, k, v)
        for k, v in zip(cls._LEAVES, leaves):
            setattr(obj, k, v)
        obj.soft_plan = None  # host-only layout data is not carried
        return obj


jax.tree_util.register_pytree_node_class(FusedSoftPlan)


def soft_voxelize_fused(coords, plan: FusedSoftPlan, *,
                        tau_edge_frac: float = 0.25,
                        tau_x_frac: float = 0.5, clip: bool = True,
                        mode: str = "exact8"):
    """Differentiable occupancy via the fused coefficient-table engine.

    Same semantics as `voxtpu.ops.soft_vox.soft_voxelize` (x_hit is
    algebraically identical but distributes the 1/A division, so values
    agree to float32 rounding rather than bit-exactly).

    `plan` is a pytree: in jitted code pass it THROUGH the jit boundary
    as an argument (e.g. ``jax.jit(soft_voxelize_fused)(coords, plan)``)
    rather than closing over it — closure constants embed the multi-MB
    layout arrays into the compiled program.

    `mode` selects the kernels' MXU precision strategy (module
    docstring): "exact8" (default — bit-exact int8 coefficient gathers,
    bf16_3x smooth dots) or "highest" (the round-2 all-HIGHEST path,
    ~2-3x more MXU passes, kept for A/B validation).
    """
    if mode not in MODES:
        raise ValueError(f"unknown precision mode {mode!r}")
    spec = plan.spec
    vs = spec.voxel_size
    tau_e = tau_edge_frac * vs * vs
    tau_x = tau_x_frac * vs

    tri = _gather_tri(coords, plan.faces_d, plan.vert_cls_d,
                      plan.vert_inv_d)  # (T, 3, 3)
    coeffs = triangle_coeffs(tri)                   # (T, 16)
    coeffs = jnp.concatenate(
        [coeffs, jnp.zeros((1, NATTR), jnp.float32)], axis=0)
    tables = _expand_rows(coeffs, plan.fidx_d, plan.expand_cls_d,
                          plan.expand_inv_d)
    # Row-major (B, TBL, 16) — the kernels transpose in VMEM.
    tables_t = tables.reshape(plan.num_batches, plan.tbl, NATTR)

    prm = (float(spec.origin[0]), float(spec.origin[1]),
           float(spec.origin[2]), float(vs), float(tau_e), float(tau_x))
    cfg = (spec.n, plan.tc, plan.tb_sub, plan.tbl, plan.num_batches, prm,
           mode)
    occ = _fused_accumulate(tables_t, plan.batch_tile_d, plan.flags_d,
                            plan.cells_d, plan.tblidx_d, plan.tile_mask_d,
                            cfg)
    if clip:
        occ = jnp.clip(occ, 0.0, 1.0)
    return occ
