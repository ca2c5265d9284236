"""Fused Pallas soft-voxelization accumulate — forward AND backward on MXU.

The XLA soft path (`voxtpu.ops.soft_vox._accumulate`) materializes the
(fragments, N) profile matrix (8+ GB at 256^3) through `segment_sum`.
Here the accumulation is the same tile/batch MXU formulation as the hard
voxelizer (`voxtpu.ops.vox_pallas`), made differentiable with a
`jax.custom_vjp` pair of kernels:

forward, per 128-lane fragment panel of a tile batch:

    occ[cell, x] += sum_f (onehot[cell, f] * w_f) * sig[f, x]
    sig[f, x] = sigmoid((x_hit_f - cx_x) / tau)

    -> one (TC, 128) @ (128, N) f32 `dot_general`, accumulated in VMEM.

backward, given the occupancy cotangent G (same tile batching):

    PG[f, x] = sum_cell onehot[cell, f] * G[cell, x]   (MXU: onehot^T @ G)
    dL/dw_f    = sum_x PG[f, x] * sig[f, x]
    dL/dxhit_f = (w_f / tau) * sum_x PG[f, x] * sig[f, x] * (1 - sig[f, x])

Fragment *cells* are static per plan (windows are integer geometry), so
the sort/batch layout is host-built once and reused; only (w, x_hit)
are traced, and their cotangents flow back through the batch gather's
transpose (a scatter over a permutation — cheap).

Kernel dots run the manual bf16_3x algorithm (round 3): the MXU's
default f32 path rounds operands to single-pass bf16, which fails FD
gradchecks on hardware by >10%; Precision.HIGHEST (6 f32 passes) fixes
it but doubles the necessary MXU work. The hi+lo bf16 split
(`soft_vox_fused._dot_hi`, 3 passes; 2 when one operand is 0/1)
restores f32 fidelity at half HIGHEST's cost — validated by the same
on-hardware gradchecks (`scripts/tpu_smoke.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Shared with the hard suffix kernel whose tile_batches() produces the
# flags this module's kernels consume — one definition, no drift.
from voxtpu.ops.vox_pallas import FLAG_FIRST, FLAG_LAST, TB_LANE


def _fwd_kernel(n: int, tc: int, tb_sub: int):
    from jax.experimental import pallas as pl

    def kernel(batch_tile_ref, flags_ref, cell_ref, w_ref, x_ref, prm_ref,
               out_ref, acc):
        b = pl.program_id(0)
        flags = flags_ref[b]
        ox, vs, tau = prm_ref[0], prm_ref[1], prm_ref[2]

        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, TB_LANE), 0)
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (TB_LANE, n), 1)
        cx = ox + (x_iota.astype(jnp.float32) * vs + vs * 0.5)  # (TB_LANE, n)

        part = jnp.zeros((tc, n), jnp.float32)
        for s in range(tb_sub):
            cells_s = cell_ref[0, s, :]
            w_s = w_ref[0, s, :]
            x_s = x_ref[0, s, :]
            onehot_w = jnp.where(
                cell_iota == cells_s[None, :], w_s[None, :], 0.0
            ).astype(jnp.float32)                              # (TC, 128)
            sig = jax.nn.sigmoid((x_s[:, None] - cx) / tau)    # (128, N)
            from voxtpu.ops.soft_vox_fused import _dot_hi

            part += _dot_hi(onehot_w, sig, (((1,), (0,)), ((), ())))

        @pl.when((flags & FLAG_FIRST) != 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += part

        @pl.when((flags & FLAG_LAST) != 0)
        def _():
            out_ref[0] = acc[:]

    return kernel


def _bwd_kernel(n: int, tc: int, tb_sub: int):
    from jax.experimental import pallas as pl

    def kernel(batch_tile_ref, flags_ref, cell_ref, w_ref, x_ref, prm_ref,
               g_ref, dw_ref, dx_ref):
        ox, vs, tau = prm_ref[0], prm_ref[1], prm_ref[2]
        g_tile = g_ref[0]  # (TC, N)

        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, TB_LANE), 0)
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (TB_LANE, n), 1)
        cx = ox + (x_iota.astype(jnp.float32) * vs + vs * 0.5)

        for s in range(tb_sub):
            cells_s = cell_ref[0, s, :]
            w_s = w_ref[0, s, :]
            x_s = x_ref[0, s, :]
            onehot = (cell_iota == cells_s[None, :]).astype(jnp.float32)
            # PG[f, x] = onehot^T @ G : gather each fragment's cell row
            # (0/1 left operand -> 2-pass split of g_tile suffices).
            from voxtpu.ops.soft_vox_fused import _dot_hi_onehot

            pg = _dot_hi_onehot(onehot, g_tile,
                                (((0,), (0,)), ((), ())), 0)    # (128, N)
            sig = jax.nn.sigmoid((x_s[:, None] - cx) / tau)
            dw_ref[0, s, :] = jnp.sum(pg * sig, axis=1)
            dx_ref[0, s, :] = (w_s / tau) * jnp.sum(
                pg * sig * (1.0 - sig), axis=1
            )

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def soft_accumulate_pallas(wb, xb, plan, prm):
    """occ (n, n, n) f32 from batched fragment weights/hits.

    wb, xb: (B, tb_sub, 128) f32 — traced, differentiable.
    plan: SoftPallasPlan (static layout; nondiff by object identity).
    prm: (origin_x, voxel_size, tau_x) static float tuple.
    """
    return _fwd_call(wb, xb, plan, prm)


def _pallas_args(plan, prm):
    # The layout arrays are pre-converted device arrays (plan __init__)
    # so repeated fwd/bwd calls don't re-pay an H2D transfer each; prm
    # is a tiny tuple, converted per call.
    return (
        plan.batch_tile_d,
        plan.flags_d,
        plan.cells_d,
        jnp.asarray(np.asarray(prm, np.float32)),
    )


def _fwd_call(wb, xb, plan, prm):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, tc = plan.spec.n, plan.tc
    tile_mask = plan.tile_mask
    tb_sub = wb.shape[1]
    num_batches = wb.shape[0]
    num_tiles = (n * n) // tc
    bt, fl, cb, pr = _pallas_args(plan, prm)
    tiles = pl.pallas_call(
        _fwd_kernel(n, tc, tb_sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_batches,),
            in_specs=[
                pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, tc, n), lambda b, bt, fl: (bt[b], 0, 0)),
            scratch_shapes=[pltpu.VMEM((tc, n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, tc, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(bt, fl, cb, wb, xb, pr)
    tiles = jnp.where(jnp.asarray(tile_mask)[:, None, None], tiles, 0.0)
    return tiles.reshape(n, n, n)


def _fwd_rule(wb, xb, plan, prm):
    occ = _fwd_call(wb, xb, plan, prm)
    return occ, (wb, xb)


def _bwd_rule(plan, prm, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, tc = plan.spec.n, plan.tc
    wb, xb = res
    tb_sub = wb.shape[1]
    num_batches = wb.shape[0]
    g_tiles = g.reshape((n * n) // tc, tc, n)
    bt, fl, cb, pr = _pallas_args(plan, prm)
    dw, dx = pl.pallas_call(
        _bwd_kernel(n, tc, tb_sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_batches,),
            in_specs=[
                pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tc, n), lambda b, bt, fl: (bt[b], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(wb.shape, jnp.float32),
            jax.ShapeDtypeStruct(xb.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(bt, fl, cb, wb, xb, pr, g_tiles)
    return dw, dx


soft_accumulate_pallas.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Static permutation as sorts (TPU gathers/scatters are ~3x slower than
# sorts at this size — measured in BENCH_NOTES.md). fwd: sort fragments by
# their static batch-slot rank; bwd: sort cotangents by the forward
# permutation (also static). No gather or scatter anywhere.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _permute_to_batches(w, x, plan):
    return _permute_fwd_impl(w, x, plan)


def _permute_fwd_impl(w, x, plan):
    num_pad = plan.rank_full.shape[0] - w.shape[0]
    zeros = jnp.zeros((num_pad,), jnp.float32)
    rank = plan.rank_full_d
    _, ws, xs = jax.lax.sort(
        (rank, jnp.concatenate([w, zeros]), jnp.concatenate([x, zeros])),
        num_keys=1,
    )
    nslots = plan.num_batches * plan.tb_sub * TB_LANE
    shape = (plan.num_batches, plan.tb_sub, TB_LANE)
    return ws[:nslots].reshape(shape), xs[:nslots].reshape(shape)


def _permute_fwd_rule(w, x, plan):
    return _permute_fwd_impl(w, x, plan), (w.shape[0],)


def _permute_bwd_rule(plan, res, g):
    (nfrag,) = res
    dwb, dxb = g
    total = plan.rank_full.shape[0]
    nslots = dwb.size
    pad = jnp.zeros((total - nslots,), jnp.float32)
    p = plan.perm_fwd_d  # P[j] = original index of sorted slot j
    _, dw_full, dx_full = jax.lax.sort(
        (p,
         jnp.concatenate([dwb.reshape(-1), pad]),
         jnp.concatenate([dxb.reshape(-1), pad])),
        num_keys=1,
    )
    return dw_full[:nfrag], dx_full[:nfrag]


_permute_to_batches.defvjp(_permute_fwd_rule, _permute_bwd_rule)


# ---------------------------------------------------------------------------
# Plan + public entry
# ---------------------------------------------------------------------------


class SoftPallasPlan:
    """Static batch layout for the fused soft voxelizer.

    Built from a `make_soft_plan` FragmentPlan: fragment cells are a pure
    function of the (integer) raster windows, so the sorted order and the
    (batch, lane) -> fragment gather map are host-built once; only the
    fragment weights and X-hits are traced at run time.
    """

    def __init__(self, soft_plan, tc: int = 128, tb_sub: int = 4):
        spec = soft_plan.spec
        n = spec.n
        if (n * n) % tc != 0:
            raise ValueError("n*n must divide tile cells")
        if soft_plan.buckets and len(soft_plan.buckets[0]) <= 6:
            # A hard FragmentPlan builds fine here (same bucket slots
            # 0/4/5) but dies with a bare IndexError at call time.
            raise ValueError(
                "plan must be built with make_soft_plan (keep_faces) "
                "for soft vox")
        self.spec = spec
        self.soft_plan = soft_plan
        self.tc = tc
        self.tb_sub = tb_sub
        tb = tb_sub * TB_LANE

        # Reproduce the bucket fragment order of soft_voxelize: for each
        # bucket, T * window^2 fragments, cell = zs*n + ys (n*n = invalid).
        all_cells = []
        for bucket in soft_plan.buckets:
            window = bucket[0]
            sy = np.asarray(bucket[4])
            sz = np.asarray(bucket[5])
            dy = np.arange(window)[None, None, :]
            dz = np.arange(window)[None, :, None]
            ys = sy[:, None, None] + dy
            zs = sz[:, None, None] + dz
            in_grid = (ys >= 0) & (ys < n) & (zs >= 0) & (zs < n)
            cell = np.where(in_grid, zs * n + ys, n * n)
            all_cells.append(cell.reshape(-1))
        cells = (np.concatenate(all_cells) if all_cells
                 else np.zeros((0,), np.int64)).astype(np.int64)
        self.num_fragments_total = cells.size

        order = np.argsort(cells, kind="stable")
        cells_sorted = cells[order]
        valid = int(np.searchsorted(cells_sorted, n * n))
        order = order[:valid]
        cells_sorted = cells_sorted[:valid]

        from voxtpu.ops.vox_pallas import tile_batches

        num_tiles = (n * n) // tc
        tile_of = cells_sorted // tc
        bounds = np.searchsorted(tile_of, np.arange(num_tiles + 1))
        counts = np.diff(bounds)
        active = np.nonzero(counts)[0]
        batch_tiles, batch_starts, batch_flags, ends, tile_mask, _ = (
            tile_batches(bounds, tb)
        )

        b = len(batch_tiles)
        idx = batch_starts[:, None] + np.arange(tb)
        in_range = idx < ends[:, None]
        idx_c = np.clip(idx, 0, max(valid - 1, 0))
        self.cells_b = np.where(
            in_range, (cells_sorted[idx_c] % tc) if valid else 0, -1
        ).astype(np.int32).reshape(b, tb_sub, TB_LANE)

        # Static slot rank per original fragment (fwd permutation-as-sort)
        # and its argsort (bwd permutation-as-sort). Slots of tile t are
        # the contiguous run of its batches; leftover slots are pads.
        total_slots = b * tb
        nfrag_total = cells.size
        batches_per_tile = np.zeros(num_tiles, np.int64)
        if valid:
            batches_per_tile[active] = -(-counts[active] // tb)
        slot_base = np.concatenate(
            [[0], np.cumsum(batches_per_tile)]
        )[:-1] * tb
        rank = np.empty(nfrag_total, np.int64)
        if valid:
            q = np.arange(valid, dtype=np.int64)
            t_of_q = tile_of
            slot_q = slot_base[t_of_q] + (q - bounds[t_of_q])
            rank[order] = slot_q
            used_slots = np.zeros(total_slots, bool)
            used_slots[slot_q] = True
        else:
            slot_q = np.zeros((0,), np.int64)
            used_slots = np.zeros(total_slots, bool)
        pad_slots = np.nonzero(~used_slots)[0]
        unused = np.setdiff1d(
            np.arange(nfrag_total, dtype=np.int64),
            order, assume_unique=False,
        )
        rank[unused] = total_slots + np.arange(unused.size)
        rank_full = np.concatenate([rank, pad_slots]).astype(np.int32)
        self.rank_full = rank_full
        self.perm_fwd = np.argsort(rank_full, kind="stable").astype(np.int32)
        self.batch_tile = batch_tiles.astype(np.int32)
        self.flags = batch_flags
        self.tile_mask = tile_mask
        self.num_batches = b
        self.num_fragments = valid
        # Device copies made once (multi-MB at real mesh sizes; the
        # traced paths must not re-transfer them per call).
        self.batch_tile_d = jnp.asarray(self.batch_tile, jnp.int32)
        self.flags_d = jnp.asarray(self.flags, jnp.int32)
        self.cells_d = jnp.asarray(self.cells_b, jnp.int32)
        self.rank_full_d = jnp.asarray(rank_full)
        self.perm_fwd_d = jnp.asarray(self.perm_fwd)


def soft_voxelize_pallas(coords, plan: SoftPallasPlan, *,
                         tau_edge_frac: float = 0.25,
                         tau_x_frac: float = 0.5, clip: bool = True):
    """Differentiable occupancy grid via the fused Pallas accumulate.

    Same semantics as `voxtpu.ops.soft_vox.soft_voxelize` (one sigmoid
    X-profile per covering fragment, summed per cell), different engine.
    """
    from voxtpu.ops.soft_vox import _soft_fragments

    spec = plan.spec
    sp = plan.soft_plan
    vs = spec.voxel_size
    tau_e = tau_edge_frac * vs * vs
    tau_x = tau_x_frac * vs

    all_w, all_x = [], []
    for bucket in sp.buckets:
        window = bucket[0]
        fi = bucket[6]
        sy, sz = bucket[4], bucket[5]
        tri = coords[sp.faces_array[fi]]
        _, w, x = _soft_fragments(
            tri[:, 0], tri[:, 1], tri[:, 2], sy, sz,
            window=window, n=spec.n,
            origin=spec.origin, voxel_size=vs,
            tau_edge=tau_e,
        )
        all_w.append(w)
        all_x.append(x)
    w = jnp.concatenate(all_w) if all_w else jnp.zeros((0,), jnp.float32)
    x = jnp.concatenate(all_x) if all_x else jnp.zeros((0,), jnp.float32)

    wb, xb = _permute_to_batches(w, x, plan)
    prm = (float(spec.origin[0]), float(vs), float(tau_x))
    occ = soft_accumulate_pallas(wb, xb, plan, prm)
    if clip:
        occ = jnp.clip(occ, 0.0, 1.0)
    return occ
