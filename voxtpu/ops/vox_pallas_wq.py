"""Streamed work-queue Pallas voxelizer — experimental large-N path.

The batch-per-grid-step kernel (`voxtpu.ops.vox_pallas`) pays ~1 us of
fixed cost per batch AND rounds every (tile, segment) group up to TB
fragments; at 2048^3+ that combination loses to the reference GPU's
zero-padding work queue (BENCH_NOTES.md). This kernel is the true
work-queue shape: ONE grid step per active tile whose body fori-loops
over the tile's fragment run in double-buffered DMA chunks — no
per-batch padding (only each tile's run start is 128-aligned) and no
per-batch step cost.

Fragments live in HBM as 2D (rows, 128) arrays (cell-local and
x_entry); a chunk is CH_SUB rows DMA'd into VMEM scratch. Fragment x
values may span several X segments, so the fill matmul runs per present
segment under `pl.when(any-in-segment)` — most chunks touch one or two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voxtpu.grids.voxel_grid import WORD_BITS, GridSpec, VoxelGrid
from voxtpu.mesh.mesh import Mesh
from voxtpu.ops.vox import FragmentPlan, fragments_from_plan

LANE = 128
CH_SUB = 8          # chunk = CH_SUB x 128 fragments
CH = CH_SUB * LANE


def _wq_kernel(n: int, num_words: int, tc: int, seg: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_seg = n // seg

    def kernel(row_start_ref, num_chunks_ref, tile_id_ref, cells_hbm, xs_hbm,
               out_ref, counts, buf_c, buf_x, sems):
        a = pl.program_id(0)
        row0 = row_start_ref[a]
        nch = num_chunks_ref[a]

        counts[:] = jnp.zeros_like(counts)

        def dma(slot, ci):
            r = row0 + ci * CH_SUB
            return (
                pltpu.make_async_copy(
                    cells_hbm.at[pl.ds(r, CH_SUB)], buf_c.at[slot],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    xs_hbm.at[pl.ds(r, CH_SUB)], buf_x.at[slot],
                    sems.at[slot, 1]),
            )

        for d in dma(0, 0):
            d.start()

        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, LANE), 0)
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (seg, LANE), 0)

        def chunk_body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < nch)
            def _():
                for d in dma((ci + 1) % 2, ci + 1):
                    d.start()

            for d in dma(slot, ci):
                d.wait()

            for s in range(CH_SUB):
                cells_s = buf_c[slot, s, :]   # (128,), -1 = pad lane
                xs_s = buf_x[slot, s, :]
                onehot = (cell_iota == cells_s[None, :]).astype(jnp.int8)
                if n_seg == 1:
                    fill = (x_iota >= xs_s[None, :]).astype(jnp.int8)
                    counts[:] += jax.lax.dot_general(
                        onehot, fill,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                else:
                    frag_seg = xs_s // seg    # (128,)
                    for si in range(n_seg):
                        in_si = (frag_seg == si) & (cells_s >= 0)
                        hits = jnp.sum(in_si.astype(jnp.int32))

                        @pl.when(hits > 0)
                        def _(si=si, in_si=in_si):
                            oh = jnp.where(in_si[None, :], onehot,
                                           jnp.int8(0))
                            fill = (x_iota >= (xs_s - si * seg)[None, :]
                                    ).astype(jnp.int8)
                            acc = jax.lax.dot_general(
                                oh, fill,
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32,
                            )
                            counts[:, si * seg:(si + 1) * seg] += acc
                            if (si + 1) * seg < n:
                                counts[:, (si + 1) * seg:] += acc[:, seg - 1:seg]
            return 0

        jax.lax.fori_loop(0, nch, chunk_body, 0)

        bits = (counts[:] & 1).astype(jnp.bfloat16)
        x_col = jax.lax.broadcasted_iota(jnp.int32, (n, num_words), 0)
        w_col = jax.lax.broadcasted_iota(jnp.int32, (n, num_words), 1)
        in_word = (x_col // WORD_BITS) == w_col
        bit = x_col % WORD_BITS
        w_lo = jnp.where(in_word & (bit < 16),
                         (1 << jnp.clip(bit, 0, 15)).astype(jnp.float32),
                         0.0).astype(jnp.bfloat16)
        w_hi = jnp.where(in_word & (bit >= 16),
                         (1 << jnp.clip(bit - 16, 0, 15)).astype(jnp.float32),
                         0.0).astype(jnp.bfloat16)
        lo = jnp.dot(bits, w_lo, preferred_element_type=jnp.float32)
        hi = jnp.dot(bits, w_hi, preferred_element_type=jnp.float32)
        out_ref[0] = (
            lo.astype(jnp.int32).astype(jnp.uint32)
            | (hi.astype(jnp.int32).astype(jnp.uint32) << 16)
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "num_tiles", "tc", "seg"))
def _run_wq(cells2d, xs2d, row_start, num_chunks, tile_id, tile_mask, *,
            n: int, num_tiles: int, tc: int, seg: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_words = n // WORD_BITS
    num_active = row_start.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # row_start, num_chunks, tile_id
        grid=(num_active,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tc, num_words),
            lambda a, rs, nc, tid: (tid[a], 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((tc, n), jnp.int32),
            pltpu.VMEM((2, CH_SUB, LANE), jnp.int32),
            pltpu.VMEM((2, CH_SUB, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    words = pl.pallas_call(
        _wq_kernel(n, num_words, tc, seg),
        out_shape=jax.ShapeDtypeStruct((num_tiles, tc, num_words),
                                       jnp.uint32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(row_start, num_chunks, tile_id, cells2d, xs2d)
    words = jnp.where(tile_mask[:, None, None], words, jnp.uint32(0))
    return words.reshape(n, n, n // WORD_BITS)


class WorkQueueVoxPlan:
    """Tile-aligned fragment stream layout (no per-batch padding)."""

    def __init__(self, mesh: Mesh, spec: GridSpec,
                 fragments=None, tc: int = 128, seg: int = 512):
        n = spec.n
        if n % WORD_BITS != 0:
            raise ValueError("requires N % 32 == 0")
        seg = min(seg, n)
        if n % seg != 0:
            raise ValueError(f"seg={seg} must divide N={n}")
        self.spec, self.tc, self.seg = spec, tc, seg
        if fragments is None:
            fragments = fragments_from_plan(FragmentPlan(mesh, spec))
        cells, xs = (jnp.asarray(a) for a in fragments)
        num_tiles = (n * n) // tc
        self.num_tiles = num_tiles
        # Sort by (tile, x) so each tile's run is x-ordered (chunks then
        # mostly touch one segment).
        key = jnp.where(cells < n * n, (cells // tc) * n + xs,
                        jnp.int32(num_tiles * n))
        local = cells % tc
        key_sorted, local, xs_sorted = jax.lax.sort((key, local, xs),
                                                    num_keys=1)
        xs = xs_sorted

        probes = jnp.arange(num_tiles + 1, dtype=jnp.int32) * n
        bounds = np.asarray(jnp.searchsorted(key_sorted, probes))
        valid = int(bounds[-1])
        counts = np.diff(bounds)
        active = np.nonzero(counts)[0]

        # Each active tile's run starts at a 128-aligned row boundary in
        # the padded stream; pad lanes get cell -1.
        padded_counts = -(-counts[active] // CH) * CH if active.size else \
            np.zeros((0,), np.int64)
        # chunks per tile capped at CH granularity
        row_starts = np.concatenate([[0], np.cumsum(padded_counts)])[:-1] // LANE
        total = int(padded_counts.sum()) if active.size else CH
        num_chunks = (padded_counts // CH if active.size
                      else np.ones((1,), np.int64))

        src_idx = np.zeros((total,), np.int64)
        lane_ok = np.zeros((total,), bool)
        for i, t in enumerate(active):
            dst0 = int(row_starts[i]) * LANE
            c = int(counts[t])
            src_idx[dst0:dst0 + c] = np.arange(bounds[t], bounds[t] + c)
            lane_ok[dst0:dst0 + c] = True
        src = jnp.asarray(np.clip(src_idx, 0, max(valid - 1, 0)))
        ok = jnp.asarray(lane_ok)
        cells_flat = jnp.where(ok, local[:max(valid, 1)][src], -1)
        xs_flat = jnp.where(ok, xs[:max(valid, 1)][src], 0)
        self.cells2d = cells_flat.reshape(-1, LANE).astype(jnp.int32)
        self.xs2d = xs_flat.reshape(-1, LANE).astype(jnp.int32)
        self.row_start = np.asarray(row_starts, np.int32)
        self.num_chunks = np.asarray(num_chunks, np.int32)
        self.tile_id = active.astype(np.int32) if active.size else \
            np.zeros((1,), np.int32)
        if not active.size:
            self.row_start = np.zeros((1,), np.int32)
        tile_mask = np.zeros((num_tiles,), bool)
        tile_mask[active] = True
        self.tile_mask = jnp.asarray(tile_mask)
        self.num_fragments = valid
        self.num_active = self.tile_id.shape[0]


def voxelize_wq(mesh: Mesh, spec: GridSpec,
                plan: WorkQueueVoxPlan | None = None) -> VoxelGrid:
    if plan is None:
        plan = WorkQueueVoxPlan(mesh, spec)
    words = _run_wq(
        plan.cells2d, plan.xs2d,
        jnp.asarray(plan.row_start), jnp.asarray(plan.num_chunks),
        jnp.asarray(plan.tile_id), plan.tile_mask,
        n=spec.n, num_tiles=plan.num_tiles, tc=plan.tc, seg=plan.seg,
    )
    return VoxelGrid(
        words=words,
        origin=jnp.asarray(spec.origin, jnp.float32),
        voxel_size=jnp.float32(spec.voxel_size),
    )
