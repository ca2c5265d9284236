"""Pallas TPU tiled voxelizer — the performance path.

TPU-first replacement for the reference's flagship work-queue kernel
(`vox/tiled.cu:372-486`): one grid step per *fragment batch* instead of
one CUDA block per 4x4 tile, and the atomicXor column fill becomes an
MXU matmul:

    For a tile of TC consecutive YZ cells and a batch of TB fragments
    (cell, x_entry), the parity-count update is

        counts[cell, x] += sum_f onehot[cell, f] * (x >= x_f)

    one (TC x TB) @ (TB x N) contraction of a one-hot matrix with a
    suffix-step matrix (int8 operands, int32 accumulation — the MXU's
    fastest path; both matrices are 0/1 so int8 is exact). At the last
    batch of each tile the counts are reduced mod 2 and bit-packed into
    uint32 words with two more tiny matmuls (weights 2^b split into
    16-bit halves to stay within float32-exact integer range).

The reference's tile-assignment stages (overlap count / scan / work
queue population / radix sort / RLE, `vox/tiled.cu:15-370`) become:
fragment emission (XLA, `voxtpu.ops.vox.emit_fragments`), one
`jax.lax.sort` by cell, and a device-side batch layout driven by a tiny
(num_tiles+1) host round-trip — reusable across iterations, unlike the
reference which rebuilds its queue every call.

Output blocks are accumulated in VMEM scratch across the sequential
Pallas grid (TPU grid steps run in order on the core, so revisiting the
same output block is the idiomatic accumulation pattern).

Tile geometry: TILE_CELLS is the MXU M dimension (output rows DMA'd per
tile) and TB = TB_SUB * 128 the K dimension. Defaults were swept on a
TPU v5e (see BENCH_NOTES.md): small batches win — padding waste from
rounding each tile's fragment count up to TB dominates over per-step
overhead for surface meshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voxtpu.grids.voxel_grid import WORD_BITS, GridSpec, VoxelGrid
from voxtpu.mesh.mesh import Mesh
from voxtpu.ops.vox import FragmentPlan, fragments_from_plan

TILE_CELLS = 128          # cells (YZ columns) per output tile, MXU M dim
TB_SUB, TB_LANE = 4, 128  # fragment batch = TB_SUB x 128 panel
FLAG_FIRST = 1
FLAG_LAST = 2


def _pallas_kernel(n: int, num_words: int, tc: int, tb: int, seg: int):
    from jax.experimental import pallas as pl

    tb_sub = tb // TB_LANE

    n_seg = n // seg

    def kernel(batch_tile_ref, flags_ref, xseg_ref, cell_ref, x_ref,
               init_ref, out_ref, counts):
        del init_ref  # HBM-resident zeros aliased to out (never read)
        b = pl.program_id(0)
        flags = flags_ref[b]
        xseg = xseg_ref[b]
        xbase = xseg * seg

        # Per 128-lane panel: onehot (TC, 128) int8 x fill (SEG, 128) int8,
        # contracted over the lane dim -> (TC, SEG) int32 on the MXU. Both
        # matrices are 0/1 so int8 is exact (int8 is the MXU's fastest
        # path); Mosaic cannot reshape lane panels into sublanes, hence
        # the python loop instead of one fused (TC, TB) @ (TB, SEG) dot.
        # Fragments are batched per (tile, X-segment), so the suffix-fill
        # matmul spans a fixed SEG columns regardless of N — per-fragment
        # MXU work stays constant as the grid grows. The fill beyond the
        # segment is a per-cell parity carry, applied as one masked add.
        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, TB_LANE), 0)
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (seg, TB_LANE), 0)
        acc = jnp.zeros((tc, seg), jnp.int32)
        for s in range(tb_sub):
            cells_s = cell_ref[0, s, :]  # (128,) lane vector, -1 = inert
            xl_s = x_ref[0, s, :] - xbase
            onehot = (cell_iota == cells_s[None, :]).astype(jnp.int8)
            fill_t = (x_iota >= xl_s[None, :]).astype(jnp.int8)  # (SEG, 128)
            acc += jax.lax.dot_general(
                onehot, fill_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        # Every valid fragment has xl in [0, seg), so the accumulator's
        # last column is exactly the per-cell fragment count = the carry.
        carry = acc[:, seg - 1:seg]

        @pl.when((flags & FLAG_FIRST) != 0)
        def _():
            counts[:] = jnp.zeros_like(counts)

        # Mosaic cannot dynamic-slice the lane dimension; n_seg is tiny
        # (<= 8), so branch to a static slice per segment. The suffix
        # carry beyond the segment is the same per-cell parity for every
        # later column.
        for si in range(n_seg):
            @pl.when(xseg == si)
            def _(si=si):
                counts[:, si * seg:(si + 1) * seg] += acc
                if (si + 1) * seg < n:
                    counts[:, (si + 1) * seg:] += carry

        @pl.when((flags & FLAG_LAST) != 0)
        def _():
            bits = (counts[:] & 1).astype(jnp.bfloat16)  # (TC, N)
            # Pack 32 bits/word via two exact matmuls (2^0..2^15 halves):
            # 0/1 bits and power-of-two weights are exact in bf16, the
            # f32 accumulator holds sums < 2^16 exactly, and bf16 runs
            # the MXU at twice the f32 rate (this pack is the flop floor
            # at large N — once per active tile over all N columns).
            x_col = jax.lax.broadcasted_iota(jnp.int32, (n, num_words), 0)
            w_col = jax.lax.broadcasted_iota(jnp.int32, (n, num_words), 1)
            in_word = (x_col // WORD_BITS) == w_col
            bit = x_col % WORD_BITS
            # where() on bf16 trips a Mosaic relayout bug on the i1 mask
            # (vector<NxWxi1> replication mismatch); select in f32, then
            # downcast (exact: the values are powers of two < 2^16).
            w_lo = jnp.where(in_word & (bit < 16),
                             (1 << jnp.clip(bit, 0, 15)).astype(jnp.float32),
                             0.0).astype(jnp.bfloat16)
            w_hi = jnp.where(in_word & (bit >= 16),
                             (1 << jnp.clip(bit - 16, 0, 15)).astype(jnp.float32),
                             0.0).astype(jnp.bfloat16)
            lo = jnp.dot(bits, w_lo, preferred_element_type=jnp.float32)
            hi = jnp.dot(bits, w_hi, preferred_element_type=jnp.float32)
            # Mosaic lacks f32->u32 casts; round-trip through int32.
            words = (
                lo.astype(jnp.int32).astype(jnp.uint32)
                | (hi.astype(jnp.int32).astype(jnp.uint32) << 16)
            )
            out_ref[0] = words

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n", "num_tiles", "tc", "tb_sub", "seg"))
def _run_pallas(local_cells, xs, batch_tile, flags, batch_xseg, *,
                n: int, num_tiles: int,
                tc: int = TILE_CELLS, tb_sub: int = TB_SUB,
                seg: int | None = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tb = tb_sub * TB_LANE
    seg = n if seg is None else min(seg, n)
    if n % seg != 0:
        raise ValueError(f"seg={seg} must divide N={n}")
    num_words = n // WORD_BITS
    num_batches = local_cells.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # batch_tile, flags, batch_xseg
        grid=(num_batches,),
        in_specs=[
            pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tc, num_words),
            lambda b, batch_tile, flags, xseg: (batch_tile[b], 0, 0),
        ),
        scratch_shapes=[pltpu.VMEM((tc, n), jnp.int32)],
    )
    flops = num_batches * 2 * tb * tc * seg
    # The output buffer IS a donated zeros input (alias index = 3
    # scalar-prefetch + 2 fragment operands): tiles no batch visits keep
    # their zeros, so callers need no tile_mask pass afterwards — that
    # pass was a full extra grid read+write in HBM (the `_run_we` 4096^3
    # lesson, BENCH_NOTES round 4: XLA cannot fuse into or out of a
    # pallas result).
    init = jnp.zeros((num_tiles, tc, num_words), jnp.uint32)
    return pl.pallas_call(
        _pallas_kernel(n, num_words, tc, tb, seg),
        out_shape=jax.ShapeDtypeStruct((num_tiles, tc, num_words), jnp.uint32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=num_batches * tb * 8, transcendentals=0
        ),
        input_output_aliases={5: 0},
        # Off-TPU (tests on the CPU mesh) the kernel runs interpreted.
        interpret=jax.default_backend() != "tpu",
    )(batch_tile, flags, batch_xseg, local_cells, xs, init)


@functools.partial(jax.jit, static_argnames=("tb",))
def _gather_batches(sorted_locals, sorted_xs, starts, ends, *, tb: int):
    """Device-side batch materialization: gather sorted fragments into
    (B, TB) panels with -1 inert lanes (replaces a host gather of MBs —
    only the tiny per-segment bounds array crosses the tunnel)."""
    nvalid = sorted_locals.shape[0]
    idx = starts[:, None] + jnp.arange(tb, dtype=jnp.int32)[None, :]
    in_range = idx < ends[:, None]
    idx_c = jnp.clip(idx, 0, max(nvalid - 1, 0))
    local = jnp.where(in_range, sorted_locals[idx_c], -1)
    xvals = jnp.where(in_range, sorted_xs[idx_c], 0)
    return local.astype(jnp.int32), xvals.astype(jnp.int32)


def tile_batches(bounds: np.ndarray, tb: int):
    """Shared per-tile batch layout (also used by the soft voxelizer).

    Given per-tile fragment ranges `bounds` (num_tiles+1, from a
    searchsorted over tile-sorted cells) and batch size `tb`, produce the
    (batch_tile, batch_start, flags, end, tile_mask) arrays: each active
    tile's fragment run is cut into ceil(count/tb) batches, the first
    flagged FLAG_FIRST (zero the VMEM accumulator) and the last FLAG_LAST
    (flush the tile's output block). Falls back to one inert
    FIRST|LAST batch on tile 0 for an empty fragment set.
    """
    counts = np.diff(bounds)
    active = np.nonzero(counts)[0]
    batch_tiles, batch_starts, batch_flags = [], [], []
    for t in active:
        nb = -(-int(counts[t]) // tb)
        for i in range(nb):
            batch_tiles.append(t)
            batch_starts.append(bounds[t] + i * tb)
            batch_flags.append(
                (FLAG_FIRST if i == 0 else 0)
                | (FLAG_LAST if i == nb - 1 else 0)
            )
    if not batch_tiles:
        batch_tiles, batch_starts, batch_flags = [0], [0], [
            FLAG_FIRST | FLAG_LAST
        ]
    batch_tiles = np.asarray(batch_tiles, np.int64)
    batch_starts = np.asarray(batch_starts, np.int64)
    ends = np.minimum(batch_starts + tb, bounds[batch_tiles + 1])
    tile_mask = np.zeros(len(bounds) - 1, bool)
    tile_mask[active] = True
    return (batch_tiles, batch_starts,
            np.asarray(batch_flags, np.int32), ends, tile_mask, active)


class PallasVoxPlan:
    """Sorted-fragment batch layout for one (mesh, grid) pair.

    Fragments are keyed by (YZ tile, X segment of width `seg`): the
    kernel's suffix-fill matmul then spans a fixed `seg` columns with a
    per-cell parity carry for everything beyond, keeping per-fragment
    MXU work constant in N (a full-N fill loses to the reference's
    work-queue kernel from 2048^3 up — BENCH_NOTES.md)."""

    def __init__(self, mesh: Mesh, spec: GridSpec,
                 frag_plan: FragmentPlan | None = None,
                 fragments=None, tc: int = TILE_CELLS, tb_sub: int = TB_SUB,
                 seg: int | None = None):
        if spec.n % WORD_BITS != 0:
            raise ValueError("pallas vox requires N % 32 == 0")
        n = spec.n
        if tc <= 0 or (n * n) % tc != 0:
            raise ValueError(
                f"tc={tc} must be positive and divide N^2={n * n} "
                "(tiles are TC consecutive YZ cells)"
            )
        tb = tb_sub * TB_LANE
        # Default: one segment spanning the whole X axis. Measured on a
        # v5e (BENCH_NOTES.md): splitting into X segments cuts fill
        # flops but multiplies batch count, and ~1 us/grid-step fixed
        # cost dominates — segmentation only approaches break-even at
        # 2048^3 (seg=512, tb_sub=2) and regresses below that.
        seg = n if seg is None else min(seg, n)
        if n % seg != 0:
            raise ValueError(f"seg={seg} must divide N={n}")
        n_seg = n // seg
        self.spec = spec
        self.tc = tc
        self.tb_sub = tb_sub
        self.seg = seg
        if fragments is None:
            if frag_plan is None:
                frag_plan = FragmentPlan(mesh, spec)
            fragments = fragments_from_plan(frag_plan)
        cells, xs = (jnp.asarray(a) for a in fragments)
        num_tiles = (n * n) // tc
        self.num_tiles = num_tiles
        # Composite sort key (tile, xseg); the n*n cell sentinel maps to
        # key num_tiles * n_seg (xs = 0 there), sorting past every probe.
        key = (cells // tc) * n_seg + jnp.where(cells < n * n, xs // seg, 0)
        local = cells % tc
        key, local, xs = jax.lax.sort((key, local, xs), num_keys=1)

        # Tiny D2H: fragment ranges per (tile, xseg) group.
        probes = jnp.arange(num_tiles * n_seg + 1, dtype=jnp.int32)
        bounds = np.asarray(jnp.searchsorted(key, probes))
        valid = int(bounds[-1])

        batch_group, starts_h, _, ends_h, group_mask, _ = tile_batches(
            bounds, tb
        )
        b = len(batch_group)
        batch_tiles = batch_group // n_seg
        batch_xseg = batch_group % n_seg
        # FIRST/LAST flags at *tile* granularity (the VMEM accumulator
        # spans all of a tile's segments).
        first = np.empty(b, bool)
        first[0] = True
        first[1:] = batch_tiles[1:] != batch_tiles[:-1]
        last = np.empty(b, bool)
        last[-1] = True
        last[:-1] = batch_tiles[:-1] != batch_tiles[1:]
        flags = (first * FLAG_FIRST + last * FLAG_LAST).astype(np.int32)

        starts = jnp.asarray(starts_h.astype(np.int32))
        ends = jnp.asarray(np.minimum(ends_h, valid).astype(np.int32))
        local_b, xvals = _gather_batches(
            local[:max(valid, 1)], xs[:max(valid, 1)], starts, ends, tb=tb,
        )
        self.local_cells = local_b.reshape(b, tb_sub, TB_LANE)
        self.xs = xvals.reshape(b, tb_sub, TB_LANE)
        self.batch_tile = jnp.asarray(batch_tiles, jnp.int32)   # (B,)
        self.flags = jnp.asarray(flags, jnp.int32)              # (B,)
        self.batch_xseg = jnp.asarray(batch_xseg, jnp.int32)    # (B,)
        self.tile_mask = jnp.asarray(
            group_mask.reshape(num_tiles, n_seg).any(axis=1)
        )
        self.num_fragments = valid
        self.num_batches = b


@functools.partial(jax.jit,
                   static_argnames=("n", "num_tiles", "tc", "tb_sub", "seg"))
def _pallas_words(local_cells, xs, batch_tile, flags, batch_xseg, tile_mask,
                  *, n: int, num_tiles: int, tc: int = TILE_CELLS,
                  tb_sub: int = TB_SUB, seg: int | None = None):
    del tile_mask  # zero-init alias: unvisited tiles are already 0
    words = _run_pallas(local_cells, xs, batch_tile, flags, batch_xseg,
                        n=n, num_tiles=num_tiles, tc=tc, tb_sub=tb_sub,
                        seg=seg)
    return words.reshape(n, n, n // WORD_BITS)


def voxelize_pallas(mesh: Mesh, spec: GridSpec,
                    plan: "PallasVoxPlan | FragmentPlan | None" = None) -> VoxelGrid:
    """Solid voxelization on TPU via the tiled Pallas kernels.

    Two kernels share this entry point; the lane-packed word-event
    kernel (`voxtpu.ops.vox_pallas_we`) is the default — bit-identical
    to this module's suffix-fill kernel and faster at every measured
    size (3.5x at 512^3 after round-3 lane packing: 0.36 vs 1.27 ms,
    BENCH_NOTES.md). Pass an explicit `PallasVoxPlan` to force the
    suffix kernel (e.g. for comparison sweeps).
    """
    from voxtpu.ops.vox_pallas_we import WordEventVoxPlan, voxelize_pallas_we

    if plan is None or isinstance(plan, (FragmentPlan, WordEventVoxPlan)):
        return voxelize_pallas_we(mesh, spec, plan=plan)
    words = _pallas_words(
        plan.local_cells, plan.xs, plan.batch_tile, plan.flags,
        plan.batch_xseg, plan.tile_mask,
        n=spec.n, num_tiles=plan.num_tiles, tc=plan.tc, tb_sub=plan.tb_sub,
        seg=plan.seg,
    )
    return VoxelGrid(
        words=words,
        origin=jnp.asarray(spec.origin, jnp.float32),
        voxel_size=jnp.float32(spec.voxel_size),
    )
