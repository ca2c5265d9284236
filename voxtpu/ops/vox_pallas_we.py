"""Pallas TPU word-event voxelizer — the large-N performance path.

The round-1 suffix-fill kernel (`voxtpu.ops.vox_pallas`) pays
O(TB x TC x N) MXU flops per fragment batch: every fragment's column
fill spans all N X-columns. That wins up to 1024^3 but loses to the
reference's work-queue kernel (`vox/tiled.cu:372-486`) from 2048^3,
where most tiles hold under one batch of fragments and the padded
full-width fill dominates (BENCH_NOTES.md).

This kernel reformulates the parity fill at WORD granularity. For a
fragment with entry x = 32*w + b, the suffix mask over word q is

    full ones            if q > w      (the "carry")
    0xFFFFFFFF << b      if q == w     (the in-word mask)
    0                    if q < w

so the packed result decomposes as

    words[c, q] = (XOR of in-word masks of fragments at (c, q))
                  XOR (0xFFFFFFFF if #fragments with w_f < q is odd)

Fragments are pre-reduced on device (sort by (cell, word) + segmented
XOR / count parity) into at most one **word event** per touched
(cell, word): (cell, w, mask32, count&1). Uniqueness is what lets the
MXU accumulate mask BYTES by addition: each (c, q) output slot receives
at most one event, so an int8 one-hot x value matmul recovers the byte
exactly (values are reinterpreted int8, un-done by `& 0xFF`).

Per batch of TB events the kernel runs 5 int8 matmuls of shape
(TC, TB) @ (TB, N/32): one carry-count and four mask bytes — vs the
suffix kernel's one (TC, TB) @ (TB, N) fill. At N = 2048 that is 6.4x
fewer MXU flops at the same int8 rate, every operand build is a
(N/32, 128) or (TC, 128) compare (the suffix kernel builds (N, 128)
fills — the real bottleneck), and the end-of-tile bit-pack matmuls
vanish entirely: the accumulators already live at word granularity.

Layout mirrors `vox_pallas`: batches of TB = TB_SUB x 128 events per
grid step, scalar-prefetched tile ids and FIRST/LAST flags, VMEM
accumulators flushed to the tile's output block on LAST.

Lane packing (round 3): Mosaic floors the output lane dimension at 128,
but a grid of N columns only has N/32 word columns — 16 at 512^3, so
7/8 of every matmul's output lanes were dead (VERDICT r2 weak #1). Now
G = 128 // (N/32) consecutive YZ tiles form one SUPERTILE whose output
panel packs all G tiles' word columns side by side: an event in
sub-tile g at word w lands in lane g * (N/32) + w, and its carry fill
is bounded above by the sub-tile's last lane (a second compare against
a per-event `hi` bound). Every matmul column is live at every N; at
N >= 4096 G = 1 and the kernel is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voxtpu.grids.voxel_grid import WORD_BITS, GridSpec, VoxelGrid
from voxtpu.mesh.mesh import Mesh
from voxtpu.ops.vox import FragmentPlan, fragments_from_plan
from voxtpu.ops.vox_pallas import (FLAG_FIRST, FLAG_LAST, TB_LANE,
                                   _gather_batches, tile_batches)

TILE_CELLS = 128
TB_SUB = 4
_LANE_MIN = 128  # Mosaic lane-dim floor: pad N/32 columns up to one panel


def _we_kernel(num_words: int, wpad: int, tc: int, tb_sub: int):
    from jax.experimental import pallas as pl

    def kernel(batch_tile_ref, flags_ref, cell_ref, w_ref, hi_ref, mask_ref,
               cnt_ref, init_ref, out_ref,
               acc_carry, acc_b0, acc_b1, acc_b2, acc_b3):
        del init_ref  # HBM-resident zeros aliased to out (never read)
        b = pl.program_id(0)
        flags = flags_ref[b]

        @pl.when((flags & FLAG_FIRST) != 0)
        def _():
            acc_carry[:] = jnp.zeros_like(acc_carry)
            acc_b0[:] = jnp.zeros_like(acc_b0)
            acc_b1[:] = jnp.zeros_like(acc_b1)
            acc_b2[:] = jnp.zeros_like(acc_b2)
            acc_b3[:] = jnp.zeros_like(acc_b3)

        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, TB_LANE), 0)
        q_iota = jax.lax.broadcasted_iota(jnp.int32, (wpad, TB_LANE), 0)
        byte_accs = (acc_b0, acc_b1, acc_b2, acc_b3)
        for s in range(tb_sub):
            cells_s = cell_ref[0, s, :]   # (128,) sub-tile row, -1 inert
            w_s = w_ref[0, s, :]          # packed lane g*nw + w, -1 inert
            hi_s = hi_ref[0, s, :]        # sub-tile lane bound (g+1)*nw
            m_s = mask_ref[0, s, :]       # in-word XOR mask (int32 bits)
            c_s = cnt_ref[0, s, :]        # fragment-count parity 0/1
            onehot = (cell_iota == cells_s[None, :]).astype(jnp.int8)
            eq = q_iota == w_s[None, :]
            # Carry: +1 to every later word OF THE SAME SUB-TILE (lanes
            # pack G sub-tiles side by side), odd counts only.
            carry_fill = jnp.where(
                (q_iota > w_s[None, :]) & (q_iota < hi_s[None, :])
                & (c_s[None, :] > 0), 1, 0
            ).astype(jnp.int8)
            acc_carry[:] += jax.lax.dot_general(
                onehot, carry_fill,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # Mask bytes ride the MXU as sign-reinterpreted int8 values;
            # uniqueness of (cell, word) events makes the sums exact
            # single values, recovered below with & 0xFF.
            for k, acc in enumerate(byte_accs):
                byte = (m_s >> (8 * k)) & 0xFF
                byte_s8 = (byte << 24) >> 24  # sign-extend low 8 bits
                fill = jnp.where(eq, byte_s8[None, :], 0).astype(jnp.int8)
                acc[:] += jax.lax.dot_general(
                    onehot, fill,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

        @pl.when((flags & FLAG_LAST) != 0)
        def _():
            word = (
                (acc_b0[:] & 0xFF)
                | ((acc_b1[:] & 0xFF) << 8)
                | ((acc_b2[:] & 0xFF) << 16)
                | ((acc_b3[:] & 0xFF) << 24)
            )
            # Odd carry flips the whole word (two's complement -1 = ones).
            word = word ^ (-(acc_carry[:] & 1))
            out_ref[0] = word.astype(jnp.uint32)

    return kernel


def _group_factor(num_words: int, num_tiles: int) -> int:
    """Sub-tiles packed per 128-lane output panel (1 at N >= 4096).

    Must DIVIDE num_tiles: every output panel holds exactly g
    consecutive sub-tiles (`_events_core`'s supertile decode and
    `_run_we`'s final reshape assume it). At power-of-two N the
    minimum is itself a power of two and divides; at other valid
    grids it need not (N = 96: num_tiles = 72, lanes allow 42), so
    round down to the largest divisor."""
    g = max(1, min(_LANE_MIN // num_words, num_tiles))
    while num_tiles % g:
        g -= 1
    return g


@functools.partial(jax.jit,
                   static_argnames=("num_words", "num_tiles", "tc", "tb_sub"))
def _run_we(cells, ws, his, masks, cnts, batch_tile, flags, *,
            num_words: int, num_tiles: int, tc: int, tb_sub: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tb = tb_sub * TB_LANE
    g = _group_factor(num_words, num_tiles)
    num_super = num_tiles // g
    wpad = max(g * num_words, _LANE_MIN)
    num_batches = cells.shape[0]
    out_blocks = num_super
    spec3 = pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # batch_tile, flags
        grid=(num_batches,),
        in_specs=[spec3, spec3, spec3, spec3, spec3,
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec(
            (1, tc, wpad), lambda b, batch_tile, flags: (batch_tile[b], 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((tc, wpad), jnp.int32)] * 5,
    )
    flops = num_batches * 5 * 2 * tb * tc * wpad
    # The output buffer IS a donated zeros input (alias index = 2
    # scalar-prefetch + 5 event operands): supertiles no batch visits
    # keep their zeros, so callers need no tile_mask pass afterwards.
    # That pass cost a full extra grid in HBM — a second 8.6 GB live
    # buffer at 4096^3, which pushed the one-jit total past the chip
    # (round-4 battery RESOURCE_EXHAUSTED; XLA cannot fuse into or out
    # of a pallas result).
    init = jnp.zeros((out_blocks, tc, wpad), jnp.uint32)
    out = pl.pallas_call(
        _we_kernel(num_words, wpad, tc, tb_sub),
        out_shape=jax.ShapeDtypeStruct((out_blocks, tc, wpad), jnp.uint32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=num_batches * tb * 20,
            transcendentals=0,
        ),
        input_output_aliases={7: 0},
        interpret=jax.default_backend() != "tpu",
    )(batch_tile, flags, cells, ws, his, masks, cnts, init)
    return out[:num_super, :, :g * num_words]


# Host-side constant: a module-level DEVICE array would be deleted by
# bench._hbm_recover()'s live-array sweep (tests run it in-process) and
# later traces that embed it as a compile-time constant would raise
# "Array has been deleted" (round-5 suite failure).
_SENT = np.uint32(0xFFFFFFFF)
_BLOCK = 512   # candidates per compaction block (one axis-sort row)
_ROW = 16      # compaction granularity: 64-byte row gathers, not elements


def _block_compact(arrs, *, cap: int, block: int = _BLOCK, row: int = _ROW):
    """Dense-prefix compaction of the valid entries of u32 arrays.

    `arrs` is a tuple of equal-length u32 arrays; `arrs[0]` is the key
    with invalid entries == 0xFFFFFFFF (payload entries of invalids must
    be 0). Valid entries are moved to (approximately) the front of a
    `cap`-length result in block-stable order; up to `row - 1` sentinel
    pad slots may remain interleaved after each source block's run, so
    the result is for feeding a SORT, not for direct indexing.

    Why this exists: at 512^3 on the 1.35M-face bunny only ~4% of the
    6.5M emitted candidate slots survive the edge tests, so the global
    (cell, word) sort was paying a 24x-too-long sort. Compacting first
    costs one axis-(block)-local sort (vectorized bitonic over the lane
    dim, cheap) plus one ROW-granular gather (64-byte rows ride the
    ~5 GB/s row-gather path; element gathers run ~0.6 GB/s and would
    eat the win — the round-3 gather lesson, CLAUDE.md).

    Returns (compacted_arrays, overflow_rows): overflow_rows > 0 means
    `cap` was too small and that many 16-slot rows were dropped.
    """
    assert cap % row == 0 and block % row == 0
    f = arrs[0].shape[0]
    fp = -(-f // block) * block
    if fp != f:
        key_pad = jnp.full((fp - f,), _SENT)
        arrs = tuple(
            jnp.concatenate([a, key_pad if i == 0
                             else jnp.zeros((fp - f,), a.dtype)])
            for i, a in enumerate(arrs))
    nb = fp // block
    mats = tuple(a.reshape(nb, block) for a in arrs)
    if len(mats) == 1:
        mats = (jax.lax.sort(mats[0], dimension=1),)
    else:
        mats = jax.lax.sort(mats, dimension=1, num_keys=1)
    counts = jnp.sum(mats[0] != _SENT, axis=1, dtype=jnp.int32)
    rows_b = -((-counts) // row)
    rcum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(rows_b, dtype=jnp.int32)])
    cap_rows = cap // row
    total_rows = rcum[-1]
    overflow = jnp.maximum(total_rows - cap_rows, 0)
    # Output row j belongs to source block b_j = #{b : rcum[b+1] <= j}
    # (the scatter-add + cumsum rank trick; empty blocks stack marks).
    marks = jnp.zeros((cap_rows + 1,), jnp.int32)
    marks = marks.at[jnp.clip(rcum[1:], 0, cap_rows)].add(1)
    rj = jnp.arange(cap_rows, dtype=jnp.int32)
    bj = jnp.clip(jnp.cumsum(marks)[:cap_rows], 0, nb - 1)
    lj = rj - rcum[bj]
    live = rj < total_rows
    src = jnp.where(live, bj * (block // row) + lj, 0)
    outs = []
    for i, m in enumerate(mats):
        rows_view = m.reshape(nb * (block // row), row)
        got = jnp.take(rows_view, src, axis=0)
        fill = _SENT if i == 0 else jnp.zeros((), m.dtype)
        outs.append(jnp.where(live[:, None], got, fill).reshape(-1))
    return tuple(outs), overflow


def _sorted_keys_from_fragments(cells, xs, *, n: int, cap_f: int | None):
    """(cell, x_entry) fragments -> ascending (ckey_s, mask_s) u32 pair.

    ckey = cell * num_words + word (invalid >= n^2*num_words), mask the
    in-word suffix mask (0 for invalid). When `cap_f` is given the
    fragments are block-compacted to that capacity before the global
    sort (the per-call fast path); None sorts the full array (plan
    build). At N <= 1024 the whole fragment packs into ONE u32
    (cell*n + x < 2^30), so both the compaction and the global sort
    move a single array; larger N carries the mask as a sort payload.

    Returns (ckey_s, mask_s, overflow_rows).
    """
    num_words = n // WORD_BITS
    valid = cells < n * n
    ovf = jnp.int32(0)
    if n <= 1024:
        key = jnp.where(valid, (cells * n + xs).astype(jnp.uint32), _SENT)
        if cap_f is not None:
            (key,), ovf = _block_compact((key,), cap=cap_f)
        key_s = jax.lax.sort(key)
        ckey_s = key_s >> 5  # cell*n + x >> 5 == cell*num_words + word
        mask_s = jnp.where(
            key_s != _SENT,
            jnp.uint32(0xFFFFFFFF) << (key_s & jnp.uint32(31)),
            jnp.uint32(0))
    else:
        wf = jnp.minimum(xs // WORD_BITS, num_words - 1)
        ckey = (cells.astype(jnp.uint32) * jnp.uint32(num_words)
                + wf.astype(jnp.uint32))
        ckey = jnp.where(valid, ckey, _SENT)
        mask = jnp.uint32(0xFFFFFFFF) << (xs % WORD_BITS).astype(jnp.uint32)
        mask = jnp.where(valid, mask, jnp.uint32(0))
        if cap_f is not None:
            (ckey, mask), ovf = _block_compact((ckey, mask), cap=cap_f)
        ckey_s, mask_s = jax.lax.sort((ckey, mask), num_keys=1)
    return ckey_s, mask_s, ovf


def _events_core(ckey_s, mask_s, *, n: int, tc: int, cap_e: int):
    """Sorted (ckey, mask) fragments -> word events + supertile bounds.

    One event per distinct (cell, word) segment: segment starts are
    found by neighbor comparison, compacted by a single-array index
    sort, and the per-segment XOR mask / count parity come from three
    cap_e-sized gathers into the XOR prefix scan (exclusive prefix at
    the start vs inclusive at the last member) — small gathers from a
    cache-resident source, not F-sized ones.

    Returns (local_e, w_e, hi_e, mask_e, cnt_e, bounds, num_events,
    overflow_events); event arrays have length cap_e with pads carrying
    row -1 / lane -1 / zero mask, `bounds` the per-SUPERTILE event
    ranges (num_super + 1). `overflow_events` > 0 means cap_e truncated
    real events.
    """
    from voxtpu.ops.vox import _cumxor

    f = ckey_s.shape[0]
    num_words = n // WORD_BITS
    cklim = jnp.uint32(n * n * num_words)
    valid_s = ckey_s < cklim
    nvalid = jnp.sum(valid_s, dtype=jnp.int32)
    scan = _cumxor(mask_s)  # inclusive XOR prefix over sorted masks

    prev = jnp.concatenate([jnp.full((1,), _SENT), ckey_s[:-1]])
    start = (ckey_s != prev) & valid_s
    num_events = jnp.sum(start, dtype=jnp.int32)
    iota = jnp.arange(f, dtype=jnp.int32)
    spos_s = jnp.sort(jnp.where(start, iota, jnp.int32(f)))
    spos_p = jnp.concatenate([spos_s, jnp.full((1,), f, jnp.int32)])
    ce = min(cap_e, f)
    spos_e = spos_p[:ce]
    pad_e = spos_e >= f
    # Segment i ends where segment i+1 begins; the last real segment
    # ends at nvalid (valids are the sorted prefix).
    nxt = spos_p[1:ce + 1]
    nxt = jnp.where(nxt >= f, nvalid, nxt)

    spc = jnp.clip(spos_e, 0, f - 1)
    k0 = ckey_s[spc]
    pexcl = jnp.where(spos_e > 0,
                      scan[jnp.clip(spos_e - 1, 0, f - 1)], jnp.uint32(0))
    pincl = scan[jnp.clip(nxt - 1, 0, f - 1)]
    mask_e = jnp.where(pad_e, jnp.uint32(0), pincl ^ pexcl)
    cnt_e = jnp.where(pad_e, 0, (nxt - spos_e) & 1)
    cell_e = jnp.where(pad_e, jnp.int32(n * n),
                       (k0 // num_words).astype(jnp.int32))
    w_raw = (k0 % num_words).astype(jnp.int32)
    overflow = jnp.maximum(num_events - ce, 0)

    num_tiles = (n * n) // tc
    g = _group_factor(num_words, num_tiles)
    num_super = num_tiles // g
    super_key = jnp.minimum(cell_e // (tc * g), num_super)
    probes = jnp.arange(num_super + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(super_key, probes).astype(jnp.int32)
    ok = ~pad_e
    local_e = jnp.where(ok, cell_e % tc, -1)
    sub_e = (cell_e // tc) % g  # sub-tile within the supertile
    w_e = jnp.where(ok, sub_e * num_words + w_raw, -1)
    hi_e = jnp.where(ok, (sub_e + 1) * num_words, 0)
    return local_e, w_e, hi_e, mask_e, cnt_e, bounds, num_events, overflow


@functools.partial(jax.jit, static_argnames=("n", "tc"))
def _build_events(cells, xs, *, n: int, tc: int):
    """Device-side fragment -> word-event reduction — ONE jit call, full
    size (no capacity; used by the plan-build path where F-sized arrays
    are fine and only the tiny bounds array crosses the tunnel).

    Returns (local_e, w_e, hi_e, mask_e, cnt_e, bounds, num_events_dev);
    see `_events_core` for the array contracts.
    """
    ckey_s, mask_s, _ = _sorted_keys_from_fragments(cells, xs, n=n,
                                                    cap_f=None)
    out = _events_core(ckey_s, mask_s, n=n, tc=tc, cap_e=cells.shape[0])
    return out[:7]


@functools.partial(jax.jit, static_argnames=("tb",))
def _gather_event_batches(cell_e, w_e, hi_e, mask_e, cnt_e, starts, ends, *,
                          tb: int):
    """Batch materialization for the 5 event arrays (inert pads)."""
    local, wvals = _gather_batches(cell_e, w_e, starts, ends, tb=tb)
    nvalid = mask_e.shape[0]
    idx = starts[:, None] + jnp.arange(tb, dtype=jnp.int32)[None, :]
    in_range = idx < ends[:, None]
    idx_c = jnp.clip(idx, 0, max(nvalid - 1, 0))
    his = jnp.where(in_range, hi_e[idx_c], 0)
    masks = jnp.where(in_range, mask_e[idx_c], jnp.uint32(0))
    cnts = jnp.where(in_range, cnt_e[idx_c], 0)
    return (local, wvals, his.astype(jnp.int32), masks.astype(jnp.int32),
            cnts.astype(jnp.int32))


class WordEventVoxPlan:
    """Word-event batch layout for one (mesh, grid) pair.

    Same contract as `vox_pallas.PallasVoxPlan` (host round-trip limited
    to the (num_tiles+1) bounds array), but batches hold pre-reduced
    (cell, word) events instead of raw fragments; wins from 2048^3 up
    where per-fragment full-width fills dominate the suffix kernel."""

    def __init__(self, mesh: Mesh, spec: GridSpec,
                 frag_plan: FragmentPlan | None = None, fragments=None,
                 tc: int = TILE_CELLS, tb_sub: int = TB_SUB):
        n = spec.n
        if n % WORD_BITS != 0:
            raise ValueError("pallas vox requires N % 32 == 0")
        if n > 4096:
            raise ValueError(
                f"word-event path caps at N = 4096 (got {n}): the packed "
                "uint32 sort key cell * num_words + word reaches 2^32 "
                "near N = 5184 and would silently alias")
        if tc <= 0 or (n * n) % tc != 0:
            raise ValueError(f"tc={tc} must divide N^2={n * n}")
        tb = tb_sub * TB_LANE
        self.spec = spec
        self.tc = tc
        self.tb_sub = tb_sub
        self.num_words = n // WORD_BITS
        num_tiles = (n * n) // tc
        self.num_tiles = num_tiles
        self.group = _group_factor(self.num_words, num_tiles)
        self.num_super = num_tiles // self.group

        if fragments is None:
            if frag_plan is None:
                frag_plan = FragmentPlan(mesh, spec)
            fragments = fragments_from_plan(frag_plan)
        cells, xs = (jnp.asarray(a) for a in fragments)
        local_e, w_e, hi_e, mask_e, cnt_e, bounds_d, n_ev = _build_events(
            cells, xs, n=n, tc=tc
        )
        # Tiny D2H: the (num_super + 1) bounds + one scalar.
        bounds = np.asarray(bounds_d)
        self.num_events = int(np.asarray(n_ev))
        self.num_fragments = int(cells.shape[0])

        batch_tiles, starts_h, flags, ends_h, tile_mask, _ = tile_batches(
            bounds, tb
        )
        bcount = len(batch_tiles)
        starts = jnp.asarray(starts_h.astype(np.int32))
        ends = jnp.asarray(ends_h.astype(np.int32))
        cap = min(local_e.shape[0], bcount * tb)  # see fused-path note
        cells_b, w_b, hi_b, mask_b, cnt_b = _gather_event_batches(
            local_e[:cap], w_e[:cap], hi_e[:cap], mask_e[:cap],
            cnt_e[:cap], starts, ends, tb=tb
        )
        self.cells = cells_b.reshape(bcount, tb_sub, TB_LANE)
        self.ws = w_b.reshape(bcount, tb_sub, TB_LANE)
        self.his = hi_b.reshape(bcount, tb_sub, TB_LANE)
        self.masks = mask_b.reshape(bcount, tb_sub, TB_LANE)
        self.cnts = cnt_b.reshape(bcount, tb_sub, TB_LANE)
        self.batch_tile = jnp.asarray(batch_tiles, jnp.int32)
        self.flags = jnp.asarray(flags, jnp.int32)
        self.tile_mask = jnp.asarray(tile_mask)  # per SUPERTILE
        self.num_batches = bcount


@functools.partial(jax.jit,
                   static_argnames=("n", "num_tiles", "tc", "tb_sub"))
def _we_words(cells, ws, his, masks, cnts, batch_tile, flags, tile_mask, *,
              n: int, num_tiles: int, tc: int, tb_sub: int):
    del tile_mask  # zero-init alias: unvisited supertiles are already 0
    num_words = n // WORD_BITS
    words = _run_we(cells, ws, his, masks, cnts, batch_tile, flags,
                    num_words=num_words, num_tiles=num_tiles, tc=tc,
                    tb_sub=tb_sub)
    g = _group_factor(num_words, num_tiles)
    if g > 1:
        # Unpack the lane panel: (S, tc, g, nw) -> sub-tiles are
        # consecutive cell runs, so reorder to (S, g, tc, nw).
        words = words.reshape(-1, tc, g, num_words).transpose(0, 2, 1, 3)
    return words.reshape(n, n, num_words)


# ---------------------------------------------------------------------------
# Fused device-side total pipeline (round 3)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_super", "tb", "b_max"))
def _device_batches(bounds, *, num_super: int, tb: int, b_max: int):
    """Batch layout ON DEVICE: replaces the `tile_batches` host loop (and
    its bounds D2H round trip) with a static-capacity searchsorted
    layout. Batch i belongs to the supertile whose cumulative-batch
    range contains i. Spares beyond the true batch count REVISIT the
    last real batch's supertile with flags = 0: no acc reset, no write,
    and the output block index never changes after the real LAST batch,
    so the end-of-grid flush re-emits that block's already-written VMEM
    verbatim. (A dedicated dummy output block would work too, but the
    extra block forces an out[:num_super] slice after the kernel, which
    XLA materializes as a second full-grid buffer — at 4096^3 that is
    8 GiB of copy the zero-init output alias exists to avoid.)
    Returns (batch_tile, flags, starts, ends, overflow); `overflow` > 0
    means b_max was too small and the result is missing that many
    batches (callers must check and rebuild with more slack).
    """
    counts = jnp.diff(bounds)
    nb = -((-counts) // tb)  # ceil(counts / tb); 0 for empty supertiles
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nb, dtype=jnp.int32)])
    total = cum[-1]
    bi = jnp.arange(b_max, dtype=jnp.int32)
    t = jnp.clip(
        jnp.searchsorted(cum, bi, side="right").astype(jnp.int32) - 1,
        0, num_super - 1)
    j = bi - cum[t]
    valid = bi < total
    starts = jnp.where(valid, bounds[t] + j * tb, 0)
    ends = jnp.where(valid, jnp.minimum(starts + tb, bounds[t + 1]), 0)
    flags = (jnp.where(j == 0, FLAG_FIRST, 0)
             | jnp.where(j == nb[t] - 1, FLAG_LAST, 0))
    flags = jnp.where(valid, flags, 0)
    # total == 0 (empty mesh): every batch is a no-write spare on block
    # 0 and the zero-initialized output stays all-zeros — correct.
    last_tile = t[jnp.clip(total - 1, 0, b_max - 1)]
    batch_tile = jnp.where(valid, t, last_tile)
    overflow = jnp.maximum(total - b_max, 0)
    return batch_tile, flags, starts, ends, overflow


@functools.partial(
    jax.jit, static_argnames=("n", "tc", "tb_sub", "b_max", "cap_f"))
def _device_words_from_fragments(cells, xs, *, n: int, tc: int, tb_sub: int,
                                 b_max: int, cap_f: int):
    """Fragments -> packed words, entirely on device (single trace).

    `cap_f` is the static post-compaction fragment capacity (multiple of
    16; sized at pipeline init from the real valid count): the global
    (cell, word) sort and everything after it run at cap_f, not at the
    raw candidate count — the ~24x valid-fraction win (see
    `_block_compact`). The returned overflow scalar is nonzero if ANY
    static capacity (fragments, events, batches) truncated real work.
    """
    num_words = n // WORD_BITS
    num_tiles = (n * n) // tc
    g = _group_factor(num_words, num_tiles)
    num_super = num_tiles // g
    tb = tb_sub * TB_LANE
    ckey_s, mask_s, ovf_f = _sorted_keys_from_fragments(
        cells, xs, n=n, cap_f=cap_f)
    cap_e = min(b_max * tb, cap_f)
    (local_e, w_e, hi_e, mask_e, cnt_e, bounds, _num_events,
     ovf_e) = _events_core(ckey_s, mask_s, n=n, tc=tc, cap_e=cap_e)
    batch_tile, flags, starts, ends, ovf_b = _device_batches(
        bounds, num_super=num_super, tb=tb, b_max=b_max)
    cb, wb, hb, mb, ctb = _gather_event_batches(
        local_e, w_e, hi_e, mask_e, cnt_e, starts, ends, tb=tb)
    shape3 = (b_max, tb_sub, TB_LANE)
    words = _run_we(
        cb.reshape(shape3), wb.reshape(shape3), hb.reshape(shape3),
        mb.reshape(shape3), ctb.reshape(shape3), batch_tile, flags,
        num_words=num_words, num_tiles=num_tiles, tc=tc, tb_sub=tb_sub)
    if g > 1:
        words = words.reshape(-1, tc, g, num_words).transpose(0, 2, 1, 3)
    overflow = ovf_f + ovf_e + ovf_b
    return words.reshape(n, n, num_words), overflow


@functools.partial(
    jax.jit,
    static_argnames=("windows", "n", "tc", "tb_sub", "b_max", "cap_f"))
def _total_jit(bucket_arrays, origin, voxel_size, *, windows, n: int,
               tc: int, tb_sub: int, b_max: int, cap_f: int):
    all_cells, all_xs = [], []
    for window, (v0, v1, v2, sy, sz) in zip(windows, bucket_arrays):
        c, x = _emit(v0, v1, v2, sy, sz, window=window, n=n,
                     origin=origin, voxel_size=voxel_size)
        all_cells.append(c)
        all_xs.append(x)
    if not all_cells:  # empty mesh: one sentinel fragment
        all_cells = [jnp.full((1,), n * n, jnp.int32)]
        all_xs = [jnp.zeros((1,), jnp.int32)]
    cells = jnp.concatenate(all_cells)
    xs = jnp.concatenate(all_xs)
    return _device_words_from_fragments(cells, xs, n=n, tc=tc,
                                        tb_sub=tb_sub, b_max=b_max,
                                        cap_f=cap_f)


@functools.partial(jax.jit, static_argnames=("n",))
def _compact_stats(cells, *, n: int):
    """(valid fragment count, compaction row count) for capacity sizing."""
    f = cells.shape[0]
    fp = -(-f // _BLOCK) * _BLOCK
    valid = cells < n * n
    if fp != f:
        valid = jnp.concatenate([valid, jnp.zeros((fp - f,), bool)])
    counts = jnp.sum(valid.reshape(-1, _BLOCK), axis=1, dtype=jnp.int32)
    rows = jnp.sum(-((-counts) // _ROW), dtype=jnp.int32)
    return jnp.sum(counts, dtype=jnp.int32), rows


def _emit(*args, **kw):
    from voxtpu.ops.vox import emit_fragments

    return emit_fragments(*args, **kw)


class DeviceVoxPipeline:
    """Whole-pipeline voxelizer: ONE jit dispatch from triangle coords to
    the packed grid, nothing host-side per call.

    This is the quantity the reference's headline CSV rows time: its
    `VOX::Compute<TILED>` scope rebuilds the tile work queue, sorts it,
    and runs the kernel per call (`vox/tiled.cu:489-576`). Here the
    per-call work is fragment emission (rasterization), the word-event
    reduction (sorts + scan), the device-side batch layout, and the MXU
    kernel — recomputed from `coords` every call, so vertex positions
    may change freely (the fit loop's hard-vox analog).

    Static pieces built once at init: triangle buckets (window-size
    classes; topology-dependent) and the batch CAPACITY `b_max` (the
    Pallas grid is static under jit). `__call__` returns the grid plus
    an `overflow` scalar — nonzero means the capacity was exceeded
    (coords drifted far; rebuild the pipeline), and the result is
    incomplete.
    """

    def __init__(self, mesh: Mesh, spec: GridSpec, tc: int = TILE_CELLS,
                 tb_sub: int = TB_SUB, slack: float = 1.0):
        n = spec.n
        if n % WORD_BITS != 0:
            raise ValueError("pallas vox requires N % 32 == 0")
        if n > 4096:
            raise ValueError(
                f"word-event path caps at N = 4096 (got {n}); see "
                "WordEventVoxPlan")
        self.spec = spec
        self.tc = tc
        self.tb_sub = tb_sub
        frag_plan = FragmentPlan(mesh, spec)
        self.windows = tuple(b[0] for b in frag_plan.buckets)
        self.bucket_arrays = tuple(
            tuple(b[i] for i in range(1, 6)) for b in frag_plan.buckets)
        # Size the static batch capacity from the real event layout
        # (exact for fixed coords; `slack` headroom for moving ones).
        # ONE fragment emission serves both the probe and the
        # compaction stats — each full rasterization is a multi-million
        # candidate dispatch.
        frags = fragments_from_plan(frag_plan)
        probe = WordEventVoxPlan(mesh, spec, frag_plan=frag_plan,
                                 fragments=frags, tc=tc, tb_sub=tb_sub)
        self.b_max = max(int(np.ceil(probe.num_batches * slack)), 1)
        self.num_events = probe.num_events
        self.num_fragments = probe.num_fragments
        # Post-compaction fragment capacity (1/8-octave granular so
        # refresh loops reuse compiled shapes; floor keeps tiny meshes'
        # shapes valid).
        nvalid, rows = _compact_stats(frags[0], n=n)
        self.num_valid = int(nvalid)
        from voxtpu.ops.vox import _pad_granular
        self.cap_f = max(
            _pad_granular(int(np.ceil(int(rows) * slack)) * _ROW), 256)
        self.num_batches = probe.num_batches

    def words(self, coords=None):
        """Packed words + overflow scalar (both device arrays).

        `coords` replaces every bucket's vertex rows when given — pass
        the full (V, 3) array; buckets index it statically at trace time
        via their original vertex gathers is NOT supported (buckets
        carry materialized vertex triples), so `coords` must be None for
        now and motion goes through rebuilding. Kept explicit to make
        the contract obvious.
        """
        if coords is not None:
            raise NotImplementedError(
                "per-call coords need index-carrying buckets; rebuild the "
                "pipeline on vertex motion instead")
        origin = jnp.asarray(self.spec.origin, jnp.float32)
        vs = jnp.float32(self.spec.voxel_size)
        return _total_jit(self.bucket_arrays, origin, vs,
                          windows=self.windows, n=self.spec.n, tc=self.tc,
                          tb_sub=self.tb_sub, b_max=self.b_max,
                          cap_f=self.cap_f)

    def __call__(self) -> VoxelGrid:
        words, overflow = self.words()
        if int(overflow) != 0:
            raise RuntimeError(
                f"batch capacity exceeded by {int(overflow)}; rebuild the "
                "pipeline (coords drifted) or raise slack")
        return VoxelGrid(
            words=words,
            origin=jnp.asarray(self.spec.origin, jnp.float32),
            voxel_size=jnp.float32(self.spec.voxel_size),
        )


def voxelize_pallas_we(mesh: Mesh, spec: GridSpec,
                       plan: "WordEventVoxPlan | FragmentPlan | None" = None
                       ) -> VoxelGrid:
    """Solid voxelization via the word-event Pallas kernel."""
    if plan is None or isinstance(plan, FragmentPlan):
        plan = WordEventVoxPlan(mesh, spec, frag_plan=plan)
    words = _we_words(
        plan.cells, plan.ws, plan.his, plan.masks, plan.cnts,
        plan.batch_tile, plan.flags, plan.tile_mask,
        n=spec.n, num_tiles=plan.num_tiles, tc=plan.tc, tb_sub=plan.tb_sub,
    )
    return VoxelGrid(
        words=words,
        origin=jnp.asarray(spec.origin, jnp.float32),
        voxel_size=jnp.float32(spec.voxel_size),
    )
