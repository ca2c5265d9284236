"""Banded static-slot voxelizer — the large-N total path.

`SlotVoxPipeline` (`vox_slots.py`) wins the end-to-end total up to
1024^3, but at 2048^3 its whole-axis suffix fill loses the reference's
compute-only row 0.48x (round-4 battery): every 512-fragment batch pays
a (TC, TB) @ (TB, N) fill spanning 16 output panels plus an end-of-tile
bit-pack over all N columns, while most batches' fragments enter within
a ~100-column x-band.

This pipeline adds the missing static structure: a candidate cell's
x-entry is ONE point — the plane intersection at that cell's center
(`vox/sequential.cpp:40-60`) — which the host evaluates in f64 at init
and widens by the f32 evaluation-error bound, giving each candidate a
window a few cells wide regardless of the triangle's x extent
(round 5; round 4 used per-triangle x-bbox windows, which forced
band >= extent + alignment and routed big triangles wide). Slots sort
by (YZ tile, window start), greedy cuts pack up to TB consecutive
slots whose windows share one 32-aligned base, and each batch fills
only a BAND-column window:

- Per batch the kernel builds bit-granularity parity counts over BAND
  columns (the usual one-hot x fill matmuls, K = TB, N = BAND), packs
  them into BAND/32 words with two exact bf16 matmuls whose target
  lanes come from the batch's prefetched (sub-tile, base) scalars — no
  static branching — and XORs the packed words into a word-granularity
  VMEM accumulator. Parity is additive mod 2, so per-batch packing
  composes by XOR; no event uniqueness (and hence no per-call sort) is
  needed anywhere.
- The fill through the band's end is a per-cell parity carry (the
  accumulator's last band column counts every fragment of the cell),
  applied as one masked XOR over the suffix word lanes.
- Output blocks are WE-style supertiles (G = 128/(N/32) consecutive
  tiles per 128-lane panel, `vox_pallas_we.py` round-3 lane packing)
  with the zero-init output alias, so no tile-mask or slice pass
  follows the kernel.

Candidates whose error-widened window cannot fit a band from its
32-aligned base — 2 x ceil(err) + 1 + alignment wider than BAND, which
in practice means x-degenerate planes (normal_x ~ 0, unbounded error)
— are routed to a whole-axis fallback on the plain suffix kernel
writing a COMPACT per-touched-tile buffer that is XOR-scattered into
the banded grid (never a second full grid; for typical surface meshes
the wide set is empty and the pass is skipped statically).

Same bit-parity contract as `SlotVoxPipeline`: the emit arithmetic is
`emit_fragments` verbatim, parity addition is exact, and the pack
weights are powers of two (exact in bf16), so the packed grid matches
the event pipeline bit for bit; `bench.py` xor-verifies the pipelines
on device. Per-call out-of-band fragments (coords drifted past the
baked windows) are dropped and counted in the returned `overflow`
scalar — nonzero means rebuild.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voxtpu.grids.voxel_grid import WORD_BITS, GridSpec, VoxelGrid
from voxtpu.mesh.mesh import Mesh
from voxtpu.ops.vox_pallas import (FLAG_FIRST, FLAG_LAST, TB_LANE, TB_SUB,
                                   TILE_CELLS, _run_pallas, tile_batches)
from voxtpu.ops.vox_pallas_we import _group_factor
from voxtpu.ops.vox_slots import (_batch_index, _exact_candidates,
                                  _slot_emit, _slot_rows)

# Fill window columns (multiple of 32; >= 32 + 2*ceil(err) + 1). With
# per-candidate windows the floor is set by 32-alignment + the error
# margin, not triangle extents; sweep 64-256 on hardware per N.
BAND = 256


def _pack_tables(nw: int, wpad: int, band: int):
    """Pack-weight tables, one (band, wpad) panel per lane offset.

    Table o packs band bit-columns into words at lanes [o, o + band/32):
    weight[o, r, l] = 2^(r % 32 half) iff l == o + r // 32 — powers of
    two < 2^16, exact in bf16 with exact f32 sums. The kernel fetches
    each batch's panel by block index (one 64 KB DMA) instead of
    building it from iotas per batch (~0.1 us of VPU per batch)."""
    bwords = band // WORD_BITS
    offs = wpad - bwords + 1
    o = np.arange(offs)[:, None, None]
    r = np.arange(band)[None, :, None]
    lane = np.arange(wpad)[None, None, :]
    sel = (lane - (r >> 5)) == o
    bitpos = r & 31
    lo = np.where(sel & (bitpos < 16),
                  (1 << np.minimum(bitpos, 15)).astype(np.float32), 0.0)
    hi = np.where(sel & (bitpos >= 16),
                  (1 << np.maximum(bitpos - 16, 0)).astype(np.float32), 0.0)
    return (jnp.asarray(lo, jnp.bfloat16), jnp.asarray(hi, jnp.bfloat16))


def _off_at(off_ref, i):
    """Per-batch word-lane offset, unpacked from the byte-packed scalar
    array. off < wpad <= 128 fits a byte, and four per int32 word keeps
    the prefetch arrays inside the 1 MB SMEM at large batch counts (the
    4096^3 layout's 232K batches overflowed it as plain int32 —
    round-5 battery; same failure class as the round-4 four-array
    overflow at ~70K)."""
    return (off_ref[i >> 2] >> (8 * (i & 3))) & 0xFF


def _pack_off(off: np.ndarray) -> np.ndarray:
    """Little-endian byte-pack of per-batch offsets into int32 words."""
    assert off.min(initial=0) >= 0 and off.max(initial=0) < 256
    pad = (-len(off)) % 4
    b = np.concatenate([off, np.zeros(pad, off.dtype)]).astype(np.uint32)
    b = b.reshape(-1, 4)
    packed = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    return packed.view(np.int32)


def _banded_kernel(nw: int, wpad: int, tc: int, tb_sub: int, band: int,
                   pack: int):
    from jax.experimental import pallas as pl

    bwords = band // WORD_BITS

    def kernel(sf_ref, off_ref, cell_ref, x_ref, *rest):
        w_refs = rest[:2 * pack]
        out_ref, acc = rest[2 * pack + 1], rest[2 * pack + 2]
        b = pl.program_id(0)
        flags = sf_ref[b] & 3

        @pl.when((flags & FLAG_FIRST) != 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, TB_LANE), 0)
        band_iota = jax.lax.broadcasted_iota(jnp.int32, (band, TB_LANE), 0)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (tc, wpad), 1)
        for j in range(pack):
            off = _off_at(off_ref, b * pack + j)
            base = (off % nw) * WORD_BITS

            # Bit-granularity parity counts over the band: one-hot cell
            # rows x suffix fill columns, int8 on the MXU (0/1-exact).
            accb = jnp.zeros((tc, band), jnp.int32)
            for s in range(tb_sub):
                cells_s = cell_ref[0, j * tb_sub + s, :]  # -1 inert
                xl_s = x_ref[0, j * tb_sub + s, :] - base
                onehot = (cell_iota == cells_s[None, :]).astype(jnp.int8)
                fill = (band_iota >= xl_s[None, :]).astype(jnp.int8)
                accb += jax.lax.dot_general(
                    onehot, fill,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            # Every live fragment fills through the band's last column,
            # so that count column is the per-cell carry.
            carry = accb[:, band - 1:band]

            # Pack band bits into words at lanes [off, off + bwords)
            # with the batch's prefetched weight panels.
            bits = (accb & 1).astype(jnp.float32).astype(jnp.bfloat16)
            lo = jnp.dot(bits, w_refs[2 * j][0],
                         preferred_element_type=jnp.float32)
            hi = jnp.dot(bits, w_refs[2 * j + 1][0],
                         preferred_element_type=jnp.float32)
            words = lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)

            # Odd per-cell carry flips every word of the sub-tile past
            # the band; band and suffix lanes are disjoint, other
            # sub-tiles' lanes XOR with zero.
            m = (lane2 >= off + bwords) & (lane2 < (off // nw + 1) * nw)
            acc[:] = acc[:] ^ (words ^ jnp.where(m, -(carry & 1), 0))

        @pl.when((flags & FLAG_LAST) != 0)
        def _():
            out_ref[0] = acc[:].astype(jnp.uint32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "num_tiles", "tc", "tb_sub", "band", "pack"))
def _run_banded(local_cells, xs, step_sf, off, *, n: int, num_tiles: int,
                tc: int, tb_sub: int, band: int, pack: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tb = tb_sub * TB_LANE
    nw = n // WORD_BITS
    g = _group_factor(nw, num_tiles)
    num_super = num_tiles // g
    wpad = max(g * nw, TB_LANE)
    num_batches = local_cells.shape[0]
    assert num_batches % pack == 0, "layout pads each supertile to pack"
    steps = num_batches // pack
    loc3 = local_cells.reshape(steps, pack * tb_sub, TB_LANE)
    xs3 = xs.reshape(steps, pack * tb_sub, TB_LANE)
    wlo, whi = _pack_tables(nw, wpad, band)
    spec3 = pl.BlockSpec((1, pack * tb_sub, TB_LANE), lambda b, *_: (b, 0, 0))

    def wmap(j):
        return lambda b, sf, off: (_off_at(off, b * pack + j), 0, 0)

    wspecs = []
    for j in range(pack):
        wspecs += [pl.BlockSpec((1, band, wpad), wmap(j))] * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # step (super << 2 | flags), per-batch off
        grid=(steps,),
        in_specs=[spec3, spec3, *wspecs,
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec(
            (1, tc, wpad), lambda b, sf, off: (sf[b] >> 2, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((tc, wpad), jnp.int32)],
    )
    # fill matmuls + the two pack matmuls
    flops = num_batches * 2 * tb * tc * (band + wpad)
    init = jnp.zeros((num_super, tc, wpad), jnp.uint32)
    out = pl.pallas_call(
        _banded_kernel(nw, wpad, tc, tb_sub, band, pack),
        out_shape=jax.ShapeDtypeStruct((num_super, tc, wpad), jnp.uint32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=num_batches * tb * 8,
            transcendentals=0,
        ),
        input_output_aliases={4 + 2 * pack: 0},
        interpret=jax.default_backend() != "tpu",
    )(step_sf, off, loc3, xs3, *([wlo, whi] * pack), init)
    if g > 1 or wpad != nw:
        out = out[:, :, :g * nw]
        # Sub-tiles are consecutive cell runs: (S, tc, g, nw) -> (S, g,
        # tc, nw) (the `_we_words` supertile unpack).
        out = out.reshape(num_super, tc, g, nw).transpose(0, 2, 1, 3)
    return out.reshape(n, n, nw)


@functools.partial(jax.jit, static_argnames=("n", "num_tiles", "tc",
                                             "tb_sub", "band", "pack"))
def _banded_total(rows, local, batch_tile, step_sf, off, batch_basew,
                  wide, origin, vs, *, n: int, num_tiles: int,
                  tc: int, tb_sub: int, band: int, pack: int):
    xs, local_k = _slot_emit(rows, local, batch_tile, origin, vs, n=n, tc=tc)
    base = batch_basew[:, None, None] * WORD_BITS
    inband = (xs >= base) & (xs < base + band)
    overflow = jnp.sum((local_k >= 0) & ~inband)
    local_k = jnp.where(inband, local_k, -1)
    words = _run_banded(local_k, xs, step_sf, off, n=n,
                        num_tiles=num_tiles, tc=tc, tb_sub=tb_sub,
                        band=band, pack=pack)
    if wide is not None:
        # COMPACT wide output: the fallback touches few tiles, and a
        # full-grid second buffer would double HBM (8.6 GB at 4096^3).
        # Batches write renumbered tile blocks (k of them); the merge
        # gathers those k rows of the banded grid, XORs, and scatters
        # back (XLA aliases the scatter in place — the grid is a fresh
        # intermediate with no other consumer).
        (w_rows, w_local, w_rtile, w_ctile, w_flags, w_xseg,
         w_uidx) = wide
        w_xs, w_k = _slot_emit(w_rows, w_local, w_rtile, origin, vs,
                               n=n, tc=tc)
        w_words = _run_pallas(w_k, w_xs, w_ctile, w_flags, w_xseg,
                              n=n, num_tiles=w_uidx.shape[0], tc=tc,
                              tb_sub=tb_sub, seg=None)
        nw = n // WORD_BITS
        wt = words.reshape(num_tiles, tc, nw)
        wt = wt.at[w_uidx].set(wt[w_uidx] ^ w_words)
        words = wt.reshape(n, n, nw)
    return words, overflow


def _candidate_x_windows(tri, cell, v0, v1, v2, spec: GridSpec):
    """PER-CANDIDATE x-entry cell windows [xlo, xhi] (inclusive).

    The entry `x = int((intersection - ox)/vs)` is a single point per
    candidate cell, not a triangle-bbox range: the host evaluates each
    candidate's plane intersection in f64 and widens it by
    max(1, ceil(err)) cells, err the per-triangle f32 evaluation error
    bound — in f32 `(D - B*cy - C*cz)/A` errs by
    ~eps * (|D| + |B cy| + |C cz|)/|A| cells (4x safety applied), which
    also covers the f32-rounded cell centers (the |B cy| + |C cz| terms
    bound exactly that contribution).

    Per-candidate windows beat the round-4 per-triangle x-bbox windows
    two ways: window width is O(err) instead of O(triangle x extent),
    so band shrinks toward the 32-alignment floor and huge triangles
    stop straddling bands (fill/pack/operand cost all scale with band);
    and err no longer routes anything wide by itself — only
    x-degenerate planes (A = normal_x ~ 0, err ~ n) fail the fits test.
    NaN/inf intersections (A == 0) get err = inf -> a full-width window
    -> wide; their fragments are invalid at emit either way."""
    n = spec.n
    ox = np.float64(spec.origin[0])
    oy = np.float64(spec.origin[1])
    oz = np.float64(spec.origin[2])
    vs = np.float64(spec.voxel_size)
    f0, f1, f2 = (np.asarray(v, np.float64) for v in (v0, v1, v2))
    u = f1 - f0
    t = f2 - f0
    A = u[:, 1] * t[:, 2] - u[:, 2] * t[:, 1]
    B = u[:, 2] * t[:, 0] - u[:, 0] * t[:, 2]
    C = u[:, 0] * t[:, 1] - u[:, 1] * t[:, 0]
    D = A * f0[:, 0] + B * f0[:, 1] + C * f0[:, 2]
    cyb = max(abs(oy), abs(oy + n * vs))
    czb = max(abs(oz), abs(oz + n * vs))
    num = np.abs(D) + np.abs(B) * cyb + np.abs(C) * czb
    # 4x safety over f32 eps; A == 0 -> inf (wide; invalid at emit).
    with np.errstate(divide="ignore", invalid="ignore"):
        err_cells = np.where(
            A == 0.0, np.inf,
            8e-7 * num / np.maximum(np.abs(A), 1e-300) / vs)
    margin = np.maximum(
        1, np.ceil(np.minimum(err_cells, n)).astype(np.int64))

    ys = (cell % n).astype(np.float64)
    zs = (cell // n).astype(np.float64)
    cy = oy + (ys * vs + vs / 2)
    cz = oz + (zs * vs + vs / 2)
    At, Bt, Ct, Dt = A[tri], B[tri], C[tri], D[tri]
    with np.errstate(divide="ignore", invalid="ignore"):
        xf = ((Dt - Bt * cy - Ct * cz) / At - ox) / vs
    xcell = np.where(np.isfinite(xf),
                     np.floor(np.clip(xf, -1.0, float(n))), 0.0)
    xcell = xcell.astype(np.int64)
    mt = margin[tri]
    xlo = np.clip(xcell - mt, 0, n - 1)
    xhi = np.clip(xcell + mt, 0, n - 1)
    return xlo, xhi


class BandedSlotVoxPipeline:
    """Whole-pipeline voxelizer with a static (tile, x-panel) slot
    layout: per-call = elementwise pre-pass + the banded suffix kernel.

    The large-N counterpart of `SlotVoxPipeline` (same per-call contract
    and capacity story; compare against the reference's per-call total,
    `vox/tiled.cu:489-576`): per-batch MXU work is O(TB x TC x BAND)
    instead of O(TB x TC x N), so per-fragment cost stays constant as
    the grid grows — the property the reference's 4x4-tile work queue
    has and the whole-axis fill lacks. `overflow` > 0 from a call means
    fragments left their baked bands (vertex drift); rebuild."""

    def __init__(self, mesh: Mesh, spec: GridSpec, tc: int = TILE_CELLS,
                 tb_sub: int = TB_SUB, band: int = BAND, pack: int = 2):
        n = spec.n
        if n % WORD_BITS != 0:
            raise ValueError("pallas vox requires N % 32 == 0")
        if tc <= 0 or (n * n) % tc != 0:
            raise ValueError(f"tc={tc} must divide N^2={n * n}")
        band = min(band, n)
        if band % WORD_BITS != 0:
            raise ValueError(f"band={band} must be a multiple of 32")
        if pack < 1:
            raise ValueError(f"pack={pack} must be >= 1")
        tb = tb_sub * TB_LANE
        self.spec = spec
        self.tc = tc
        self.tb_sub = tb_sub
        self.band = band
        self.pack = pack
        nw = n // WORD_BITS
        num_tiles = (n * n) // tc
        self.num_tiles = num_tiles
        g = _group_factor(nw, num_tiles)
        self.group = g
        self.num_super = num_tiles // g

        tri, cell, v0, v1, v2 = _exact_candidates(mesh, spec)
        self.num_candidates = cell.shape[0]
        xlo_c, xhi_c = _candidate_x_windows(tri, cell, v0, v1, v2, spec)
        # The greedy batch layout below starts every band at the batch's
        # first slot's 32-ALIGNED window base, so a candidate is narrow
        # iff its (error-widened) window fits a band from that base.
        # Per-candidate windows (round 5) are O(err) wide regardless of
        # the triangle's x extent, so only x-degenerate planes
        # (err ~ n) route wide.
        base_c = np.minimum((xlo_c // WORD_BITS) * WORD_BITS, n - band)
        narrow = xhi_c < base_c + band
        c_n, t_n = cell[narrow], tri[narrow]
        c_w, t_w = cell[~narrow], tri[~narrow]
        self.num_wide = c_w.shape[0]

        # --- narrow layout: slots sorted by (tile, window start), then
        # greedy slot-level batch cuts: a batch takes up to tb
        # consecutive slots whose windows fit one band from the first
        # slot's 32-aligned base, cutting early at the first violator.
        # (Round-4 iteration: (tile, x-panel) grouping plus group-level
        # merging left 1.5-1.8x batch padding from per-group
        # remainders; slot-level cuts only pay a remainder per tile
        # plus one per genuine span break.)
        xlo_n, xhi_n = xlo_c[narrow], xhi_c[narrow]
        order = np.lexsort((xlo_n, c_n // tc)) if len(t_n) else \
            np.zeros((0,), np.int64)
        c_n, t_n = c_n[order], t_n[order]
        local_n = (c_n % tc).astype(np.int32)
        xlo_s = xlo_n[order]
        xhi_s = xhi_n[order]
        tile_s = (c_n // tc).astype(np.int64)
        tbounds = np.searchsorted(tile_s,
                                  np.arange(num_tiles + 1, dtype=np.int64))
        batch_tile, batch_base, starts, ends = [], [], [], []
        for t in np.nonzero(np.diff(tbounds))[0]:
            i, b1 = int(tbounds[t]), int(tbounds[t + 1])
            while i < b1:
                base = min((int(xlo_s[i]) // WORD_BITS) * WORD_BITS,
                           n - band)
                w_end = min(i + tb, b1)
                viol = xhi_s[i:w_end] >= base + band
                k0 = i + int(np.argmax(viol)) if viol.any() else w_end
                batch_tile.append(int(t))
                batch_base.append(base)
                starts.append(i)
                ends.append(k0)
                i = k0
        if not batch_tile:  # empty narrow set: one inert batch on tile 0
            batch_tile, batch_base, starts, ends = [0], [0], [0], [0]

        # Pad every supertile's batch run to a multiple of `pack` with
        # inert batches (start == end -> all pad slots), then pair each
        # grid step with `pack` consecutive batches of one supertile —
        # per-step machinery and iotas amortize across the pack, which
        # is the measured fixed-cost floor (BENCH_NOTES round 4).
        nw = n // WORD_BITS
        bt2, bb2, st2, en2 = [], [], [], []
        i = 0
        while i < len(batch_tile):
            j = i
            while j < len(batch_tile) and batch_tile[j] // g == \
                    batch_tile[i] // g:
                j += 1
            bt2 += batch_tile[i:j]
            bb2 += batch_base[i:j]
            st2 += starts[i:j]
            en2 += ends[i:j]
            for _ in range((-(j - i)) % pack):
                bt2.append(batch_tile[j - 1])
                bb2.append(batch_base[j - 1])
                st2.append(0)
                en2.append(0)
            i = j
        batch_tile = np.asarray(bt2, np.int64)
        batch_base = np.asarray(bb2, np.int64)
        starts = np.asarray(st2, np.int64)
        ends = np.asarray(en2, np.int64)
        bcount = len(batch_tile)
        local_b = _batch_index(starts, ends, local_n, tb, -1)
        tri_b = _batch_index(starts, ends, t_n, tb, 0)
        self.num_batches = bcount
        self.num_slots = bcount * tb

        # FIRST/LAST at SUPERTILE granularity (the accumulator spans a
        # whole output panel of g sub-tiles), rolled up per STEP and
        # packed with the supertile id into one prefetch scalar — four
        # separate (B,) SMEM arrays overflowed the 1 MB scalar memory
        # at ~70K batches.
        batch_super = (batch_tile // g).astype(np.int64)
        super_s = batch_super[::pack]
        nsteps = len(super_s)
        first = np.empty(nsteps, bool)
        first[0] = True
        first[1:] = super_s[1:] != super_s[:-1]
        last = np.empty(nsteps, bool)
        last[-1] = True
        last[:-1] = super_s[:-1] != super_s[1:]
        flags = (first * FLAG_FIRST + last * FLAG_LAST).astype(np.int64)

        self.rows, self.local = _slot_rows(tri_b, local_b, v0, v1, v2,
                                           tb_sub)
        self.batch_tile = jnp.asarray(batch_tile.astype(np.int32))
        self.step_sf = jnp.asarray(
            ((super_s << 2) | flags).astype(np.int32))
        self.off = jnp.asarray(_pack_off(
            ((batch_tile % g) * nw + batch_base // WORD_BITS)
            .astype(np.int32)))
        self.batch_basew = jnp.asarray(
            (batch_base // WORD_BITS).astype(np.int32))

        # --- wide fallback: whole-axis batches on the plain suffix
        # kernel (empty for typical surface meshes -> skipped in jit).
        if self.num_wide:
            # Whole-axis batches over a COMPACT tile set: the wide
            # candidates touch k << num_tiles tiles, so the fallback
            # kernel writes a (k, tc, nw) buffer that the call XOR-
            # scatters into the banded grid — never a second full grid
            # (8.6 GB at 4096^3, where x-degenerate triangles keep the
            # wide set nonempty).
            orderw = np.argsort(c_w // tc, kind="stable")
            c_w, t_w = c_w[orderw], t_w[orderw]
            local_w = (c_w % tc).astype(np.int32)
            tiles_w = c_w // tc
            uidx = np.unique(tiles_w)
            k = len(uidx)
            compact_w = np.searchsorted(uidx, tiles_w)
            bw = np.searchsorted(compact_w,
                                 np.arange(k + 1, dtype=np.int64))
            w_ctiles, w_starts, w_flags, w_ends, _wm, _ = tile_batches(
                bw, tb)
            w_local_b = _batch_index(w_starts, w_ends, local_w, tb, -1)
            w_tri_b = _batch_index(w_starts, w_ends, t_w, tb, 0)
            w_rows, w_local = _slot_rows(w_tri_b, w_local_b, v0, v1, v2,
                                         tb_sub)
            self.wide = (w_rows, w_local,
                         jnp.asarray(uidx[w_ctiles].astype(np.int32)),
                         jnp.asarray(w_ctiles.astype(np.int32)),
                         jnp.asarray(w_flags),
                         jnp.zeros((len(w_ctiles),), jnp.int32),
                         jnp.asarray(uidx.astype(np.int32)))
            self.num_batches += len(w_ctiles)
        else:
            self.wide = None

    def words(self):
        origin = jnp.asarray(self.spec.origin, jnp.float32)
        vs = jnp.float32(self.spec.voxel_size)
        return _banded_total(self.rows, self.local, self.batch_tile,
                             self.step_sf, self.off, self.batch_basew,
                             self.wide, origin, vs,
                             n=self.spec.n, num_tiles=self.num_tiles,
                             tc=self.tc, tb_sub=self.tb_sub, band=self.band,
                             pack=self.pack)

    def __call__(self) -> VoxelGrid:
        words, overflow = self.words()
        if int(overflow) != 0:
            raise RuntimeError(
                f"{int(overflow)} fragments left their baked x-bands "
                "(coords drifted); rebuild the pipeline")
        return VoxelGrid(
            words=words,
            origin=jnp.asarray(self.spec.origin, jnp.float32),
            voxel_size=jnp.float32(self.spec.voxel_size),
        )
