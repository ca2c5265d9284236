"""Static-slot whole-pipeline voxelizer — the no-sort total path.

`DeviceVoxPipeline` (`vox_pallas_we.py`) recomputes the fragment ->
word-event reduction per call: emit, a global `lax.sort`, an XOR scan,
segment compaction, and a device-side batch layout — ~75% of its
per-call time at 512^3 (BENCH_NOTES round 3).  This module removes ALL
of it with one observation: given the plan's raster windows, the
candidate -> cell mapping is STATIC.  Window starts come from the
triangles' y/z bounding boxes at plan-build time; only the x-entry
(plane intersection) and the inside/validity tests depend on
coordinate VALUES.  So the per-(cell, tile) grouping the sorts exist
to produce can be computed ONCE, on the host, at init:

- Each triangle contributes its EXACT wy x wz bounding-box rectangle
  of candidate cells (tighter than the classed square W^2 windows the
  emit path needs for static bucket shapes — no bucket shapes exist
  here).  A cell center outside the y/z bbox can never pass the
  inclusive edge tests (floor/ceil window arithmetic puts boundary
  centers inside the window), so the candidate set is exactly the
  classed one minus statically-impossible cells.
- Candidates are sorted by YZ tile once (host argsort), cut into
  static per-tile batches, and the per-slot triangle coordinates are
  materialized as nine (B, TB) device arrays at init.
- Per call: ONE jit = an elementwise pre-pass (the `emit_fragments`
  arithmetic, verbatim, on the statically ordered slots) + the
  suffix-fill MXU kernel (`vox_pallas._run_pallas`, unchanged).  No
  sort, no scan, no compaction, no batch gather, no overflow guard —
  the batch layout is exact by construction.

This is the TPU answer to the reference's per-call work-queue rebuild
(`vox/tiled.cu:489-576` re-runs overlap count / scan / queue fill /
radix sort / RLE inside the profiled scope every call): the queue is
topology-shaped, so build it once and replay it; the per-call compute
is exactly the value-dependent part (plane intersections + edge tests
+ the kernel).  Semantics per `vox/sequential.cpp:18-61` — identical
fragments to the emit path, and XOR parity is order-independent, so
the packed grid bit-matches the event path wherever the elementwise
arithmetic rounds identically.

Same static-coords contract as `DeviceVoxPipeline`: vertex motion
requires a rebuild (windows and slot coords are baked).  Memory scales
with candidates (~4M at 512^3 / 1.35M faces -> ~250 MB of slot
coords); use `DeviceVoxPipeline` above n = 2048 or when HBM is tight.

Why THIS pipeline's cap stays at 2048 (round-4 decision, updated round
5): its whole-axis fill loses the per-batch cost race above 1024
anyway, and at 4096^3 the measured candidate count is 66M (the round-4
~267M estimate extrapolated the 512 -> 1024 growth, but per-triangle
candidate overhead dominates once triangles shrink below a cell) —
still ~3.6 GB of slot layout whose per-batch fill would span 32 output
panels.  The BANDED slot pipeline (`vox_slots_banded.py`, same slot
machinery with BAND-column windows) is the production total path at
1024-4096; the event pipeline (whose per-call state is ~26 B/event x
17M events) remains the dynamic-layout comparison
(`BENCH_OP=voxtotal BENCH_N=4096` measures both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voxtpu.grids.voxel_grid import WORD_BITS, GridSpec, VoxelGrid
from voxtpu.mesh.mesh import Mesh
from voxtpu.ops.vox import _edge_zy, _triangle_windows
from voxtpu.ops.vox_pallas import (TB_LANE, TB_SUB, TILE_CELLS, _run_pallas,
                                   tile_batches)


def _exact_candidates(mesh: Mesh, spec: GridSpec):
    """Exact per-triangle y/z bounding-box rectangles of candidate cells.

    Returns (tri, cell, v0, v1, v2): `tri[i]` the triangle owning
    candidate i, `cell[i] = z * n + y` its YZ cell (int64), and the
    triangle vertex arrays (host f32). A cell center outside the y/z
    bbox can never pass the inclusive edge tests, so this is the exact
    static candidate superset (tighter than the emit path's classed
    square windows — no static bucket shapes are needed here)."""
    n = spec.n
    v0, v1, v2, sy, sz, _ = _triangle_windows(mesh, spec)
    oy, oz = np.float32(spec.origin[1]), np.float32(spec.origin[2])
    vs = np.float32(spec.voxel_size)
    ey = np.clip(np.ceil(
        (np.maximum(np.maximum(v0[:, 1], v1[:, 1]), v2[:, 1]) - oy)
        / vs).astype(np.int64), 0, n)
    ez = np.clip(np.ceil(
        (np.maximum(np.maximum(v0[:, 2], v1[:, 2]), v2[:, 2]) - oz)
        / vs).astype(np.int64), 0, n)
    wy = np.maximum(ey - sy, 0)
    wz = np.maximum(ez - sz, 0)
    counts = wy * wz
    total = int(counts.sum())
    if not total:
        return (np.zeros((0,), np.int32), np.zeros((0,), np.int64),
                v0, v1, v2)
    tri = np.repeat(np.arange(len(counts), dtype=np.int32), counts)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offs = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
    wy_r = np.repeat(wy, counts)
    dy = offs % np.maximum(wy_r, 1)
    dz = offs // np.maximum(wy_r, 1)
    ys = np.repeat(sy.astype(np.int64), counts) + dy
    zs = np.repeat(sz.astype(np.int64), counts) + dz
    cell = zs * n + ys
    return tri, cell, v0, v1, v2


def _slot_rows(tri_b: np.ndarray, local_b: np.ndarray, v0, v1, v2,
               tb_sub: int):
    """Materialize per-slot triangle coordinates as device arrays.

    `tri_b`/`local_b` are (bcount, tb) host layouts (-1 local = pad).
    Returns (rows, local): nine (B, tb_sub, 128) f32 coordinate arrays
    (one init-time row gather — 64-byte rows ride the fast-gather path)
    and the int32 local-cell array."""
    bcount = tri_b.shape[0]
    if len(v0) == 0:  # empty mesh: one degenerate row for pad slots
        v0 = v1 = v2 = np.zeros((1, 3), np.float32)
    tri9 = np.concatenate([v0, v1, v2], axis=1).astype(np.float32)
    rows16 = jnp.asarray(
        np.concatenate(
            [tri9, np.zeros((tri9.shape[0], 7), np.float32)], axis=1))
    slot_rows = jnp.take(rows16, jnp.asarray(tri_b.reshape(-1)), axis=0)
    rows = tuple(
        slot_rows[:, i].reshape(bcount, tb_sub, TB_LANE)
        for i in range(9))
    local = jnp.asarray(
        local_b.astype(np.int32).reshape(bcount, tb_sub, TB_LANE))
    return rows, local


def _batch_index(starts: np.ndarray, ends: np.ndarray, values, tb: int,
                 fill):
    """Gather per-slot host arrays into a (bcount, tb) batch layout."""
    total = values.shape[0]
    idx = starts[:, None] + np.arange(tb, dtype=np.int64)[None, :]
    in_range = idx < ends[:, None]
    idx_c = np.clip(idx, 0, max(total - 1, 0))
    return np.where(in_range, values[idx_c] if total else fill, fill)


@functools.partial(jax.jit, static_argnames=("n", "tc"))
def _slot_emit(rows, local, batch_tile, origin, vs, *, n: int, tc: int):
    """Per-slot x-entry + validity — `voxtpu.ops.vox.emit_fragments`
    arithmetic verbatim (bit-parity with the emit path rides on the
    formulas matching term for term), evaluated on the static slot
    layout. `rows` is a 9-tuple of (B, TB_SUB, 128) f32 arrays
    (a0 a1 a2 b0 b1 b2 c0 c1 c2); `local` carries -1 for pad slots.
    Returns (xs, local_k) with local_k == -1 for invalid slots.
    """
    a0, a1, a2, b0, b1, b2, c0, c1, c2 = rows
    cell = batch_tile[:, None, None] * tc + local
    ys = cell % n
    zs = cell // n
    cy = origin[1] + (ys.astype(jnp.float32) * vs + vs / 2)
    cz = origin[2] + (zs.astype(jnp.float32) * vs + vs / 2)

    u0, u1, u2 = b0 - a0, b1 - a1, b2 - a2
    t0, t1, t2 = c0 - a0, c1 - a1, c2 - a2
    normal_x = u1 * (c2 - b2) - u2 * (c1 - b1)
    sign = jnp.where(normal_x >= 0, jnp.float32(1), jnp.float32(-1))
    A = u1 * t2 - u2 * t1
    B = u2 * t0 - u0 * t2
    C = u0 * t1 - u1 * t0
    D = A * a0 + B * a1 + C * a2

    e0 = _edge_zy(a1, a2, b1, b2, cy, cz) * sign
    e1 = _edge_zy(b1, b2, c1, c2, cy, cz) * sign
    e2 = _edge_zy(c1, c2, a1, a2, cy, cz) * sign
    inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)

    intersection = (D - B * cy - C * cz) / A
    xf = (intersection - origin[0]) / vs
    valid = inside & jnp.isfinite(xf) & (xf < n) & (local >= 0)
    x = jnp.clip(xf.astype(jnp.int32), 0, n - 1)
    return jnp.where(valid, x, 0), jnp.where(valid, local, -1)


@functools.partial(jax.jit,
                   static_argnames=("n", "num_tiles", "tc", "tb_sub", "seg"))
def _slot_total(rows, local, batch_tile, flags, batch_xseg, tile_mask,
                origin, vs, *, n: int, num_tiles: int, tc: int,
                tb_sub: int, seg: int | None):
    del tile_mask  # zero-init alias: unvisited tiles are already 0
    xs, local_k = _slot_emit(rows, local, batch_tile, origin, vs, n=n, tc=tc)
    words = _run_pallas(local_k, xs, batch_tile, flags, batch_xseg,
                        n=n, num_tiles=num_tiles, tc=tc, tb_sub=tb_sub,
                        seg=seg)
    return words.reshape(n, n, n // WORD_BITS)


class SlotVoxPipeline:
    """Whole-pipeline voxelizer with a static slot layout: per-call =
    elementwise pre-pass + suffix kernel, zero data movement machinery.

    Compare against the reference's per-call total
    (`vox/tiled.cu:489-576`, CSV `*_tiled_vox.csv` "total" rows): both
    scopes go coordinates -> packed grid for a fixed topology.  The
    capacity story is simpler than `DeviceVoxPipeline`'s: every
    candidate owns a slot, validity is decided in the pre-pass, so
    there is NO overflow state — but vertex motion beyond the built
    windows makes results stale silently; rebuild on drift (same
    guard the fit loop uses for plan refreshes).
    """

    def __init__(self, mesh: Mesh, spec: GridSpec, tc: int = TILE_CELLS,
                 tb_sub: int = TB_SUB, seg: int | None = None):
        n = spec.n
        if n % WORD_BITS != 0:
            raise ValueError("pallas vox requires N % 32 == 0")
        if tc <= 0 or (n * n) % tc != 0:
            raise ValueError(f"tc={tc} must divide N^2={n * n}")
        if seg is not None and seg != n:
            # The suffix kernel's segmented mode needs slots grouped by
            # (tile, x-segment) with per-batch segment ids
            # (`PallasVoxPlan` sorts by that key); the slot layout here
            # groups by tile only, so seg < n would silently drop every
            # fragment entering at x >= seg. Segmentation also measured
            # slower at every probed size (BENCH_NOTES round 2) — the
            # whole-axis fill is the supported configuration.
            raise ValueError(
                f"SlotVoxPipeline supports only whole-axis fill "
                f"(seg=None or seg == n, got seg={seg})")
        tb = tb_sub * TB_LANE
        self.spec = spec
        self.tc = tc
        self.tb_sub = tb_sub
        self.seg = n
        num_tiles = (n * n) // tc
        self.num_tiles = num_tiles

        # --- static candidate set: exact per-triangle y/z rectangles.
        tri, cell, v0, v1, v2 = _exact_candidates(mesh, spec)
        total = cell.shape[0]
        self.num_candidates = total

        if total:
            order = np.argsort(cell // tc, kind="stable")
            cell = cell[order]
            tri = tri[order]
            local = (cell % tc).astype(np.int32)
            bounds = np.searchsorted(cell // tc,
                                     np.arange(num_tiles + 1, dtype=np.int64))
        else:
            local = np.zeros((0,), np.int32)
            bounds = np.zeros((num_tiles + 1,), np.int64)

        batch_tiles, starts, flags, ends, tile_mask, _ = tile_batches(
            bounds, tb)
        bcount = len(batch_tiles)
        local_b = _batch_index(starts, ends, local, tb, -1)
        tri_b = _batch_index(starts, ends, tri, tb, 0)
        self.num_batches = bcount
        self.num_slots = bcount * tb

        # --- device arrays: slot coords via one init-time row gather.
        self.rows, self.local = _slot_rows(tri_b, local_b, v0, v1, v2,
                                           tb_sub)
        self.batch_tile = jnp.asarray(batch_tiles.astype(np.int32))
        self.flags = jnp.asarray(flags)
        self.batch_xseg = jnp.zeros((bcount,), jnp.int32)
        self.tile_mask = jnp.asarray(tile_mask)

    def words(self):
        origin = jnp.asarray(self.spec.origin, jnp.float32)
        vs = jnp.float32(self.spec.voxel_size)
        return _slot_total(self.rows, self.local, self.batch_tile,
                           self.flags, self.batch_xseg, self.tile_mask,
                           origin, vs, n=self.spec.n,
                           num_tiles=self.num_tiles, tc=self.tc,
                           tb_sub=self.tb_sub, seg=self.seg)

    def __call__(self) -> VoxelGrid:
        return VoxelGrid(
            words=self.words(),
            origin=jnp.asarray(self.spec.origin, jnp.float32),
            voxel_size=jnp.float32(self.spec.voxel_size),
        )
