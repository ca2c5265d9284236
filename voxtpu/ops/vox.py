"""Solid voxelization — XLA backend (pure jax.numpy, runs on any device).

TPU-first reformulation of the reference's parity voxelizers
(`vox/sequential.cpp:18-61` semantics; `vox/naive.cu`, `vox/tiled.cu`
performance paths). There are no atomics on TPU and none are needed:

    XOR-toggling the X column from the entry voxel to the grid edge
    (`vox/sequential.cpp:56-57`, word-wise `atomicXor` at
    `vox/naive.cu:72-80` / `vox/tiled.cu:472-481`) is equivalent to
    XOR-ing, per (y, z) column, the *suffix fill masks*
    ``0xFFFFFFFF << (x_entry - 32*w)`` of every covering triangle.

Pipeline (all static shapes, jit-friendly):

1. **Bucketed fragment generation** (`emit_fragments`): triangles are
   grouped host-side by YZ-bbox raster window size W (powers of two);
   for each bucket a vmapped kernel tests all W*W candidate (y, z) cells
   with the reference's three inclusive edge functions and computes the
   column entry index ``x_entry``. Each covered cell yields a fragment
   ``(cell_key = z*N + y, x_entry)``. This replaces the reference's
   work-queue overlap/scan/population stages (`vox/tiled.cu:15-370`).
2. **Sort by cell** (`jax.lax.sort`) — replaces CUB radix sort
   (`vox/tiled.cu:121-163`).
3. **Segmented XOR via associative scan + searchsorted boundary gather**
   — replaces run-length-encode + the atomicXor kernel
   (`vox/tiled.cu:165-248,372-486`). For each packed output word we scan
   the per-fragment fill masks with `bitwise_xor` and take per-cell
   range XORs at segment boundaries found by binary search. No scatter.

Gradients: this hard parity path is forward-only by construction (bits
don't differentiate); the differentiable path is `voxtpu.ops.soft_vox`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voxtpu.grids.voxel_grid import WORD_BITS, GridSpec, VoxelGrid
from voxtpu.mesh.mesh import Mesh

# ---------------------------------------------------------------------------
# Host-side bucketing (data layout, not compute — NumPy, one-time per mesh)
# ---------------------------------------------------------------------------


def _triangle_windows(mesh: Mesh, spec: GridSpec):
    """Per-triangle raster window (start_y, start_z, w) in voxel units."""
    v0, v1, v2 = mesh.triangle_vertices()
    oy, oz = np.float32(spec.origin[1]), np.float32(spec.origin[2])
    vs = np.float32(spec.voxel_size)
    min_y = np.minimum(np.minimum(v0[:, 1], v1[:, 1]), v2[:, 1])
    max_y = np.maximum(np.maximum(v0[:, 1], v1[:, 1]), v2[:, 1])
    min_z = np.minimum(np.minimum(v0[:, 2], v1[:, 2]), v2[:, 2])
    max_z = np.maximum(np.maximum(v0[:, 2], v1[:, 2]), v2[:, 2])
    start_y = np.floor((min_y - oy) / vs).astype(np.int32)
    end_y = np.ceil((max_y - oy) / vs).astype(np.int32)
    start_z = np.floor((min_z - oz) / vs).astype(np.int32)
    end_z = np.ceil((max_z - oz) / vs).astype(np.int32)
    start_y = np.clip(start_y, 0, spec.n)
    end_y = np.clip(end_y, 0, spec.n)
    start_z = np.clip(start_z, 0, spec.n)
    end_z = np.clip(end_z, 0, spec.n)
    w = np.maximum(end_y - start_y, end_z - start_z)
    return v0, v1, v2, start_y, start_z, w


def _window_classes(wmax: int) -> list[int]:
    """Window-class ladder 1,2,3,4,6,8,12,16,24,... (pow2 + 1.5*pow2),
    covering [1, wmax]. Shared by the hard (`FragmentPlan`) and soft
    (`make_soft_plan`) candidate builders — their candidate sets must
    stay comparable, so the ladder lives in one place."""
    classes = [1, 2, 3]
    c = 4
    while classes[-1] < wmax:
        classes += [c, c + c // 2]
        c *= 2
    return classes


class FragmentPlan:
    """Static, device-resident triangle buckets for one (mesh, grid) pair.

    The reference rebuilds its tile work queue on every call inside the
    profiled region (`vox/tiled.cu:504-547`); here layout prep is a
    host-side one-time step and the jitted compute is replayed across
    iterations (the idiomatic JAX split).
    """

    def __init__(self, mesh: Mesh, spec: GridSpec, max_window: int = 128):
        v0, v1, v2, start_y, start_z, w = _triangle_windows(mesh, spec)
        self.spec = spec
        self.buckets = []  # list of (W, v0, v1, v2, start_y, start_z)
        # Window classes 1,2,3,4,6,8,12,16,... (pow2 + 1.5x pow2):
        # candidate cells scale with W^2, and real meshes concentrate at
        # tiny W (1.35M-face bunny @512^3: 85% at W=2, 10% at W=3), so
        # the finer ladder cuts padded candidates ~1.6x vs pure pow2 —
        # sort/scan cost in the per-call total pipeline scales with it.
        classes = _window_classes(max(int(w.max(initial=1)), 1))
        lo = 0
        for wclass in classes:
            sel = (w > lo) & (w <= wclass)
            idx = np.nonzero(sel)[0]
            if idx.size:
                pad = _pad_granular(idx.size)
                take = lambda a: _pad_rows(a[idx], pad)
                self.buckets.append(
                    (
                        int(min(wclass, spec.n)),
                        jnp.asarray(take(v0)),
                        jnp.asarray(take(v1)),
                        jnp.asarray(take(v2)),
                        jnp.asarray(_pad_rows(start_y[idx], pad, fill=spec.n)),
                        jnp.asarray(_pad_rows(start_z[idx], pad, fill=spec.n)),
                    )
                )
            lo = wclass
        self.num_fragments = sum(
            b[1].shape[0] * min(b[0], spec.n) ** 2 for b in self.buckets
        )


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _pad_granular(count: int) -> int:
    """Row padding at 1/8-octave granularity: <= 12.5% waste (pure pow2
    wasted up to 2x) while keeping the set of compiled shapes small
    (8 sizes per octave) for plan-refresh loops."""
    gran = max(256, _next_pow2(count) // 8)
    return -(-count // gran) * gran


def _pad_rows(a: np.ndarray, rows: int, fill=0):
    if a.shape[0] == rows:
        return a
    pad = np.full((rows - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


# ---------------------------------------------------------------------------
# Fragment emission (jit, per bucket, static window W)
# ---------------------------------------------------------------------------


def _edge_zy(py, pz, qy, qz, y, z):
    """Reference edge function `vplib/src/vox/vox.h:22-24` (float32).

    Component form of ``(z - p[2]) * (q[1] - p[1]) - (y - p[1]) *
    (q[2] - p[2])`` — same expression, same evaluation order as the
    reference (the formula's FMA-sensitive rounding is part of the
    oracle bit-parity contract)."""
    return (z - pz) * (qy - py) - (y - py) * (qz - pz)


@functools.partial(jax.jit, static_argnames=("window", "n"))
def emit_fragments(v0, v1, v2, start_y, start_z, *, window: int, n: int,
                   origin=None, voxel_size=None):
    """Rasterize one bucket: returns (cell_key, x_entry) int32 arrays of
    length window**2 * T. Invalid candidates get cell_key == n*n
    (sentinel that sorts last).

    Lane-major layout: every per-triangle quantity is a (T,) array (T in
    the TPU lane dimension) and the window**2 candidate offsets form the
    leading axis of a (W^2, T) broadcast — the round-3 rewrite of the
    per-triangle vmap whose tiny (W, W) inner shapes left 124/128 lanes
    of every vector op dead and made emit ~25 ms of a 77 ms total at
    512^3. Flatten order is offset-major; all consumers sort by cell, so
    fragment order is contractually irrelevant (XOR is commutative).
    """
    origin = jnp.asarray(origin, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    w = window

    a0, a1, a2 = v0[:, 0], v0[:, 1], v0[:, 2]
    b1, b2 = v1[:, 1], v1[:, 2]
    c1, c2 = v2[:, 1], v2[:, 2]
    u0, u1, u2 = v1[:, 0] - a0, b1 - a1, b2 - a2          # b - a
    t0, t1, t2 = v2[:, 0] - a0, c1 - a1, c2 - a2          # c - a
    # cross(b - a, c - b)[0] — the reference's facing test input.
    normal_x = u1 * (c2 - b2) - u2 * (c1 - b1)
    sign = jnp.where(normal_x >= 0, jnp.float32(1), jnp.float32(-1))
    A = u1 * t2 - u2 * t1                                  # cross(b-a, c-a)
    B = u2 * t0 - u0 * t2
    C = u0 * t1 - u1 * t0
    D = A * a0 + B * a1 + C * a2

    # Candidate offsets: k = dz * W + dy (the old (W, W) flatten order
    # per triangle), broadcast against the (T,) triangle lanes.
    k = jax.lax.broadcasted_iota(jnp.int32, (w * w, 1), 0)
    dy = k % w
    dz = k // w
    ys = start_y[None, :] + dy
    zs = start_z[None, :] + dz
    cy = origin[1] + (ys.astype(jnp.float32) * vs + vs / 2)
    cz = origin[2] + (zs.astype(jnp.float32) * vs + vs / 2)

    e0 = _edge_zy(a1, a2, b1, b2, cy, cz) * sign
    e1 = _edge_zy(b1, b2, c1, c2, cy, cz) * sign
    e2 = _edge_zy(c1, c2, a1, a2, cy, cz) * sign
    inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
    inside &= (ys >= 0) & (ys < n) & (zs >= 0) & (zs < n)

    intersection = (D - B * cy - C * cz) / A
    xf = (intersection - origin[0]) / vs
    valid = inside & jnp.isfinite(xf) & (xf < n)
    # C-style truncation toward zero, then clamp left-of-grid to 0.
    x_entry = jnp.clip(xf.astype(jnp.int32), 0, n - 1)
    cell = jnp.where(valid, zs * n + ys, jnp.int32(n * n))
    x_entry = jnp.where(valid, x_entry, jnp.int32(0))
    return cell.reshape(-1), x_entry.reshape(-1)


# ---------------------------------------------------------------------------
# Fragment resolve: sort + XOR scan + boundary gather  (no scatter)
# ---------------------------------------------------------------------------


def _cumxor(x):
    """Inclusive XOR prefix scan via Hillis-Steele doubling (log2 N
    static shifted-XOR passes). `lax.associative_scan(bitwise_xor)` at
    ~8M elements never finishes compiling on the tunneled TPU — plain
    pad/slice/xor ops lower instantly everywhere."""
    n = x.shape[0]
    s = 1
    while s < n:
        x = x ^ jnp.concatenate([jnp.zeros((s,), x.dtype), x[:-s]])
        s *= 2
    return x


@functools.partial(jax.jit, static_argnames=("n",))
def resolve_fragments(cells, x_entry, *, n: int):
    """Combine fragments into packed occupancy words (N, N, N/32).

    occupancy_word[c, w] = XOR over fragments f in cell c of
    ``suffix_mask(x_entry_f, w)``.

    Word-event formulation: each fragment's suffix mask decomposes into
    an in-word part (``0xFFFFFFFF << bit`` at its own word) and a full
    flip of every later word. One sort by (cell, word), one XOR scan of
    the in-word masks, and per-(cell, word) fragment counts give both —
    O(F log F + N^3/32) with no per-word python unroll (the previous
    16-scans-over-F formulation blew the XLA compile budget at 512^3).

    N <= 2048: the composite (cell, word) probe index must fit int32.
    """
    num_words = n // WORD_BITS
    if n * n * num_words >= 2**31:
        raise ValueError("xla resolve_fragments supports N <= 2048 "
                         "(int32 composite (cell, word) index)")
    x32 = x_entry.astype(jnp.int32)
    wf = jnp.minimum(x32 // WORD_BITS, num_words - 1)
    bf = x32 % WORD_BITS
    order_cells, order_w, order_b = jax.lax.sort((cells, wf, bf), num_keys=2)
    mask_own = jnp.uint32(0xFFFFFFFF) << order_b.astype(jnp.uint32)

    # Per-(cell, word) fragment ranges via one binary search over the
    # composite key. Sentinel fragments (cell == n*n) sort to composite
    # keys >= n*n*num_words — past every probe, so they contribute to
    # neither the in-word XOR nor the carry counts.
    cw = order_cells * num_words + order_w
    probes = jnp.arange(n * n * num_words + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(cw, probes).astype(jnp.int32)

    scan = _cumxor(mask_own)  # inclusive
    scan0 = jnp.concatenate([jnp.zeros((1,), jnp.uint32), scan])
    inword = (scan0[bounds[1:]] ^ scan0[bounds[:-1]]).reshape(-1, num_words)

    # Carry parity: word q of cell c flips once per fragment with
    # w_f < q, i.e. bounds[c*W + q] - bounds[c*W] fragments.
    b2 = bounds[:-1].reshape(-1, num_words)
    carry_odd = ((b2 - b2[:, :1]) & 1).astype(jnp.uint32)
    words = inword ^ (carry_odd * jnp.uint32(0xFFFFFFFF))
    return words.reshape(n, n, num_words)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def voxelize(mesh: Mesh, spec: GridSpec, backend: str = "xla",
             plan: FragmentPlan | None = None) -> VoxelGrid:
    """Solid-voxelize `mesh` into a packed VoxelGrid.

    backend: "xla" (this module), "pallas" (TPU kernel), "reference"
    (NumPy oracle), or "native" (C++/OpenMP).
    """
    spec.num_words  # packed output: raises early unless N % 32 == 0
    if plan is not None and plan.spec != spec:
        # Fragments are emitted in plan.spec's coordinates while the
        # resolve and output grid use `spec` — a mismatch would place
        # the mesh in a silently wrong grid.
        raise ValueError(
            f"plan was built for {plan.spec}, not the requested {spec}")
    if backend == "reference":
        from voxtpu.ops.reference import voxelize_ref

        occ = voxelize_ref(mesh, spec)
        return VoxelGrid.from_dense(jnp.asarray(occ), spec)
    if backend == "native":
        from voxtpu.native import native_voxelize

        occ = native_voxelize(mesh, spec)
        return VoxelGrid.from_dense(jnp.asarray(occ), spec)
    if backend == "pallas":
        from voxtpu.ops.vox_pallas import voxelize_pallas

        return voxelize_pallas(mesh, spec, plan=plan)
    if backend != "xla":
        raise ValueError(f"unknown backend {backend!r}")

    if plan is None:
        plan = FragmentPlan(mesh, spec)
    cells, xs = fragments_from_plan(plan)
    words = resolve_fragments(cells, xs, n=spec.n)
    return VoxelGrid(
        words=words,
        origin=jnp.asarray(spec.origin, jnp.float32),
        voxel_size=jnp.float32(spec.voxel_size),
    )


def fragments_from_plan(plan: FragmentPlan):
    """Emit and concatenate fragments for every bucket of a plan."""
    spec = plan.spec
    all_cells, all_xs = [], []
    for window, v0, v1, v2, sy, sz in plan.buckets:
        cells, xs = emit_fragments(
            v0, v1, v2, sy, sz,
            window=window, n=spec.n,
            origin=spec.origin, voxel_size=spec.voxel_size,
        )
        all_cells.append(cells)
        all_xs.append(xs)
    if not all_cells:
        z = jnp.full((1,), spec.n * spec.n, jnp.int32)
        return z, jnp.zeros((1,), jnp.int32)
    return jnp.concatenate(all_cells), jnp.concatenate(all_xs)
