"""Multi-device solid voxelization: triangle-sharded fragments,
grid-sharded resolve.

SPMD design (no analog exists in the single-GPU reference, SURVEY.md §2d):

1. Triangle buckets are split across the full device mesh host-side
   (every device gets an equal padded slice).
2. Each device emits fragments for its triangles (`emit_fragments`)
   and sorts its LOCAL list by (cell, x).
3. The Z-axis `ppermute` ring rotates the sorted shard lists; each
   rotation every device XOR-accumulates the visiting shard's
   contribution to its own Z-slab (word-event resolve, no scatter).
   Fragments (8 bytes each) are far smaller than the N^3 grid, and the
   ring transfers overlap the resolve compute.

Per-device sort cost stays O(F/S log F/S) at any device count S — the
round-1 all-gather + replicated global sort (kept as
``exchange="gather"``) was O(F log F) per device regardless of S.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from voxtpu.grids.voxel_grid import WORD_BITS, GridSpec, VoxelGrid
from voxtpu.mesh.mesh import Mesh as TriMesh
from voxtpu.ops.vox import FragmentPlan, emit_fragments


def _split_buckets(plan: FragmentPlan, n_shards: int):
    """Split every bucket's triangle rows into n_shards equal slices
    (padded rows are already inert)."""
    shards = [[] for _ in range(n_shards)]
    for window, v0, v1, v2, sy, sz in plan.buckets:
        t = v0.shape[0]
        per = -(-t // n_shards)
        pad_to = per * n_shards
        def padarr(a, fill):
            if a.shape[0] == pad_to:
                return np.asarray(a)
            extra = np.full((pad_to - a.shape[0],) + a.shape[1:], fill, np.asarray(a).dtype)
            return np.concatenate([np.asarray(a), extra], axis=0)
        v0p, v1p, v2p = (padarr(a, 0) for a in (v0, v1, v2))
        syp = padarr(sy, plan.spec.n)
        szp = padarr(sz, plan.spec.n)
        for s in range(n_shards):
            sl = slice(s * per, (s + 1) * per)
            shards[s].append((window, v0p[sl], v1p[sl], v2p[sl], syp[sl], szp[sl]))
    return shards


def _resolve_slab(cells, x_entry, *, n: int, slab: int):
    """Resolve (cell, x)-sorted fragments into one Z-slab of packed
    words (word-event formulation — no per-word python unroll, matching
    `voxtpu.ops.vox.resolve_fragments`).

    Fragments outside the slab's cell range [z0*n, (z0+slab)*n) land
    before probe 0 or past the last probe and contribute nothing.
    """
    num_words = n // WORD_BITS
    z0 = jax.lax.axis_index("z") * slab
    base = z0 * n
    x32 = x_entry.astype(jnp.int32)
    wf = jnp.minimum(x32 // WORD_BITS, num_words - 1)
    bf = x32 % WORD_BITS
    # (cell, x) sort order == (cell, wf, bf) order, so the composite
    # key is sorted. Out-of-slab cells give keys < 0 or >= count*W.
    # Clip the cell offset to [-1, slab*n] first: without it the
    # sentinel cell n*n makes the key reach n^2 * num_words = 2^31 at
    # N = 4096 and wrap to INT32_MIN (garbage searchsorted bounds).
    # Clipping is monotone, keeps in-slab keys exact, and parks every
    # out-of-slab fragment strictly outside the probe range [0, lim]
    # (clipped groups are mutually unordered by wf, but every member
    # sits on one side of all probes, so the binary search's predicate
    # stays monotone).
    if slab * n * num_words + num_words > 2**31 - 1:
        raise ValueError(
            f"slab cell keys exceed int32 at N={n} with this z-axis "
            f"size; shard over more devices (slab*N*N/32 must stay "
            f"below 2^31)")
    cw = jnp.clip(cells - base, -1, slab * n) * num_words + wf
    probes = jnp.arange(slab * n * num_words + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(cw, probes).astype(jnp.int32)

    mask_own = jnp.uint32(0xFFFFFFFF) << bf.astype(jnp.uint32)
    from voxtpu.ops.vox import _cumxor

    scan = _cumxor(mask_own)
    scan0 = jnp.concatenate([jnp.zeros((1,), jnp.uint32), scan])
    inword = (scan0[bounds[1:]] ^ scan0[bounds[:-1]]).reshape(-1, num_words)
    b2 = bounds[:-1].reshape(-1, num_words)
    carry_odd = ((b2 - b2[:, :1]) & 1).astype(jnp.uint32)
    words = inword ^ (carry_odd * jnp.uint32(0xFFFFFFFF))
    return words.reshape(slab, n, num_words)


def voxelize_sharded(mesh: TriMesh, spec: GridSpec, device_mesh: Mesh,
                     plan: FragmentPlan | None = None,
                     exchange: str = "ring") -> VoxelGrid:
    """Voxelize with triangles sharded over all mesh devices and the
    output grid sharded along Z over the mesh's "z" axis.

    exchange: "ring" (default, scalable) — each device sorts only its
    LOCAL fragments, then the Z-axis `ppermute` ring rotates the sorted
    shard lists; every rotation each device XOR-accumulates the visiting
    shard's contribution to its own slab. Per-device sort work is
    O(F/S log F/S) instead of the "gather" variant's O(F log F)
    replicated global sort, and the ring transfers overlap with the
    resolve compute. "gather": the round-1 shape (fragment all-gather +
    full sort on every device) — fine at a few devices, kept for
    comparison.
    """
    if plan is None:
        plan = FragmentPlan(mesh, spec)
    n = spec.n
    dd = device_mesh.shape["d"]
    dz = device_mesh.shape["z"]
    n_shards = dd * dz
    if n % dz != 0:
        raise ValueError(f"N={n} must divide by z-axis size {dz}")
    slab = n // dz

    shards = _split_buckets(plan, n_shards)
    # Stack shard arrays: for each bucket, (S, T_s, ...) then shard axis 0.
    num_buckets = len(plan.buckets)
    stacked = []
    for b in range(num_buckets):
        window = shards[0][b][0]
        arrs = [np.stack([shards[s][b][i] for s in range(n_shards)]) for i in range(1, 6)]
        stacked.append((window, *arrs))

    def shard_fn(*bucket_arrays):
        # bucket_arrays: flattened (v0, v1, v2, sy, sz) per bucket with a
        # leading length-1 shard axis inside shard_map.
        # Sentinel fragment keeps shapes valid for meshes with zero
        # buckets (mirrors fragments_from_plan's empty-plan fallback).
        all_cells = [jnp.full((1,), n * n, jnp.int32)]
        all_xs = [jnp.zeros((1,), jnp.int32)]
        for b in range(num_buckets):
            window = stacked[b][0]
            v0, v1, v2, sy, sz = (a[0] for a in bucket_arrays[b * 5:(b + 1) * 5])
            cells, xs = emit_fragments(
                v0, v1, v2, sy, sz, window=window, n=n,
                origin=spec.origin, voxel_size=spec.voxel_size,
            )
            all_cells.append(cells)
            all_xs.append(xs)
        cells = jnp.concatenate(all_cells)
        xs = jnp.concatenate(all_xs)
        if exchange == "gather":
            # Share fragments over both axes, then resolve our Z slab.
            cells = jax.lax.all_gather(cells, ("d", "z"), tiled=True)
            xs = jax.lax.all_gather(xs, ("d", "z"), tiled=True)
            cells, xs = jax.lax.sort((cells, xs), num_keys=2)
            return _resolve_slab(cells, xs, n=n, slab=slab)
        # Ring: share over 'd' only (usually 1), sort the LOCAL list,
        # then rotate shard lists around the Z ring, accumulating each
        # visitor's XOR contribution to our slab. XOR associativity
        # makes the partial resolves order-independent.
        cells = jax.lax.all_gather(cells, "d", tiled=True)
        xs = jax.lax.all_gather(xs, "d", tiled=True)
        cells, xs = jax.lax.sort((cells, xs), num_keys=2)
        ring = [(i, (i + 1) % dz) for i in range(dz)]
        words = _resolve_slab(cells, xs, n=n, slab=slab)
        for _ in range(dz - 1):
            cells = jax.lax.ppermute(cells, "z", ring)
            xs = jax.lax.ppermute(xs, "z", ring)
            words = words ^ _resolve_slab(cells, xs, n=n, slab=slab)
        return words

    in_specs = tuple(P(("d", "z")) for _ in range(num_buckets * 5))
    flat_in = []
    for b in range(num_buckets):
        flat_in.extend(jnp.asarray(a) for a in stacked[b][1:])

    words = jax.jit(
        jax.shard_map(
            shard_fn, mesh=device_mesh, in_specs=in_specs,
            out_specs=P("z", None, None),
            check_vma=False,  # outputs are replicated over 'd' via all_gather
        )
    )(*flat_in)
    return VoxelGrid(
        words=words,
        origin=jnp.asarray(spec.origin, jnp.float32),
        voxel_size=jnp.float32(spec.voxel_size),
    )
