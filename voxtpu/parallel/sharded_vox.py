"""Multi-device solid voxelization: triangle-sharded fragments,
grid-sharded resolve.

SPMD design (no analog exists in the single-GPU reference, SURVEY.md §2d):

1. Triangle buckets are split across the full device mesh host-side
   (every device gets an equal padded slice).
2. Each device emits fragments for its triangles (`emit_fragments`).
3. One `all_gather` over both mesh axes shares the fragment lists —
   fragments (8 bytes each) are far smaller than the N^3 grid.
4. Every device sorts the global fragment list and resolves *only its
   own Z-slab* of the output grid (the searchsorted probe range is the
   slab's cells), yielding a grid sharded along Z with zero scatter.

Communication: a single fragment all-gather over ICI; compute is fully
local afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
    """Resolve sorted fragments into one Z-slab of packed words.

    `cells` must be globally sorted; the slab's cell-id range is
    [z0*n, (z0+slab)*n) where z0 = axis_index('z') * slab.
    """
    num_words = n // WORD_BITS
    z0 = jax.lax.axis_index("z") * slab
    base = z0 * n
    probes = base + jnp.arange(slab * n + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(cells, probes)
    starts, ends = bounds[:-1], bounds[1:]
    words = []
    x32 = x_entry.astype(jnp.int32)
    for w in range(num_words):
        s = x32 - WORD_BITS * w
        mask = jnp.where(
            s <= 0,
            jnp.uint32(0xFFFFFFFF),
            jnp.where(
                s >= WORD_BITS,
                jnp.uint32(0),
                jnp.uint32(0xFFFFFFFF)
                << jnp.clip(s, 0, WORD_BITS - 1).astype(jnp.uint32),
            ),
        )
        scan = jax.lax.associative_scan(jnp.bitwise_xor, mask)
        scan0 = jnp.concatenate([jnp.zeros((1,), jnp.uint32), scan])
        words.append(scan0[ends] ^ scan0[starts])
    return jnp.stack(words, axis=-1).reshape(slab, n, num_words)


def voxelize_sharded(mesh: TriMesh, spec: GridSpec, device_mesh: Mesh,
                     plan: FragmentPlan | None = None) -> VoxelGrid:
    """Voxelize with triangles sharded over all mesh devices and the
    output grid sharded along Z over the mesh's "z" axis."""
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
        # Share fragments over both axes, then resolve only our Z slab.
        cells = jax.lax.all_gather(cells, ("d", "z"), tiled=True)
        xs = jax.lax.all_gather(xs, ("d", "z"), tiled=True)
        cells, xs = jax.lax.sort((cells, xs), num_keys=1)
        return _resolve_slab(cells, xs, n=n, slab=slab)

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
