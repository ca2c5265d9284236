"""Sharded differentiable voxelization training step.

Full SPMD fwd+bwd over a (d, z) device mesh (the BASELINE.json target:
"triangles and voxel-grid tiles sharded across chips ... vertex-gradient
all-reduce overlaps the backward pass"):

- Triangles: every (d, z) shard owns a distinct triangle subset
  (dp-style). Soft-fragment contributions are partial sums.
- Grid: `psum_scatter` over "z" reduces partial occupancies directly
  into Z-slabs (reduce+shard in one collective), then `psum` over "d"
  completes the triangle reduction; the loss is computed per-slab and
  `psum`'d over "z".
- Backward: shard_map's transpose turns the psums into broadcasts and
  the scatter into an all-gather; the vertex-coordinate gradient is
  all-reduced across the mesh automatically (XLA overlaps it with the
  remaining backward compute).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from voxtpu.ops.soft_vox import _accumulate, _soft_fragments


def _split_soft_buckets(plan, n_shards: int):
    """Split a soft plan's (window, sy, sz, face_idx) buckets into
    n_shards equal padded slices, stacked on a new leading axis."""
    out = []
    n = plan.spec.n
    for bucket in plan.buckets:
        window, _, _, _, sy, sz, fi = bucket
        t = sy.shape[0]
        per = -(-t // n_shards)
        pad_to = per * n_shards

        def pad(a, fill):
            a = np.asarray(a)
            if a.shape[0] == pad_to:
                return a
            return np.concatenate(
                [a, np.full((pad_to - a.shape[0],), fill, a.dtype)]
            )

        syp = pad(sy, n).reshape(n_shards, per)
        szp = pad(sz, n).reshape(n_shards, per)
        fip = pad(fi, 0).reshape(n_shards, per)
        # padded rows must stay inert: their (sy, sz) = n pushes every
        # candidate cell out of the grid -> zero weight.
        out.append((window, syp, szp, fip))
    return out


def make_sharded_fit(plan, device_mesh: Mesh,
                     learning_rate: float = 1e-2,
                     tau_edge_frac: float = 0.25, tau_x_frac: float = 0.5):
    """Build (init_fn, step_fn, loss_fn) for vertex fitting on a mesh.

    `step_fn(coords, opt_state, target_slab) -> (coords, opt_state, loss)`
    is jitted over the device mesh; `target_slab` must be sharded
    P('z', None, None).
    """
    spec = plan.spec
    n = spec.n
    dd, dz = device_mesh.shape["d"], device_mesh.shape["z"]
    n_shards = dd * dz
    if n % dz != 0:
        raise ValueError(f"N={n} must divide z axis {dz}")
    slab = n // dz

    faces = jnp.asarray(plan.faces_array)
    shards = _split_soft_buckets(plan, n_shards)
    shard_args = []
    for window, syp, szp, fip in shards:
        shard_args.extend([jnp.asarray(syp), jnp.asarray(szp), jnp.asarray(fip)])

    vs = spec.voxel_size
    tau_e = tau_edge_frac * vs * vs
    tau_x = tau_x_frac * vs

    def local_occ(coords, *bucket_arrays):
        all_cells, all_w, all_x = [], [], []
        for b, (window, _, _, _) in enumerate(shards):
            sy, sz, fi = (a[0] for a in bucket_arrays[b * 3:(b + 1) * 3])
            tri = coords[faces[fi]]
            cells, w, x = _soft_fragments(
                tri[:, 0], tri[:, 1], tri[:, 2], sy, sz,
                window=window, n=n, origin=spec.origin, voxel_size=vs,
                tau_edge=tau_e,
            )
            all_cells.append(cells)
            all_w.append(w)
            all_x.append(x)
        return _accumulate(
            jnp.concatenate(all_cells), jnp.concatenate(all_w),
            jnp.concatenate(all_x), n=n, origin=spec.origin,
            voxel_size=vs, tau_x=tau_x,
        )  # (N, N, N) partial

    def shard_loss(coords, target_slab, *bucket_arrays):
        partial = local_occ(coords, *bucket_arrays)
        # reduce-scatter the triangle partials into Z slabs, then finish
        # the reduction over the d axis.
        slab_occ = jax.lax.psum_scatter(partial, "z", scatter_dimension=0,
                                        tiled=True)
        slab_occ = jax.lax.psum(slab_occ, "d")
        slab_occ = jnp.clip(slab_occ, 0.0, 1.0)
        inter = jnp.sum(slab_occ * target_slab)
        tot = jnp.sum(slab_occ) + jnp.sum(target_slab)
        inter = jax.lax.psum(inter, "z")
        tot = jax.lax.psum(tot, "z")
        return 1.0 - inter / (tot - inter + 1e-8)

    in_specs = (P(), P("z", None, None)) + tuple(
        P(("d", "z")) for _ in range(len(shards) * 3)
    )
    sharded_loss = jax.shard_map(
        shard_loss, mesh=device_mesh, in_specs=in_specs, out_specs=P(),
        check_vma=False,
    )

    optimizer = optax.adam(learning_rate)

    _loss_jit = jax.jit(
        lambda coords, target_slab: sharded_loss(
            coords, target_slab, *shard_args))

    def loss_fn(coords, target_slab):
        return _loss_jit(coords, target_slab)

    @jax.jit
    def step_fn(coords, opt_state, target_slab):
        value, grads = jax.value_and_grad(loss_fn)(coords, target_slab)
        updates, opt_state = optimizer.update(grads, opt_state, coords)
        coords = optax.apply_updates(coords, updates)
        return coords, opt_state, value

    def init_fn(coords):
        coords = jnp.asarray(coords, jnp.float32)
        return coords, optimizer.init(coords)

    return init_fn, step_fn, loss_fn
