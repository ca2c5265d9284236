"""Sharded soft-voxelization training step on the segmented engine.

Same SPMD structure as `voxtpu.parallel.sharded_soft_fused` (triangle
shards -> per-shard partial occupancy -> `psum_scatter` into Z slabs ->
soft-IoU -> vertex-grad all-reduce in the transpose), with each shard
accumulating through `voxtpu.ops.soft_vox_seg` — the engine whose
panel/carry decomposition keeps per-slot cost independent of the grid's
x-extent, i.e. the best fwd+bwd engine at n >= 256 (BENCH_NOTES r3).

Differences from the fused-engine port:
- `SegSoftPlan` needs build-time COORDINATES (panels are placed from
  host-evaluated x_hit), so the maker takes the coords the plan is
  built against; `xhit_drift_vox` on the per-shard plans is the refresh
  guard, same as single-chip `VoxelFit(engine='seg')`.
- Per-shard layouts carry (tile, panel) batch keys plus THREE
  visited-block masks; pad batches aim at an `extra_tiles` dummy tile
  row (cfg[7]) whose mask rows are all-False.

The shard split is by triangle (`_split_soft_buckets`), so per-shard
panel assignments are independent — a shard's batches only cover the
(tile, panel) runs its own triangles touch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voxtpu.ops.soft_vox_fused import (
    FLAG_FIRST,
    FLAG_LAST,
    NATTR,
    TB_LANE,
    _build_classed_reduction,
    _expand_rows,
    _gather_tri,
    triangle_coeffs,
)
from voxtpu.ops.soft_vox_seg import MARGIN, SegSoftPlan, _seg_accumulate
from voxtpu.parallel.sharded_fit import _split_soft_buckets
from voxtpu.parallel.sharded_soft_pallas import _ShardBuckets


def build_seg_shard_layouts(soft_plan, coords, n_shards: int,
                            tc: int = 128, tb_sub: int = 4, tbl: int = 128,
                            tz: int = 8):
    """Per-shard SegSoftPlan layouts padded to a common batch count.

    Returns (stacked, plans, meta): `stacked` is a dict of jnp arrays
    with a leading shard axis; `plans` are the per-shard SegSoftPlans
    (kept for their `xhit_drift_vox` refresh guards); `meta` carries the
    static config plus ONE global classed reduction over all shards'
    table rows for the expand VJP.
    """
    n = soft_plan.spec.n
    shards = _split_soft_buckets(soft_plan, n_shards)
    plans = []
    for s in range(n_shards):
        rows = [
            (window, None, None, None,
             jnp.asarray(syp[s]), jnp.asarray(szp[s]), jnp.asarray(fip[s]))
            for (window, syp, szp, fip) in shards
        ]
        plans.append(SegSoftPlan(_ShardBuckets(soft_plan, rows), coords,
                                 tc=tc, tb_sub=tb_sub, tbl=tbl, tz=tz))

    num_tiles = (n * n) // tc
    dummy_tile = num_tiles            # the extra_tiles=1 masked tile row
    b_max = max(p.num_batches for p in plans)
    num_faces = plans[0].num_faces

    def pad_plan(p):
        pad_b = b_max - p.num_batches
        cells_b = np.concatenate(
            [np.asarray(p.cells_b),
             np.full((pad_b, tb_sub, TB_LANE), -1, np.int32)])
        tblidx_b = np.concatenate(
            [np.asarray(p.tblidx_b),
             np.zeros((pad_b, tb_sub, TB_LANE), np.int32)])
        batch_tile = np.concatenate(
            [p.batch_tile, np.full((pad_b,), dummy_tile, np.int32)])
        batch_p0 = np.concatenate(
            [p.batch_panel, np.zeros((pad_b,), np.int32)])
        flags = np.concatenate(
            [p.flags, np.full((pad_b,), FLAG_FIRST | FLAG_LAST, np.int32)])
        tface = np.concatenate(
            [p.table_face_flat, np.full((pad_b * tbl,), -1, np.int32)])
        pad_row = np.zeros((1,) + np.asarray(p.mask_a_d).shape[1:], bool)
        return dict(
            cells_b=cells_b, tblidx_b=tblidx_b, batch_tile=batch_tile,
            batch_p0=batch_p0, flags=flags, table_face=tface,
            mask_a=np.concatenate([np.asarray(p.mask_a_d), pad_row]),
            mask_b=np.concatenate([np.asarray(p.mask_b_d), pad_row]),
            mask_c=np.concatenate(
                [np.asarray(p.mask_c_d),
                 np.zeros((1,) + np.asarray(p.mask_c_d).shape[1:], bool)]),
        )

    padded = [pad_plan(p) for p in plans]
    stacked_np = {k: np.stack([d[k] for d in padded]) for k in padded[0]}
    tface_all = stacked_np.pop("table_face")          # (S, b_max*tbl)
    fidx = np.where(tface_all < 0, num_faces, tface_all).astype(np.int32)
    expand_cls, expand_inv = _build_classed_reduction(
        tface_all.reshape(-1), num_faces)
    faces_np = np.asarray(soft_plan.faces_array).reshape(-1)
    vert_cls, vert_inv = _build_classed_reduction(
        faces_np, int(faces_np.max(initial=-1)) + 1)

    stacked = {k: jnp.asarray(v) for k, v in stacked_np.items()}
    stacked["fidx"] = jnp.asarray(fidx)
    meta = dict(n=n, tc=tc, tb_sub=tb_sub, tbl=tbl, tz=tz, b_max=b_max,
                num_faces=num_faces, expand_cls=expand_cls,
                expand_inv=expand_inv, vert_cls=vert_cls,
                vert_inv=vert_inv)
    return stacked, plans, meta


def make_sharded_fit_seg(soft_plan, coords0, device_mesh: Mesh,
                         learning_rate: float = 1e-2,
                         tau_edge_frac: float = 0.25,
                         tau_x_frac: float = 0.5,
                         tc: int = 128, tb_sub: int = 4, tbl: int = 128,
                         tz: int = 8):
    """(init_fn, step_fn, loss_fn, plans) like `make_sharded_fit_fused`,
    with the segmented engine on each shard.  `coords0` are the
    coordinates the per-shard panel layouts are built against; the
    returned `plans` expose `xhit_drift_vox` for refresh decisions.
    `target_slab` must be sharded P('z', None, None)."""
    if tau_x_frac * 17.0 > MARGIN:
        raise ValueError(
            f"tau_x_frac={tau_x_frac} too wide for the segmented engine "
            f"(needs tau_x_frac <= {MARGIN / 17.0:.2f}); use "
            f"make_sharded_fit_fused for wider profiles")
    spec = soft_plan.spec
    n = spec.n
    dd, dz = device_mesh.shape["d"], device_mesh.shape["z"]
    n_shards = dd * dz
    if n % dz != 0:
        raise ValueError(f"N={n} must divide z axis {dz}")

    stacked, plans, meta = build_seg_shard_layouts(
        soft_plan, coords0, n_shards, tc=tc, tb_sub=tb_sub, tbl=tbl, tz=tz)
    faces_d = jnp.asarray(soft_plan.faces_array)
    vs = spec.voxel_size
    prm = (float(spec.origin[0]), float(spec.origin[1]),
           float(spec.origin[2]), float(vs),
           float(tau_edge_frac * vs * vs), float(tau_x_frac * vs))
    cfg = (n, tc, tb_sub, tbl, tz, meta["b_max"], prm, 1)  # extra tile

    shard_spec = NamedSharding(device_mesh, P(("d", "z")))
    layout_keys = ("batch_tile", "batch_p0", "flags", "cells_b",
                   "tblidx_b", "mask_a", "mask_b", "mask_c")
    # Layout arrays travel as jit ARGUMENTS (closure capture would embed
    # them as HLO literals — the soft_vox_fused module-note lesson).
    aux = dict(
        layout=tuple(jax.device_put(stacked[k], shard_spec)
                     for k in layout_keys),
        fidx_flat=stacked["fidx"].reshape(-1),   # (S * b_max * tbl,)
        faces=faces_d,
        expand_cls=meta["expand_cls"], expand_inv=meta["expand_inv"],
        vert_cls=meta["vert_cls"], vert_inv=meta["vert_inv"],
    )

    def shard_loss(tables, target_slab, batch_tile, batch_p0, flags,
                   cells_b, tblidx_b, mask_a, mask_b, mask_c):
        partial = _seg_accumulate(
            tables[0], batch_tile[0], batch_p0[0], flags[0], cells_b[0],
            tblidx_b[0], mask_a[0], mask_b[0], mask_c[0], cfg)
        slab_occ = jax.lax.psum_scatter(partial, "z", scatter_dimension=0,
                                        tiled=True)
        slab_occ = jax.lax.psum(slab_occ, "d")
        slab_occ = jnp.clip(slab_occ, 0.0, 1.0)
        inter = jnp.sum(slab_occ * target_slab)
        tot = jnp.sum(slab_occ) + jnp.sum(target_slab)
        inter = jax.lax.psum(inter, "z")
        tot = jax.lax.psum(tot, "z")
        return 1.0 - inter / (tot - inter + 1e-8)

    sharded_loss = jax.shard_map(
        shard_loss, mesh=device_mesh,
        in_specs=(P(("d", "z")), P("z", None, None))
        + tuple(P(("d", "z")) for _ in layout_keys),
        out_specs=P(),
        check_vma=False,
    )

    def _loss(coords, target_slab, a):
        # Replicated coefficient path; its VJP IS the vertex all-reduce.
        tri = _gather_tri(coords, a["faces"], a["vert_cls"],
                          a["vert_inv"])
        coeffs = jnp.concatenate(
            [triangle_coeffs(tri), jnp.zeros((1, NATTR), jnp.float32)])
        tables = _expand_rows(coeffs, a["fidx_flat"], a["expand_cls"],
                              a["expand_inv"])
        # NATTR-major for the kernels (see _seg_accumulate): 16-minor
        # pads 8x in HBM under pallas's default-layout requirement.
        tables = tables.reshape(
            n_shards, meta["b_max"], tbl, NATTR).transpose(0, 1, 3, 2)
        tables = jax.lax.with_sharding_constraint(
            tables, NamedSharding(device_mesh, P(("d", "z"))))
        return sharded_loss(tables, target_slab, *a["layout"])

    optimizer = optax.adam(learning_rate)

    @jax.jit
    def _step(coords, opt_state, target_slab, a):
        value, grads = jax.value_and_grad(_loss)(coords, target_slab, a)
        updates, opt_state = optimizer.update(grads, opt_state, coords)
        coords = optax.apply_updates(coords, updates)
        return coords, opt_state, value

    _loss_jit = jax.jit(_loss)  # hoisted: a per-call jax.jit(...) would
    # retrace+recompile the whole sharded program on every invocation

    def loss_fn(coords, target_slab):
        return _loss_jit(coords, target_slab, aux)

    def step_fn(coords, opt_state, target_slab):
        return _step(coords, opt_state, target_slab, aux)

    def init_fn(coords):
        coords = jnp.asarray(coords, jnp.float32)
        return coords, optimizer.init(coords)

    return init_fn, step_fn, loss_fn, plans
