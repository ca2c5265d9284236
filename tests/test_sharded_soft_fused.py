"""Sharded fit on the fused coefficient-table engine vs the unsharded
engine (8 virtual CPU devices, interpret-mode kernels)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.mesh.obj_io import import_mesh
    from voxtpu.ops.soft_vox import make_soft_plan
    from voxtpu.ops.vox import voxelize

    mesh = import_mesh("/root/reference/assets/sphere.obj")
    spec = GridSpec.fit(mesh.coords, 32)
    soft_plan = make_soft_plan(mesh, spec)
    target = voxelize(mesh, spec).to_dense().astype(np.float32)
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    device_mesh = Mesh(devices, ("d", "z"))
    target_slab = jax.device_put(
        np.asarray(target),
        NamedSharding(device_mesh, P("z", None, None)),
    )
    return mesh, spec, soft_plan, target, device_mesh, target_slab


def test_fused_sharded_loss_matches_unsharded(setup):
    import jax.numpy as jnp

    from voxtpu.models.fit import soft_iou_loss
    from voxtpu.ops.soft_vox_fused import FusedSoftPlan, soft_voxelize_fused
    from voxtpu.parallel.sharded_soft_fused import make_sharded_fit_fused

    mesh, spec, soft_plan, target, device_mesh, target_slab = setup
    init_fn, step_fn, loss_fn = make_sharded_fit_fused(
        soft_plan, device_mesh)
    coords, _ = init_fn(mesh.coords)
    l_sharded = float(loss_fn(coords, target_slab))

    plan = FusedSoftPlan(soft_plan)
    occ = soft_voxelize_fused(jnp.asarray(mesh.coords), plan)
    l_ref = float(soft_iou_loss(occ, jnp.asarray(target)))
    np.testing.assert_allclose(l_sharded, l_ref, rtol=2e-4)


def test_fused_sharded_step_improves(setup):
    from voxtpu.parallel.sharded_soft_fused import make_sharded_fit_fused

    mesh, spec, soft_plan, target, device_mesh, target_slab = setup
    init_fn, step_fn, loss_fn = make_sharded_fit_fused(
        soft_plan, device_mesh, learning_rate=5e-3)
    rng = np.random.default_rng(1)
    noisy = mesh.coords + rng.normal(0, 0.01, mesh.coords.shape).astype(
        np.float32)
    coords, opt_state = init_fn(noisy)
    l0 = float(loss_fn(coords, target_slab))
    for _ in range(3):
        coords, opt_state, value = step_fn(coords, opt_state, target_slab)
    assert float(loss_fn(coords, target_slab)) < l0
