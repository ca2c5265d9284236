"""Fused (tile, triangle) coefficient-table soft voxelizer vs the XLA
engine and finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.mesh.mesh import Mesh
from voxtpu.ops.soft_vox import make_soft_plan, soft_voxelize
from voxtpu.ops.soft_vox_fused import FusedSoftPlan, soft_voxelize_fused


def _generic(mesh, scale=1e-4, seed=0):
    """Jitter vertices off knife edges (exactly X-degenerate faces)."""
    rng = np.random.default_rng(seed)
    coords = mesh.coords + rng.normal(0, scale, mesh.coords.shape).astype(
        np.float32)
    return Mesh(name="generic", coords=coords, faces=mesh.faces,
                faces_normals=mesh.faces_normals)


@pytest.mark.parametrize("mesh_name", ["torus_mesh", "sphere_mesh"])
def test_fused_matches_xla_engine(mesh_name, request):
    mesh = _generic(request.getfixturevalue(mesh_name))
    spec = GridSpec.fit(mesh.coords, 32)
    sp = make_soft_plan(mesh, spec)
    fp = FusedSoftPlan(sp)
    coords = jnp.asarray(mesh.coords)
    a = np.asarray(soft_voxelize(coords, sp, clip=False))
    b = np.asarray(soft_voxelize_fused(coords, fp, clip=False))
    np.testing.assert_allclose(b, a, atol=2e-4)


def test_fused_gradients_match_xla(torus_mesh):
    # 1e-3 jitter: keeps every face clear of the X-degenerate knife
    # edge, where the 1/A amplification makes the two engines' (equal
    # within float32) x-hit planes diverge in their cotangents.
    mesh = _generic(torus_mesh, scale=1e-3)
    spec = GridSpec.fit(mesh.coords, 32)
    sp = make_soft_plan(mesh, spec)
    fp = FusedSoftPlan(sp)
    coords = jnp.asarray(mesh.coords)
    probe = jnp.asarray(
        np.random.default_rng(1).standard_normal((32, 32, 32)), jnp.float32)

    def lx(c):
        return jnp.sum(soft_voxelize(c, sp) * probe)

    def lf(c):
        # mode="highest": this is the strict ENGINE-equivalence check
        # (exact8's bf16_3x dots truncate the a_lo*b_lo term, a
        # legitimate ~1e-4 relative difference tested separately below).
        return jnp.sum(soft_voxelize_fused(c, fp, mode="highest") * probe)

    def l8(c):
        return jnp.sum(soft_voxelize_fused(c, fp) * probe)

    gx = np.asarray(jax.grad(lx)(coords))
    gf = np.asarray(jax.grad(lf)(coords))
    np.testing.assert_allclose(gf, gx, rtol=1e-3, atol=1e-4 * np.abs(gx).max())
    # exact8 vs highest: same gradients within the bf16_3x error budget.
    g8 = np.asarray(jax.grad(l8)(coords))
    np.testing.assert_allclose(g8, gf, rtol=5e-3, atol=1e-3 * np.abs(gf).max())


def test_fused_gradcheck_finite_differences():
    """Hand-derived in-kernel coefficient cotangents vs central
    differences on a small generic mesh."""
    # Same generic-position tet as test_soft_vox's gradcheck (a random
    # tet can have a near-X-degenerate face whose x-hit plane slope
    # makes central differences unstable at any usable eps).
    rng = np.random.default_rng(3)
    coords0 = np.array(
        [[0.1, 0.1, 0.1], [0.9, 0.15, 0.2], [0.2, 0.85, 0.15],
         [0.3, 0.3, 0.9]], np.float32)
    faces = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3], [0, 3, 2]], np.int32)
    mesh = Mesh(name="tet", coords=coords0, faces=faces, faces_normals=faces)
    spec = GridSpec(n=16, origin=(0.0, 0.0, 0.0), voxel_size=1.0 / 16)
    sp = make_soft_plan(mesh, spec, pad_window=4)
    fp = FusedSoftPlan(sp)
    probe = jnp.asarray(rng.random((16, 16, 16)).astype(np.float32))

    def loss(c):
        # wide taus + no clip: the same smooth regime the XLA engine's
        # gradcheck uses (sharp defaults make eps=1e-3 central
        # differences unreliable in float32)
        return jnp.sum(soft_voxelize_fused(c, fp, tau_edge_frac=1.0,
                                           tau_x_frac=1.0, clip=False)
                       * probe)

    g = np.asarray(jax.grad(loss)(jnp.asarray(coords0)))
    eps = 1e-3
    for (v, ax) in [(0, 0), (1, 1), (2, 2), (3, 0), (1, 2)]:
        cp = coords0.copy(); cp[v, ax] += eps
        cm = coords0.copy(); cm[v, ax] -= eps
        fd = (float(loss(jnp.asarray(cp))) - float(loss(jnp.asarray(cm)))) / (
            2 * eps)
        assert abs(fd - g[v, ax]) <= 2e-2 * max(1.0, abs(fd)), (
            v, ax, fd, g[v, ax])


def test_fused_batch_capacity_invariants(sphere_mesh):
    """Batches must respect both the slot and unique-triangle budgets."""
    spec = GridSpec.fit(sphere_mesh.coords, 32)
    sp = make_soft_plan(sphere_mesh, spec)
    fp = FusedSoftPlan(sp, tbl=64, tb_sub=2)
    tb = fp.tb_sub * 128
    for b in range(fp.num_batches):
        cells = fp.cells_b[b].reshape(-1)
        idx = fp.tblidx_b[b].reshape(-1)
        valid = cells >= 0
        assert valid.sum() <= tb
        assert (idx[valid] < fp.tbl).all()
        # slots of one batch all belong to the batch's tile
        assert (cells[valid] < fp.tc).all()


def test_voxelfit_fused_engine_improves(sphere_mesh):
    """The flagship fit loop must run (and descend) on the fused engine."""
    from voxtpu.models.fit import VoxelFit
    from voxtpu.ops.vox import voxelize

    spec = GridSpec.fit(sphere_mesh.coords, 32)
    target = voxelize(sphere_mesh, spec, backend="xla").to_dense().astype(
        jnp.float32)
    rng = np.random.default_rng(0)
    noisy = sphere_mesh.coords + rng.normal(
        0, 0.01, sphere_mesh.coords.shape).astype(np.float32)
    plan = make_soft_plan(
        Mesh(name="noisy", coords=noisy, faces=sphere_mesh.faces,
             faces_normals=sphere_mesh.faces_normals), spec, pad_window=2)
    fit = VoxelFit(plan, target, learning_rate=5e-3, engine="fused")
    state = fit.init(noisy)
    l0 = float(fit.loss(state.coords))
    for _ in range(5):
        state, metrics = fit.step(state)
    assert float(metrics["loss"]) < l0


def test_fused_grad_covers_unreferenced_vertices(sphere_mesh):
    """Gradient rows must match coords rows even when trailing vertices
    are referenced by no face (ADVICE r2 medium)."""
    from voxtpu.ops.soft_vox_fused import FusedSoftPlan, soft_voxelize_fused

    coords = np.concatenate(
        [sphere_mesh.coords,
         np.full((3, 3), 7.5, np.float32)], axis=0)  # 3 orphan vertices
    mesh = Mesh(name="orphans", coords=coords, faces=sphere_mesh.faces,
                faces_normals=sphere_mesh.faces_normals)
    spec = GridSpec.fit(sphere_mesh.coords, 16)
    fp = FusedSoftPlan(make_soft_plan(mesh, spec))

    def loss(c):
        return jnp.sum(soft_voxelize_fused(c, fp) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(coords)))
    assert g.shape == coords.shape
    np.testing.assert_array_equal(g[-3:], 0.0)
    assert np.abs(g[:-3]).sum() > 0
