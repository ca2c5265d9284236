"""Fused Pallas soft voxelizer vs the XLA soft path (interpret mode)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.mesh.obj_io import import_mesh
    from voxtpu.ops.soft_vox import make_soft_plan
    from voxtpu.ops.soft_vox_pallas import SoftPallasPlan

    mesh = import_mesh("/root/reference/assets/sphere.obj")
    spec = GridSpec.fit(mesh.coords, 32)
    soft_plan = make_soft_plan(mesh, spec)
    plan = SoftPallasPlan(soft_plan, tc=128, tb_sub=2)
    return mesh, spec, soft_plan, plan


def test_forward_matches_xla(setup):
    import jax.numpy as jnp

    from voxtpu.ops.soft_vox import soft_voxelize
    from voxtpu.ops.soft_vox_pallas import soft_voxelize_pallas

    mesh, spec, soft_plan, plan = setup
    coords = jnp.asarray(mesh.coords)
    ref = np.asarray(soft_voxelize(coords, soft_plan))
    got = np.asarray(soft_voxelize_pallas(coords, plan))
    # atol budget: the kernels' bf16_3x dots truncate the a_lo*b_lo
    # term (~2^-16 relative of O(1) operands -> ~1e-5 absolute).
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=3e-5)


def test_gradients_match_xla(setup):
    import jax
    import jax.numpy as jnp

    from voxtpu.ops.soft_vox import soft_voxelize
    from voxtpu.ops.soft_vox_pallas import soft_voxelize_pallas

    mesh, spec, soft_plan, plan = setup
    coords = jnp.asarray(mesh.coords)
    rng = np.random.default_rng(3)
    # Random linear functional of the grid -> dense, nontrivial cotangent.
    probe = jnp.asarray(rng.normal(size=(spec.n,) * 3).astype(np.float32))

    def loss_ref(c):
        return jnp.sum(soft_voxelize(c, soft_plan, clip=False) * probe)

    def loss_pal(c):
        return jnp.sum(soft_voxelize_pallas(c, plan, clip=False) * probe)

    v_ref, g_ref = jax.value_and_grad(loss_ref)(coords)
    v_pal, g_pal = jax.value_and_grad(loss_pal)(coords)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-4)
    # atol: bf16_3x truncation noise (see test_forward_matches_xla).
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-3, atol=1e-4
    )


def test_gradcheck_finite_differences():
    import jax
    import jax.numpy as jnp

    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.mesh.mesh import Mesh
    from voxtpu.ops.soft_vox import make_soft_plan
    from voxtpu.ops.soft_vox_pallas import SoftPallasPlan, soft_voxelize_pallas

    # Tetrahedron in generic position: no axis-aligned faces. The soft
    # winding formulation has a knife-edge at n_x == 0 (facing-sign
    # flip), which the icosphere sits exactly on — FD across it measures
    # the jump, not the gradient (see soft_vox.py docstring).
    coords_np = np.array(
        [[0.1, 0.1, 0.1], [0.9, 0.15, 0.2], [0.2, 0.85, 0.15],
         [0.3, 0.3, 0.9]], np.float32,
    )
    faces = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3], [0, 3, 2]], np.int32)
    mesh = Mesh(name="tet", coords=coords_np, faces=faces, faces_normals=faces)
    spec = GridSpec(n=32, origin=(0.0, 0.0, 0.0), voxel_size=1.0 / 32)
    plan = SoftPallasPlan(make_soft_plan(mesh, spec, pad_window=4), tb_sub=2)
    coords = jnp.asarray(coords_np)

    def loss(c):
        # Wide temperatures (float32 central differences need a smooth
        # landscape) and a mean-scale loss (a large sum buries the
        # eps-step change below float32 resolution).
        occ = soft_voxelize_pallas(c, plan, clip=False,
                                   tau_edge_frac=1.0, tau_x_frac=1.0)
        return jnp.mean(occ**2)

    g = jax.grad(loss)(coords)
    rng = np.random.default_rng(0)
    direction = rng.normal(size=coords.shape).astype(np.float32)
    direction /= np.linalg.norm(direction)
    eps = 1e-2
    f_plus = float(loss(coords + eps * direction))
    f_minus = float(loss(coords - eps * direction))
    fd = (f_plus - f_minus) / (2 * eps)
    analytic = float(jnp.vdot(g, jnp.asarray(direction)))
    assert abs(fd - analytic) <= 5e-2 * max(abs(fd), abs(analytic), 1e-4), (
        f"fd={fd} analytic={analytic}"
    )


def test_soft_pallas_plan_rejects_hard_plan(sphere_mesh):
    """A hard FragmentPlan (no face indices) must be rejected at build
    time, not die with IndexError at call time (review find)."""
    import pytest

    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.ops.soft_vox_pallas import SoftPallasPlan
    from voxtpu.ops.vox import FragmentPlan

    spec = GridSpec.fit(sphere_mesh.coords, 32)
    with pytest.raises(ValueError, match="make_soft_plan"):
        SoftPallasPlan(FragmentPlan(sphere_mesh, spec))
