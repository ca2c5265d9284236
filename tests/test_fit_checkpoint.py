"""Checkpoint/resume for fitting runs (round-3 aux subsystem; no
reference analog — SURVEY.md §5 lists checkpointing as absent)."""

import jax.numpy as jnp
import numpy as np

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.mesh.mesh import Mesh
from voxtpu.models.fit import VoxelFit
from voxtpu.ops.soft_vox import make_soft_plan
from voxtpu.ops.vox import voxelize


def _make_fit(sphere_mesh, coords):
    spec = GridSpec.fit(sphere_mesh.coords, 32)
    target = voxelize(sphere_mesh, spec, backend="xla").to_dense().astype(
        jnp.float32)
    plan = make_soft_plan(
        Mesh(name="noisy", coords=coords, faces=sphere_mesh.faces,
             faces_normals=sphere_mesh.faces_normals), spec, pad_window=2)
    return VoxelFit(plan, target, learning_rate=5e-3, refresh_every=0)


def test_checkpoint_roundtrip_resumes_bit_identically(sphere_mesh, tmp_path):
    rng = np.random.default_rng(0)
    noisy = sphere_mesh.coords + rng.normal(
        0, 0.01, sphere_mesh.coords.shape).astype(np.float32)

    fit = _make_fit(sphere_mesh, noisy)
    state = fit.init(noisy)
    for _ in range(3):
        state, _ = fit.step(state)
    ckpt = tmp_path / "fit.npz"
    fit.save_checkpoint(ckpt, state)
    # Continue the original run 2 more steps.
    cont = state
    for _ in range(2):
        cont, _ = fit.step(cont)

    # Fresh fit (same config), resumed from the checkpoint.
    fit2 = _make_fit(sphere_mesh, noisy)
    restored = fit2.load_checkpoint(ckpt)
    np.testing.assert_array_equal(np.asarray(restored.coords),
                                  np.asarray(state.coords))
    assert int(restored.step) == int(state.step)
    for _ in range(2):
        restored, _ = fit2.step(restored)
    np.testing.assert_array_equal(np.asarray(restored.coords),
                                  np.asarray(cont.coords))


def test_checkpoint_refreshes_stale_plan(sphere_mesh, tmp_path):
    rng = np.random.default_rng(1)
    noisy = sphere_mesh.coords + rng.normal(
        0, 0.01, sphere_mesh.coords.shape).astype(np.float32)
    fit = _make_fit(sphere_mesh, noisy)
    state = fit.init(noisy)
    # Fake heavy drift: checkpoint coordinates far from the plan's.
    far = type(state)(coords=state.coords + 0.5, opt_state=state.opt_state,
                      step=state.step)
    ckpt = tmp_path / "far.npz"
    fit.save_checkpoint(ckpt, far)

    fit2 = _make_fit(sphere_mesh, noisy)
    before = fit2.refresh_count
    fit2.load_checkpoint(ckpt)
    assert fit2.refresh_count == before + 1


def test_checkpoint_into_different_plan_refreshes(sphere_mesh, tmp_path):
    """Resuming into a fit whose plan was built at DIFFERENT coordinates
    must refresh even when the restored coords sit close to the
    checkpoint's own plan (the guard compares against THIS fit's plan,
    not the checkpoint's fingerprint — code-review find)."""
    rng = np.random.default_rng(2)
    coords_a = sphere_mesh.coords + rng.normal(
        0, 0.005, sphere_mesh.coords.shape).astype(np.float32)
    fit_a = _make_fit(sphere_mesh, coords_a)
    state = fit_a.init(coords_a)
    state, _ = fit_a.step(state)
    ckpt = tmp_path / "cross.npz"
    fit_a.save_checkpoint(ckpt, state)

    # Plan built at materially different coordinates.
    coords_b = coords_a + np.float32(0.3)
    fit_b = _make_fit(sphere_mesh, coords_b)
    before = fit_b.refresh_count
    restored = fit_b.load_checkpoint(ckpt)
    assert fit_b.refresh_count == before + 1
    # After the refresh, the fit's plan coords track the restored state.
    assert float(fit_b.drift_voxels(restored.coords)) == 0.0
