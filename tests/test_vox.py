"""Voxelization: XLA backend vs NumPy oracle, plus geometric invariants."""

import numpy as np
import pytest

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.ops.reference import voxelize_ref
from voxtpu.ops.vox import voxelize


def _dense(mesh, n, backend):
    spec = GridSpec.fit(mesh.coords, n)
    grid = voxelize(mesh, spec, backend=backend)
    return np.asarray(grid.to_dense()), spec


@pytest.mark.parametrize("n", [32, 64])
def test_xla_matches_oracle_sphere(sphere_mesh, n):
    spec = GridSpec.fit(sphere_mesh.coords, n)
    ref = voxelize_ref(sphere_mesh, spec)
    got = np.asarray(voxelize(sphere_mesh, spec, backend="xla").to_dense())
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("mesh_name", ["torus_mesh", "d20_mesh"])
def test_xla_matches_oracle_assets(mesh_name, request):
    mesh = request.getfixturevalue(mesh_name)
    spec = GridSpec.fit(mesh.coords, 32)
    ref = voxelize_ref(mesh, spec)
    got = np.asarray(voxelize(mesh, spec, backend="xla").to_dense())
    np.testing.assert_array_equal(got, ref)


def test_xla_matches_oracle_bunny64(bunny_mesh):
    spec = GridSpec.fit(bunny_mesh.coords, 64)
    ref = voxelize_ref(bunny_mesh, spec)
    got = np.asarray(voxelize(bunny_mesh, spec, backend="xla").to_dense())
    np.testing.assert_array_equal(got, ref)


def test_sphere_solid_and_contiguous(sphere_mesh):
    """Solid fill invariant: every X column of a voxelized sphere is one
    contiguous run, and the volume approximates (4/3) pi r^3."""
    occ, spec = _dense(sphere_mesh, 64, "xla")
    n = spec.n
    runs_ok = True
    for z in range(n):
        cols = occ[z]  # (y, x)
        d = np.diff(cols.astype(np.int8), axis=1)
        # one contiguous run <=> at most one +1 and one -1 transition
        rises = (d == 1).sum(axis=1)
        falls = (d == -1).sum(axis=1)
        if (rises > 1).any() or (falls > 1).any():
            runs_ok = False
    assert runs_ok

    vol_vox = occ.sum() * spec.voxel_size**3
    side, (mins, maxs) = (
        (maxs_mins := None),
        (None, None),
    ) if False else (None, (None, None))
    ext = sphere_mesh.coords.max(0) - sphere_mesh.coords.min(0)
    r = float(ext[0]) / 2
    vol_true = 4 / 3 * np.pi * r**3
    assert abs(vol_vox - vol_true) / vol_true < 0.1


def test_empty_mesh():
    from voxtpu.mesh.mesh import Mesh

    mesh = Mesh(name="empty")
    spec = GridSpec(n=32, origin=(0, 0, 0), voxel_size=1 / 32)
    occ = np.asarray(voxelize(mesh, spec, backend="xla").to_dense())
    assert occ.sum() == 0


def test_translated_grid_origin(sphere_mesh):
    """Voxelization must honor a non-zero world origin."""
    mesh = sphere_mesh
    spec = GridSpec.fit(mesh.coords, 32)
    ref = voxelize_ref(mesh, spec)
    # Shift both mesh and origin: identical occupancy.
    from voxtpu.mesh.mesh import Mesh

    shifted = Mesh(
        name="s",
        coords=mesh.coords + np.float32(3.5),
        normals=mesh.normals,
        colors=mesh.colors,
        faces=mesh.faces,
        faces_normals=mesh.faces_normals,
    )
    spec2 = GridSpec(
        n=32,
        origin=tuple(np.float32(o) + np.float32(3.5) for o in spec.origin),
        voxel_size=spec.voxel_size,
    )
    got = np.asarray(voxelize(shifted, spec2, backend="xla").to_dense())
    # Allow tiny deviations from float re-rounding of shifted coordinates.
    assert (got ^ ref).sum() <= got.sum() * 0.01


def test_voxelize_rejects_unpacked_n(sphere_mesh):
    """Packed grids need N % 32 == 0; n=48 used to silently build a
    1-word grid that truncated columns 32..47."""
    import pytest

    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.ops.vox import voxelize

    spec = GridSpec.fit(sphere_mesh.coords, 48)
    with pytest.raises(ValueError, match="N % 32"):
        voxelize(sphere_mesh, spec, backend="xla")
