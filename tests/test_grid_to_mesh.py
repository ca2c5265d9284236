"""Grid->mesh exporters: geometric invariants."""

import numpy as np

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.mesh.grid_to_mesh import (
    sdf_to_rgb,
    voxels_grid_to_mesh,
    voxels_grid_to_mesh_compressed,
    voxels_grid_to_point_cloud,
)


def _single_voxel(n=8):
    occ = np.zeros((n, n, n), bool)
    occ[2, 3, 4] = True
    return occ, GridSpec(n=n, origin=(0.0, 0.0, 0.0), voxel_size=0.5)


def test_compressed_single_voxel_is_cube():
    occ, spec = _single_voxel()
    m = voxels_grid_to_mesh_compressed(occ, spec)
    assert m.num_vertices == 8
    assert m.num_faces == 12
    # vertex coordinates are the cube corners of voxel (x=4, y=3, z=2)
    expect_min = np.array([4, 3, 2]) * 0.5
    np.testing.assert_allclose(m.coords.min(0), expect_min)
    np.testing.assert_allclose(m.coords.max(0), expect_min + 0.5)
    m.validate()


def test_compressed_two_adjacent_voxels_share_face():
    n = 8
    occ = np.zeros((n, n, n), bool)
    occ[2, 3, 4] = True
    occ[2, 3, 5] = True  # +x neighbor
    spec = GridSpec(n=n, origin=(0, 0, 0), voxel_size=1.0)
    m = voxels_grid_to_mesh_compressed(occ, spec)
    # 2x1x1 box: 12 lattice vertices, 10 quads = 20 triangles
    assert m.num_vertices == 12
    assert m.num_faces == 20


def test_compressed_watertight_closed_surface():
    """Every edge of the boundary surface must be shared by exactly 2 tris."""
    rng = np.random.default_rng(0)
    occ = rng.random((16, 16, 16)) < 0.3
    spec = GridSpec(n=16, origin=(0, 0, 0), voxel_size=1.0)
    m = voxels_grid_to_mesh_compressed(occ, spec)
    edges = {}
    for tri in m.faces:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            key = tuple(sorted((tri[a], tri[b])))
            edges[key] = edges.get(key, 0) + 1
    counts = np.array(list(edges.values()))
    # voxel surfaces can have "non-manifold" edges where 4 faces meet
    assert set(np.unique(counts)) <= {2, 4}


def test_compressed_outward_winding():
    occ, spec = _single_voxel()
    m = voxels_grid_to_mesh_compressed(occ, spec)
    center = m.coords.mean(0)
    v = m.coords[m.faces]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    outward = ((v.mean(1) - center) * n).sum(1)
    assert (outward > 0).all(), "all faces must wind outward"


def test_cube_mesh_and_point_cloud():
    occ, spec = _single_voxel()
    sdf = np.zeros(occ.shape, np.float32)
    m = voxels_grid_to_mesh(occ, sdf, spec)
    assert m.num_vertices == 8
    assert m.num_faces == 12
    pc = voxels_grid_to_point_cloud(occ, sdf, spec)
    assert pc.num_vertices == 1
    np.testing.assert_allclose(pc.coords[0], np.array([4, 3, 2]) * 0.5 + 0.25)


def test_cube_mesh_skips_infinite_sdf():
    occ, spec = _single_voxel()
    sdf = np.full(occ.shape, np.inf, np.float32)
    m = voxels_grid_to_mesh(occ, sdf, spec)
    assert m.num_vertices == 0


def test_sdf_to_rgb_ramp():
    rgb = sdf_to_rgb(np.array([0.0, 1.0]), 1.0)
    np.testing.assert_allclose(rgb[0], [0, 0, 1])  # near -> blue
    np.testing.assert_allclose(rgb[1], [1, 0, 0])  # far -> red
