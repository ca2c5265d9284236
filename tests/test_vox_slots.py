"""Static-slot total pipeline vs the XLA voxelizer (bit-parity) and its
layout invariants."""

import numpy as np
import pytest

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.mesh.mesh import Mesh
from voxtpu.ops.vox import voxelize
from voxtpu.ops.vox_slots import SlotVoxPipeline


@pytest.mark.parametrize("fixture,n", [
    ("bunny_mesh", 64),
    ("torus_mesh", 64),
    ("sphere_mesh", 96),
    ("d20_mesh", 32),
])
def test_slot_pipeline_bit_parity(request, fixture, n):
    mesh = request.getfixturevalue(fixture)
    spec = GridSpec.fit(mesh.coords, n)
    ref = np.asarray(voxelize(mesh, spec, backend="xla").words)
    pipe = SlotVoxPipeline(mesh, spec)
    got = np.asarray(pipe.words())
    np.testing.assert_array_equal(got, ref)


def test_slot_pipeline_layout_invariants(bunny_mesh):
    spec = GridSpec.fit(bunny_mesh.coords, 64)
    pipe = SlotVoxPipeline(bunny_mesh, spec)
    n, tc = spec.n, pipe.tc
    bt = np.asarray(pipe.batch_tile)
    local = np.asarray(pipe.local).reshape(pipe.num_batches, -1)
    flags = np.asarray(pipe.flags)
    # Batches are tile-sorted; each active tile opens and closes once.
    assert (np.diff(bt) >= 0).all()
    starts = np.concatenate([[True], bt[1:] != bt[:-1]])
    ends = np.concatenate([bt[1:] != bt[:-1], [True]])
    np.testing.assert_array_equal((flags & 1) != 0, starts)
    np.testing.assert_array_equal((flags & 2) != 0, ends)
    # Slots: locals within the tile or -1 pads.
    assert ((local >= -1) & (local < tc)).all()
    assert pipe.num_candidates <= pipe.num_slots
    # Every candidate of the exact-rect build survives into a slot.
    assert (local >= 0).sum() == pipe.num_candidates
    # tile_mask marks exactly the tiles that own batches.
    mask = np.asarray(pipe.tile_mask)
    assert set(np.nonzero(mask)[0]) == set(bt.tolist())


def test_slot_pipeline_empty_mesh():
    mesh = Mesh(name="empty",
                coords=np.zeros((3, 3), np.float32),
                faces=np.zeros((0, 3), np.int32),
                faces_normals=np.zeros((0, 3), np.int32))
    spec = GridSpec(n=32, origin=(0.0, 0.0, 0.0), voxel_size=1.0)
    pipe = SlotVoxPipeline(mesh, spec)
    assert pipe.num_candidates == 0
    got = np.asarray(pipe.words())
    assert got.shape == (32, 32, 1)
    assert (got == 0).all()


def test_slot_pipeline_rejects_bad_n(bunny_mesh):
    spec = GridSpec(n=48, origin=(0.0, 0.0, 0.0), voxel_size=1.0)
    with pytest.raises(ValueError, match="N % 32"):
        SlotVoxPipeline(bunny_mesh, spec)


def test_slot_pipeline_rejects_segmented_fill(bunny_mesh):
    """Slots are grouped by tile only, so a seg < n fill would silently
    drop fragments entering at x >= seg (code-review find): reject."""
    spec = GridSpec(n=64, origin=(0.0, 0.0, 0.0), voxel_size=1.0)
    with pytest.raises(ValueError, match="whole-axis"):
        SlotVoxPipeline(bunny_mesh, spec, seg=32)
