"""Pallas tiled voxelizer vs oracle (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.ops.reference import voxelize_ref
from voxtpu.ops.vox import voxelize


@pytest.mark.parametrize("mesh_name", ["sphere_mesh", "d20_mesh"])
def test_pallas_matches_oracle(mesh_name, request):
    mesh = request.getfixturevalue(mesh_name)
    spec = GridSpec.fit(mesh.coords, 32)
    ref = voxelize_ref(mesh, spec)
    got = np.asarray(voxelize(mesh, spec, backend="pallas").to_dense())
    np.testing.assert_array_equal(got, ref)


def test_pallas_matches_xla_torus(torus_mesh):
    spec = GridSpec.fit(torus_mesh.coords, 64)
    xla = np.asarray(voxelize(torus_mesh, spec, backend="xla").words)
    got = np.asarray(voxelize(torus_mesh, spec, backend="pallas").words)
    np.testing.assert_array_equal(got, xla)


def test_pallas_empty_mesh():
    from voxtpu.mesh.mesh import Mesh

    spec = GridSpec(n=32, origin=(0, 0, 0), voxel_size=1 / 32)
    got = np.asarray(voxelize(Mesh(name="empty"), spec, backend="pallas").to_dense())
    assert got.sum() == 0


def test_pallas_plan_reuse(sphere_mesh):
    from voxtpu.ops.vox_pallas import PallasVoxPlan, voxelize_pallas

    spec = GridSpec.fit(sphere_mesh.coords, 32)
    plan = PallasVoxPlan(sphere_mesh, spec)
    a = np.asarray(voxelize_pallas(sphere_mesh, spec, plan=plan).words)
    b = np.asarray(voxelize_pallas(sphere_mesh, spec, plan=plan).words)
    np.testing.assert_array_equal(a, b)
    assert plan.num_batches >= 1


def test_pallas_multi_segment_matches_xla(sphere_mesh):
    """Force seg < n so the X-segmented fill + carry path is exercised
    (the default is one whole-axis segment, so tests never hit it)."""
    from voxtpu.ops.vox_pallas import PallasVoxPlan, voxelize_pallas

    spec = GridSpec.fit(sphere_mesh.coords, 64)
    ref = np.asarray(voxelize(sphere_mesh, spec, backend="xla").to_dense())
    for seg in (32, 64):
        plan = PallasVoxPlan(sphere_mesh, spec, seg=seg)
        got = np.asarray(voxelize_pallas(sphere_mesh, spec, plan=plan).to_dense())
        np.testing.assert_array_equal(got, ref, err_msg=f"seg={seg}")


def test_pallas_seg_must_divide_n(sphere_mesh):
    from voxtpu.ops.vox_pallas import PallasVoxPlan

    spec = GridSpec.fit(sphere_mesh.coords, 64)
    with pytest.raises(ValueError, match="must divide"):
        PallasVoxPlan(sphere_mesh, spec, seg=48)


def test_workqueue_matches_xla(sphere_mesh):
    """Streamed work-queue kernel (interpret mode) vs the XLA backend."""
    from voxtpu.ops.vox_pallas_wq import WorkQueueVoxPlan, voxelize_wq

    spec = GridSpec.fit(sphere_mesh.coords, 64)
    ref = np.asarray(voxelize(sphere_mesh, spec, backend="xla").to_dense())
    for seg in (64, 32):
        plan = WorkQueueVoxPlan(sphere_mesh, spec, seg=seg)
        got = np.asarray(voxelize_wq(sphere_mesh, spec, plan=plan).to_dense())
        np.testing.assert_array_equal(got, ref, err_msg=f"seg={seg}")


@pytest.mark.parametrize("mesh_name", ["sphere_mesh", "torus_mesh", "d20_mesh"])
def test_word_event_matches_oracle(mesh_name, request):
    """The word-event kernel (large-N path) must equal the oracle
    bit-for-bit at any size."""
    from voxtpu.ops.vox_pallas_we import voxelize_pallas_we

    mesh = request.getfixturevalue(mesh_name)
    spec = GridSpec.fit(mesh.coords, 32)
    ref = voxelize_ref(mesh, spec)
    got = np.asarray(voxelize_pallas_we(mesh, spec).to_dense())
    np.testing.assert_array_equal(got, ref)


def test_word_event_matches_xla_bunny(bunny_mesh):
    from voxtpu.ops.vox_pallas_we import voxelize_pallas_we

    spec = GridSpec.fit(bunny_mesh.coords, 64)
    ref = np.asarray(voxelize(bunny_mesh, spec, backend="xla").words)
    got = np.asarray(voxelize_pallas_we(bunny_mesh, spec).words)
    np.testing.assert_array_equal(got, ref)


def test_word_event_nonpow2_grid(sphere_mesh):
    """N = 96: num_tiles (72) is not divisible by the lane-limit group
    (42), so `_group_factor` must round down to a divisor (36) — the
    round-3 lane packing crashed here until it did (code-review find)."""
    from voxtpu.ops.vox_pallas_we import voxelize_pallas_we

    spec = GridSpec.fit(sphere_mesh.coords, 96)
    ref = np.asarray(voxelize(sphere_mesh, spec, backend="xla").words)
    got = np.asarray(voxelize_pallas_we(sphere_mesh, spec).words)
    np.testing.assert_array_equal(got, ref)


def test_word_event_rejects_huge_n(sphere_mesh):
    """The packed uint32 sort key cell * num_words + word aliases past
    N = 4096; the plan must refuse rather than corrupt silently."""
    from voxtpu.ops.vox_pallas_we import WordEventVoxPlan

    spec = GridSpec(n=8192, origin=(0, 0, 0), voxel_size=0.001)
    with pytest.raises(ValueError, match="4096"):
        WordEventVoxPlan(sphere_mesh, spec)


def test_word_event_empty_mesh():
    from voxtpu.mesh.mesh import Mesh
    from voxtpu.ops.vox_pallas_we import voxelize_pallas_we

    mesh = Mesh(name="empty", coords=np.zeros((0, 3), np.float32),
                faces=np.zeros((0, 3), np.int32),
                faces_normals=np.zeros((0, 3), np.int32))
    spec = GridSpec(n=32, origin=(0, 0, 0), voxel_size=0.1)
    grid = voxelize_pallas_we(mesh, spec)
    assert grid.count() == 0


def test_word_event_odd_tc(sphere_mesh):
    """tc != 128 layouts (multi-batch tiles, CLI -b) stay exact."""
    from voxtpu.ops.vox_pallas_we import WordEventVoxPlan, voxelize_pallas_we

    spec = GridSpec.fit(sphere_mesh.coords, 32)
    ref = np.asarray(voxelize(sphere_mesh, spec, backend="xla").words)
    plan = WordEventVoxPlan(sphere_mesh, spec, tc=64, tb_sub=1)
    got = np.asarray(voxelize_pallas_we(sphere_mesh, spec, plan=plan).words)
    np.testing.assert_array_equal(got, ref)


def test_pallas_dispatch_accepts_we_plan(sphere_mesh):
    """voxelize(backend='pallas') must route WordEventVoxPlan to the
    word-event kernel (the N >= 2048 auto-dispatch path)."""
    from voxtpu.ops.vox_pallas_we import WordEventVoxPlan

    spec = GridSpec.fit(sphere_mesh.coords, 32)
    plan = WordEventVoxPlan(sphere_mesh, spec)
    ref = np.asarray(voxelize(sphere_mesh, spec, backend="xla").words)
    got = np.asarray(
        voxelize(sphere_mesh, spec, backend="pallas", plan=plan).words
    )
    np.testing.assert_array_equal(got, ref)


def test_device_total_pipeline_matches_xla(sphere_mesh):
    """The single-jit total pipeline (device-side batch layout) must be
    bit-identical to the per-stage path."""
    from voxtpu.ops.vox_pallas_we import DeviceVoxPipeline

    spec = GridSpec.fit(sphere_mesh.coords, 64)
    ref = np.asarray(voxelize(sphere_mesh, spec, backend="xla").words)
    pipe = DeviceVoxPipeline(sphere_mesh, spec)
    grid = pipe()
    np.testing.assert_array_equal(np.asarray(grid.words), ref)
    # Exact capacity: fixed coords -> zero overflow, zero spare batches.
    _, overflow = pipe.words()
    assert int(overflow) == 0


def test_device_total_pipeline_empty_mesh():
    from voxtpu.mesh.mesh import Mesh
    from voxtpu.ops.vox_pallas_we import DeviceVoxPipeline

    spec = GridSpec(n=32, origin=(0, 0, 0), voxel_size=1 / 32)
    grid = DeviceVoxPipeline(Mesh(name="empty"), spec)()
    assert np.asarray(grid.to_dense()).sum() == 0


def test_device_total_pipeline_torus_128(torus_mesh):
    """128^3 exercises group packing (nw=4, G=32) with multiple
    supertiles and slack capacity."""
    from voxtpu.ops.vox_pallas_we import DeviceVoxPipeline

    spec = GridSpec.fit(torus_mesh.coords, 128)
    ref = np.asarray(voxelize(torus_mesh, spec, backend="xla").words)
    pipe = DeviceVoxPipeline(torus_mesh, spec, slack=1.5)
    got = np.asarray(pipe().words)
    np.testing.assert_array_equal(got, ref)


def test_device_batches_overflow_guard():
    """Capacity overflow must be reported, never silently truncated."""
    import jax.numpy as jnp

    from voxtpu.ops.vox_pallas_we import _device_batches

    # 2 supertiles, 600 and 100 events; tb=512 -> 2+1 = 3 true batches.
    bounds = jnp.asarray([0, 600, 700], jnp.int32)
    bt, flags, starts, ends, overflow = _device_batches(
        bounds, num_super=2, tb=512, b_max=2)
    assert int(overflow) == 1
    bt, flags, starts, ends, overflow = _device_batches(
        bounds, num_super=2, tb=512, b_max=3)
    assert int(overflow) == 0
    bt = np.asarray(bt)
    assert list(bt) == [0, 0, 1]
    f = np.asarray(flags)
    from voxtpu.ops.vox_pallas import FLAG_FIRST, FLAG_LAST
    assert f[0] == FLAG_FIRST and f[1] == FLAG_LAST
    assert f[2] == FLAG_FIRST | FLAG_LAST
    assert list(np.asarray(starts)) == [0, 512, 600]
    assert list(np.asarray(ends)) == [512, 600, 700]


def test_device_pipeline_overflow_raises(sphere_mesh, monkeypatch):
    from voxtpu.ops.vox_pallas_we import DeviceVoxPipeline

    spec = GridSpec.fit(sphere_mesh.coords, 32)
    pipe = DeviceVoxPipeline(sphere_mesh, spec)
    pipe.b_max = max(1, pipe.b_max // 2)  # force undercapacity
    with pytest.raises(RuntimeError, match="capacity"):
        pipe()


def test_pad_granular_bounds():
    from voxtpu.ops.vox import _next_pow2, _pad_granular

    for c in (1, 7, 255, 256, 257, 1000, 5000, 1 << 20, (1 << 20) + 1):
        p = _pad_granular(c)
        assert p >= c
        # waste < one granule = next_pow2(c)/8 (<= 25% of c, typ. 12.5%)
        assert p - c < max(256, _next_pow2(c) // 8)


def test_block_compact_preserves_valid_entries():
    """Compaction moves every valid entry ahead of a sort; row-granular
    padding may interleave sentinels but must lose nothing."""
    import jax.numpy as jnp

    from voxtpu.ops.vox_pallas_we import _ROW, _SENT, _block_compact

    rng = np.random.default_rng(0)
    f = 4096
    keys = rng.integers(0, 1 << 20, f).astype(np.uint32)
    vals = rng.integers(0, 1 << 30, f).astype(np.uint32)
    invalid = rng.random(f) < 0.9  # ~10% survivors, like real emits
    keys[invalid] = np.uint32(0xFFFFFFFF)
    vals[invalid] = 0

    nvalid = int((~invalid).sum())
    cap = ((nvalid * 2 + _ROW - 1) // _ROW) * _ROW
    (ck, cv), ovf = _block_compact(
        (jnp.asarray(keys), jnp.asarray(vals)), cap=cap)
    assert int(ovf) == 0
    ck, cv = np.asarray(ck), np.asarray(cv)
    keep = ck != 0xFFFFFFFF
    assert keep.sum() == nvalid
    # Same multiset of (key, value) pairs as the valid inputs.
    got = sorted(zip(ck[keep].tolist(), cv[keep].tolist()))
    want = sorted(zip(keys[~invalid].tolist(), vals[~invalid].tolist()))
    assert got == want


def test_block_compact_overflow_reported():
    import jax.numpy as jnp

    from voxtpu.ops.vox_pallas_we import _ROW, _block_compact

    keys = np.arange(1024, dtype=np.uint32)  # all valid
    (ck,), ovf = _block_compact((jnp.asarray(keys),), cap=512)
    assert int(ovf) == (1024 - 512) // _ROW


def test_capped_event_build_matches_uncapped(sphere_mesh):
    """The cap_f fast path must produce the same sorted key prefix (and
    so the same grid) as the uncapped plan-build path."""
    import jax.numpy as jnp

    from voxtpu.ops.vox import FragmentPlan, fragments_from_plan
    from voxtpu.ops.vox_pallas_we import (_compact_stats, _ROW,
                                          _sorted_keys_from_fragments)

    spec = GridSpec.fit(sphere_mesh.coords, 64)
    plan = FragmentPlan(sphere_mesh, spec)
    cells, xs = fragments_from_plan(plan)
    nvalid, rows = _compact_stats(cells, n=spec.n)
    cap = max(int(rows) * _ROW * 2, 256)
    k0, m0, _ = _sorted_keys_from_fragments(cells, xs, n=spec.n, cap_f=None)
    k1, m1, ovf = _sorted_keys_from_fragments(cells, xs, n=spec.n, cap_f=cap)
    assert int(ovf) == 0
    nv = int(nvalid)
    np.testing.assert_array_equal(np.asarray(k0)[:nv], np.asarray(k1)[:nv])
    np.testing.assert_array_equal(np.asarray(m0)[:nv], np.asarray(m1)[:nv])
