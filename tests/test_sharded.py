"""Multi-device (8 fake CPU devices): sharded ops match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.ops.jfa import jfa
from voxtpu.ops.vox import voxelize


def _mesh(dd, dz):
    devs = np.asarray(jax.devices()[: dd * dz]).reshape(dd, dz)
    return Mesh(devs, ("d", "z"))


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2)])
@pytest.mark.parametrize("exchange", ["ring", "gather"])
def test_sharded_vox_matches_single(sphere_mesh, shape, exchange):
    from voxtpu.parallel.sharded_vox import voxelize_sharded

    spec = GridSpec.fit(sphere_mesh.coords, 32)
    single = np.asarray(voxelize(sphere_mesh, spec, backend="xla").words)
    sharded = np.asarray(
        voxelize_sharded(sphere_mesh, spec, _mesh(*shape),
                         exchange=exchange).words
    )
    np.testing.assert_array_equal(sharded, single)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_sharded_jfa_matches_single(shape):
    from voxtpu.parallel.sharded_jfa import jfa_sharded

    n = 32
    zz, yy, xx = np.indices((n, n, n))
    c = (n - 1) / 2
    occ = (zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2 <= (n * 0.35) ** 2
    spec = GridSpec(n=n, origin=(0.5, 0.0, -1.0), voxel_size=1.0 / n)
    single = np.asarray(jfa(jnp.asarray(occ), spec, backend="xla"))
    sharded = np.asarray(jfa_sharded(jnp.asarray(occ), spec, _mesh(*shape)))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-12)


def test_sharded_fit_step_improves(sphere_mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from voxtpu.ops.soft_vox import make_soft_plan
    from voxtpu.parallel.sharded_fit import make_sharded_fit

    spec = GridSpec.fit(sphere_mesh.coords, 32)
    target = voxelize(sphere_mesh, spec, backend="xla").to_dense().astype(jnp.float32)
    dmesh = _mesh(2, 4)
    plan = make_soft_plan(sphere_mesh, spec)
    init_fn, step_fn, loss_fn = make_sharded_fit(plan, dmesh,
                                                 learning_rate=1e-3)
    target_slab = jax.device_put(target, NamedSharding(dmesh, P("z", None, None)))
    coords, opt_state = init_fn(sphere_mesh.coords)
    losses = []
    for _ in range(3):
        coords, opt_state, loss = step_fn(coords, opt_state, target_slab)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] <= losses[0] + 1e-4


def test_sharded_fit_matches_unsharded_loss(sphere_mesh):
    """The sharded loss must equal the single-device soft loss."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from voxtpu.models.fit import soft_iou_loss
    from voxtpu.ops.soft_vox import make_soft_plan, soft_voxelize
    from voxtpu.parallel.sharded_fit import make_sharded_fit

    spec = GridSpec.fit(sphere_mesh.coords, 32)
    target = voxelize(sphere_mesh, spec, backend="xla").to_dense().astype(jnp.float32)
    dmesh = _mesh(2, 4)
    plan = make_soft_plan(sphere_mesh, spec)
    _, _, loss_fn = make_sharded_fit(plan, dmesh)
    target_slab = jax.device_put(target, NamedSharding(dmesh, P("z", None, None)))
    sharded_loss = float(loss_fn(jnp.asarray(sphere_mesh.coords), target_slab))

    occ = soft_voxelize(jnp.asarray(sphere_mesh.coords), plan)
    single_loss = float(soft_iou_loss(occ, target))
    assert abs(sharded_loss - single_loss) < 1e-4


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_sharded_jfa_wide_matches_single(shape):
    """Wide (hi, lo) encoding — the N > 1024 path — must match the
    single-device wide flood exactly, including seeds that cross device
    slabs (global-Z fields need no halo re-basing)."""
    from voxtpu.parallel.sharded_jfa import jfa_sharded

    n = 32
    zz, yy, xx = np.indices((n, n, n))
    c = (n - 1) / 2
    occ = (zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2 <= (n * 0.35) ** 2
    spec = GridSpec(n=n, origin=(0.5, 0.0, -1.0), voxel_size=1.0 / n)
    single = np.asarray(jfa(jnp.asarray(occ), spec, backend="xla",
                            encoding="wide"))
    sharded = np.asarray(jfa_sharded(jnp.asarray(occ), spec, _mesh(*shape),
                                     encoding="wide"))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-12)


def test_jfa_comm_volume_strided_vs_gathered(capsys):
    """The strided-ppermute early steps must cut per-step wire bytes by
    ~dz/2 vs the replaced all_gather path (VERDICT r2 missing #4);
    prints the 2048^3 slab-geometry comparison."""
    from voxtpu.parallel.sharded_jfa import comm_bytes_per_step

    n, dz = 2048, 8
    rows = []
    k = n // 2
    while k >= 1:
        before = comm_bytes_per_step(n, dz, "wide", k, gathered=True)
        after = comm_bytes_per_step(n, dz, "wide", k)
        assert after <= before
        if k >= n // dz:  # the early (cross-device) steps
            assert before / after == (dz - 1) / 2
        rows.append((k, before, after))
        k //= 2
    total_before = sum(r[1] for r in rows)
    total_after = sum(r[2] for r in rows)
    print(f"\nJFA comm per device, {n}^3 wide on {dz} devices:")
    for k, b, a in rows:
        print(f"  k={k:5d}  all_gather={b/2**30:7.2f} GiB  "
              f"strided={a/2**30:7.2f} GiB")
    print(f"  flood total: {total_before/2**30:.1f} -> "
          f"{total_after/2**30:.1f} GiB "
          f"({total_before/total_after:.1f}x less)")
    assert total_before / total_after > 2.0


def test_sharded_jfa_rejects_non_pow2_z_axis():
    """k >= slab strided fetches assume k is a whole slab multiple —
    only true for power-of-two z-axis sizes (review find: dz=6 would
    silently flood from the wrong slabs)."""
    from voxtpu.parallel.sharded_jfa import jfa_sharded

    n = 96
    devices = np.asarray(jax.devices()[:6]).reshape(1, 6)
    dmesh = Mesh(devices, ("d", "z"))
    occ = jnp.zeros((n, n, n), bool)
    spec = GridSpec(n=n, origin=(0.0, 0.0, 0.0), voxel_size=1.0)
    with pytest.raises(ValueError, match="power of two"):
        jfa_sharded(occ, spec, dmesh)


def test_voxelize_rejects_mismatched_plan_spec(sphere_mesh):
    """A plan built for a different GridSpec must be rejected (review
    find: fragments would land in a silently wrong grid)."""
    from voxtpu.ops.vox import FragmentPlan

    spec_a = GridSpec.fit(sphere_mesh.coords, 32)
    spec_b = GridSpec.fit(sphere_mesh.coords, 64)
    plan = FragmentPlan(sphere_mesh, spec_a)
    with pytest.raises(ValueError, match="plan was built"):
        voxelize(sphere_mesh, spec_b, backend="xla", plan=plan)
