"""CSG booleans: packed words vs dense oracle; soft variants + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxtpu.grids.voxel_grid import GridSpec, VoxelGrid
from voxtpu.ops.csg import csg, soft_csg
from voxtpu.ops.reference import csg_ref


@pytest.fixture
def grids():
    rng = np.random.default_rng(3)
    n = 32
    spec = GridSpec(n=n, origin=(0, 0, 0), voxel_size=1.0 / n)
    a = rng.random((n, n, n)) < 0.4
    b = rng.random((n, n, n)) < 0.4
    return a, b, VoxelGrid.from_dense(a, spec), VoxelGrid.from_dense(b, spec)


@pytest.mark.parametrize("op", ["union", "intersection", "difference"])
def test_csg_matches_oracle(grids, op):
    a, b, ga, gb = grids
    out = csg(ga, gb, op)
    np.testing.assert_array_equal(np.asarray(out.to_dense()), csg_ref(a, b, op))


def test_csg_void(grids):
    _, _, ga, gb = grids
    out = csg(ga, gb, "void")
    np.testing.assert_array_equal(np.asarray(out.words), np.asarray(ga.words))


def test_csg_shape_mismatch(grids):
    _, _, ga, _ = grids
    spec = GridSpec(n=64, origin=(0, 0, 0), voxel_size=1.0 / 64)
    gb = VoxelGrid.zeros(spec)
    with pytest.raises(ValueError):
        csg(ga, gb, "union")


@pytest.mark.parametrize("op", ["union", "intersection", "difference"])
def test_soft_csg_matches_hard_on_binary(grids, op):
    a, b, _, _ = grids
    soft = np.asarray(soft_csg(jnp.float32(a), jnp.float32(b), op))
    np.testing.assert_array_equal(soft > 0.5, csg_ref(a, b, op))


def test_soft_csg_differentiable():
    def loss(a, b):
        return jnp.sum(soft_csg(a, b, "difference") ** 2)

    a = jnp.full((4, 4, 4), 0.7)
    b = jnp.full((4, 4, 4), 0.2)
    ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
    assert np.isfinite(np.asarray(ga)).all()
    assert np.isfinite(np.asarray(gb)).all()
    assert float(jnp.abs(ga).sum()) > 0


def test_csg_unknown_backend_raises(grids):
    a, b, ga, gb = grids
    with pytest.raises(ValueError, match="unknown backend"):
        csg(ga, gb, "union", backend="cuda")


def test_csg_reference_backend_matches(grids):
    a, b, ga, gb = grids
    for op in ("union", "intersection", "difference"):
        host = csg(ga, gb, op, backend="reference")
        xla = csg(ga, gb, op, backend="xla")
        np.testing.assert_array_equal(
            np.asarray(host.words), np.asarray(xla.words))
