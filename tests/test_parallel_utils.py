"""Device-mesh helper tests (8 virtual CPU devices via conftest)."""

import numpy as np
import pytest


def test_make_mesh_shapes():
    from voxtpu.parallel.mesh_utils import make_mesh

    m = make_mesh(8)
    assert set(m.axis_names) == {"d", "z"}
    assert m.shape["d"] * m.shape["z"] == 8

    m2 = make_mesh(8, grid_axis=2)
    assert m2.shape["z"] == 2 and m2.shape["d"] == 4

    with pytest.raises(ValueError):
        make_mesh(6, grid_axis=4)


def test_grid_sharding_places_slabs():
    import jax
    import jax.numpy as jnp

    from voxtpu.parallel.mesh_utils import grid_sharding, make_mesh

    m = make_mesh(8, grid_axis=8)
    occ = jnp.zeros((64, 16, 16), jnp.float32)
    sharded = jax.device_put(occ, grid_sharding(m))
    # 8 Z-slabs of 8 planes each.
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (8, 16, 16)
