"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-device testing without a TPU pod is idiomatic JAX (SURVEY.md §4):
force the host platform and fake 8 devices so sharding/collective paths
compile and execute. Must run before the first `import jax`.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the harness presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers the TPU plugin at interpreter start and
# writes jax.config.jax_platforms directly, which outranks the env var —
# override it back before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

ASSETS = pathlib.Path("/root/reference/assets")


def pytest_collection_modifyitems(session, config, items):
    """Start the 2-process distributed workers at collection time and
    move their test to the end of the run: the ~4 min the worker pair
    needs then overlaps the rest of the suite instead of serializing
    with it (the test itself just joins and asserts)."""
    dist = [it for it in items
            if it.name == "test_two_process_mesh_jfa"]
    if dist and len(items) > len(dist) and not config.option.collectonly:
        from tests.test_distributed import launch_workers

        config._voxtpu_dist_workers = launch_workers()
        for it in dist:
            items.remove(it)
            items.append(it)


def pytest_unconfigure(config):
    # If the run aborted before the distributed test joined (e.g. -x
    # stop), don't leave the worker pair orphaned.
    for p in getattr(config, "_voxtpu_dist_workers", ()):
        if p.poll() is None:
            p.kill()


@pytest.fixture(scope="session")
def sphere_mesh():
    from voxtpu.mesh.obj_io import import_mesh

    return import_mesh(ASSETS / "sphere.obj")


@pytest.fixture(scope="session")
def torus_mesh():
    from voxtpu.mesh.obj_io import import_mesh

    return import_mesh(ASSETS / "torus.obj")


@pytest.fixture(scope="session")
def d20_mesh():
    from voxtpu.mesh.obj_io import import_mesh

    return import_mesh(ASSETS / "d20.obj")


@pytest.fixture(scope="session")
def bunny_mesh():
    from voxtpu.mesh.obj_io import import_mesh

    return import_mesh(ASSETS / "bunny.obj")


def random_soup_mesh(num_faces: int, seed: int = 0):
    """Random closed-ish triangle fan around a point — only used where the
    test doesn't require a watertight surface."""
    from voxtpu.mesh.mesh import Mesh

    rng = np.random.default_rng(seed)
    coords = rng.uniform(0.05, 0.95, size=(num_faces * 3, 3)).astype(np.float32)
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    return Mesh(name="soup", coords=coords, faces=faces, faces_normals=faces)
