#!/usr/bin/env python
"""Probe the fused device-side total pipeline on hardware: correctness
(popcount vs the per-stage path) and the warm whole-pipeline time.

  PROBE_N=512 PROBE_FACES=1348128 python scripts/probe_total.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main():
    n = int(os.environ.get("PROBE_N", "512"))
    iters = int(os.environ.get("PROBE_ITERS", "10"))

    from bench import subdivide_to
    from voxtpu.grids.voxel_grid import GridSpec, _popcount32
    from voxtpu.mesh.mesh import Mesh
    from voxtpu.mesh.obj_io import import_mesh
    from voxtpu.ops.vox_pallas_we import DeviceVoxPipeline
    from voxtpu.utils.timing import time_device_fn

    mesh = import_mesh("/root/reference/assets/bunny.obj")
    target_faces = int(os.environ.get("PROBE_FACES", "1348128"))
    coords, faces = subdivide_to(mesh.coords, mesh.faces, target_faces)
    mesh = Mesh(name="bunny_sub", coords=coords, faces=faces,
                faces_normals=faces)
    spec = GridSpec.fit(mesh.coords, n)
    print(f"# n={n} faces={mesh.num_faces}", flush=True)

    t0 = time.time()
    pipe = DeviceVoxPipeline(mesh, spec)
    print(f"# pipeline: events={pipe.num_events} frags={pipe.num_fragments}"
          f" batches={pipe.num_batches} build={time.time()-t0:.1f}s",
          flush=True)

    @jax.jit
    def popcount(words):
        return jnp.sum(
            jnp.sum(_popcount32(words), axis=(1, 2), dtype=jnp.int32)
            .astype(jnp.float32))

    t0 = time.time()
    words, overflow = pipe.words()
    pc = float(popcount(words))
    print(f"# total popcount = {pc:.0f} ({pc / n**3 * 100:.2f}% of {n}^3) "
          f"overflow={int(overflow)} first_exec={time.time()-t0:.1f}s",
          flush=True)
    del words

    def run():
        w, _ = pipe.words()
        return w[:1, :1, :1]  # scalar-sized held output (HBM queue safety)

    dt = time_device_fn(run, iters=iters)
    from bench import BASELINE_TOTAL_MS, BASELINE_TOTAL_NOMEM_MS
    base = BASELINE_TOTAL_MS.get(n)
    nomem = BASELINE_TOTAL_NOMEM_MS.get(n)
    print(f"vox_total: {dt*1e3:.2f} ms "
          f"(ref total {base} ms = {base/(dt*1e3) if base else -1:.2f}x; "
          f"ref compute-only {nomem} ms = "
          f"{nomem/(dt*1e3) if nomem else -1:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
