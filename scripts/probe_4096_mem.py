#!/usr/bin/env python
"""Compile-only HBM accounting for the one-jit vox total at large N.

The 4096^3 DeviceVoxPipeline total RESOURCE_EXHAUSTs at runtime even
after the zero-init output alias removed the second full-grid pass.
This probe compiles `_total_jit` at BENCH-equivalent shapes and prints
XLA's memory analysis (temp/argument/output bytes) without executing,
so the oversized buffers can be identified from the buffer assignment
instead of guessed.

Env: MEM_N (default 4096), MEM_FACES (default 1348128).
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
    n = int(os.environ.get("MEM_N", "4096"))
    faces = int(os.environ.get("MEM_FACES", "1348128"))

    from bench import subdivide_to
    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.mesh.mesh import Mesh
    from voxtpu.mesh.obj_io import import_mesh
    from voxtpu.ops import vox_pallas_we as we

    base = import_mesh("/root/reference/assets/bunny.obj")
    coords, tri = subdivide_to(base.coords, base.faces, faces)
    mesh = Mesh(name="bunny_sub", coords=coords, faces=tri,
                faces_normals=tri)
    print(f"mesh: {mesh.num_faces} faces (requested {faces})", flush=True)
    spec = GridSpec.fit(mesh.coords, n)
    t0 = time.time()
    pipe = we.DeviceVoxPipeline(mesh, spec)
    print(f"pipeline built in {time.time()-t0:.1f}s: "
          f"b_max={pipe.b_max} cap_f={pipe.cap_f} "
          f"events={pipe.num_events} fragments={pipe.num_fragments}",
          flush=True)

    origin = jnp.asarray(spec.origin, jnp.float32)
    vs = jnp.float32(spec.voxel_size)
    lowered = we._total_jit.lower(
        pipe.bucket_arrays, origin, vs, windows=pipe.windows, n=n,
        tc=pipe.tc, tb_sub=pipe.tb_sub, b_max=pipe.b_max, cap_f=pipe.cap_f)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time()-t0:.1f}s", flush=True)
    ma = compiled.memory_analysis()
    gb = 1 / (1024 ** 3)
    print(f"temp:   {ma.temp_size_in_bytes * gb:.2f} GiB")
    print(f"args:   {ma.argument_size_in_bytes * gb:.2f} GiB")
    print(f"output: {ma.output_size_in_bytes * gb:.2f} GiB")
    print(f"alias:  {ma.alias_size_in_bytes * gb:.2f} GiB")
    print(f"peak = temp + args + output - alias = "
          f"{(ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes - ma.alias_size_in_bytes) * gb:.2f} GiB",
          flush=True)


if __name__ == "__main__":
    main()
