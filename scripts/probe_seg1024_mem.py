#!/usr/bin/env python
"""Compile-only HBM accounting for the seg-engine fwd+bwd at 1024^3.

The round-5 battery's seg fwd+bwd @1024 failed at COMPILE with a
17.58G program requirement against the chip's 15.75G, after three
structural fixes (NATTR-major tables, (1, tc, 128) cotangent panel
blocks, zero-init output aliases). This probe AOT-compiles the exact
fwd+bwd program (no execution, no plan upload — ShapeDtypeStruct
arguments) and prints either XLA's memory analysis (if it now fits) or
the compiler's "Largest program allocations" breakdown from the
RESOURCE_EXHAUSTED error, so the remaining overage is identified from
the buffer assignment instead of guessed.

Env: MEM_N (default 1024), MEM_FACES (default 1348128),
MEM_CPU=1 validates the script off-tunnel (interpret, no Mosaic).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MEM_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main():
    n = int(os.environ.get("MEM_N", "1024"))
    target_faces = int(os.environ.get("MEM_FACES", "1348128"))

    from bench import subdivide_to
    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.mesh.mesh import Mesh
    from voxtpu.mesh.obj_io import import_mesh
    from voxtpu.ops.soft_vox import make_soft_plan
    from voxtpu.ops.soft_vox_seg import SegSoftPlan, soft_voxelize_seg

    mesh = import_mesh("/root/reference/assets/bunny.obj")
    coords, faces = subdivide_to(mesh.coords, mesh.faces, target_faces)
    mesh = Mesh(name="bunny_sub", coords=coords, faces=faces,
                faces_normals=faces)
    spec = GridSpec.fit(mesh.coords, n)
    t0 = time.time()
    sp = make_soft_plan(mesh, spec)
    gp = SegSoftPlan(sp, mesh.coords)
    print(f"# n={n} faces={mesh.num_faces} batches={gp.num_batches} "
          f"build={time.time() - t0:.1f}s", flush=True)

    def fwd_bwd(c, p):
        return jax.value_and_grad(
            lambda cc: jnp.sum(soft_voxelize_seg(cc, p)))(c)

    c_sds = jax.ShapeDtypeStruct(mesh.coords.shape, jnp.float32)
    p_sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), gp)
    lowered = jax.jit(fwd_bwd).lower(c_sds, p_sds)
    print("# lowered; compiling...", flush=True)
    try:
        compiled = lowered.compile()
    except Exception as e:
        # RESOURCE_EXHAUSTED carries the "Largest program allocations"
        # breakdown — the whole point of the probe.
        print("COMPILE FAILED:", flush=True)
        print(str(e)[:8000], flush=True)
        return 1
    m = compiled.memory_analysis()
    gib = 1024 ** 3
    print(f"fwd+bwd@{n}: temp={m.temp_size_in_bytes / gib:.2f}G "
          f"args={m.argument_size_in_bytes / gib:.2f}G "
          f"out={m.output_size_in_bytes / gib:.2f}G "
          f"alias={m.alias_size_in_bytes / gib:.2f}G "
          f"peak~{(m.temp_size_in_bytes + m.argument_size_in_bytes + m.output_size_in_bytes - m.alias_size_in_bytes) / gib:.2f}G",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
