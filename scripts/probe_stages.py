#!/usr/bin/env python
"""Stage breakdown of the fused total vox pipeline on hardware:
emit-only, emit+events, full total — to attribute the per-call cost.

  PROBE_N=512 PROBE_FACES=1348128 python scripts/probe_stages.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import functools

import jax.numpy as jnp
import numpy as np


def main():
    n = int(os.environ.get("PROBE_N", "512"))
    iters = int(os.environ.get("PROBE_ITERS", "10"))

    from bench import subdivide_to
    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.mesh.mesh import Mesh
    from voxtpu.mesh.obj_io import import_mesh
    from voxtpu.ops.vox import emit_fragments
    from voxtpu.ops.vox_pallas_we import (DeviceVoxPipeline, _build_events,
                                          _total_jit)
    from voxtpu.utils.timing import time_device_fn

    mesh = import_mesh("/root/reference/assets/bunny.obj")
    target_faces = int(os.environ.get("PROBE_FACES", "1348128"))
    coords, faces = subdivide_to(mesh.coords, mesh.faces, target_faces)
    mesh = Mesh(name="bunny_sub", coords=coords, faces=faces,
                faces_normals=faces)
    spec = GridSpec.fit(mesh.coords, n)
    pipe = DeviceVoxPipeline(mesh, spec)
    print(f"# n={n} faces={mesh.num_faces} events={pipe.num_events} "
          f"frags={pipe.num_fragments} batches={pipe.num_batches}",
          flush=True)

    origin = jnp.asarray(spec.origin, jnp.float32)
    vs = jnp.float32(spec.voxel_size)

    @functools.partial(jax.jit, static_argnames=("windows", "n"))
    def emit_only(bucket_arrays, origin, vs, *, windows, n):
        cs, xs = [], []
        for w, (v0, v1, v2, sy, sz) in zip(windows, bucket_arrays):
            c, x = emit_fragments(v0, v1, v2, sy, sz, window=w, n=n,
                                  origin=origin, voxel_size=vs)
            cs.append(c)
            xs.append(x)
        return jnp.concatenate(cs), jnp.concatenate(xs)

    @functools.partial(jax.jit, static_argnames=("windows", "n", "tc"))
    def emit_events(bucket_arrays, origin, vs, *, windows, n, tc):
        c, x = emit_only(bucket_arrays, origin, vs, windows=windows, n=n)
        return _build_events(c, x, n=n, tc=tc)[:2]

    args = (pipe.bucket_arrays, origin, vs)

    def t(label, fn, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        dt = time_device_fn(lambda *a: fn(*a, **kw), *args, iters=iters)
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        return dt

    t("emit_only      ", emit_only, windows=pipe.windows, n=n)
    t("emit+events    ", emit_events, windows=pipe.windows, n=n, tc=pipe.tc)
    t("full total     ", _total_jit, windows=pipe.windows, n=n, tc=pipe.tc,
      tb_sub=pipe.tb_sub, b_max=pipe.b_max, cap_f=pipe.cap_f)

    # Static-slot pipeline (vox_slots): pre-pass alone, then its total.
    from voxtpu.ops.vox_slots import SlotVoxPipeline, _slot_emit

    t0 = time.time()
    spipe = SlotVoxPipeline(mesh, spec)
    print(f"# slot pipeline: slots={spipe.num_slots} "
          f"batches={spipe.num_batches} build={time.time()-t0:.1f}s",
          flush=True)
    sargs = (spipe.rows, spipe.local, spipe.batch_tile)

    def t2(label, fn, *a, **kw):
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        dt = time_device_fn(lambda *x: fn(*x, **kw), *a, iters=iters)
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)

    t2("slot_emit      ", _slot_emit, spipe.rows, spipe.local,
       spipe.batch_tile, origin, vs, n=n, tc=spipe.tc)
    t2("slot_total     ", lambda *a: spipe.words())


if __name__ == "__main__":
    main()
