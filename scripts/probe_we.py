#!/usr/bin/env python
"""Probe the word-event vox kernel on hardware: correctness vs the
suffix kernel (device-side popcount diff, no bulk D2H) and kernel time.

  PROBE_N=512 PROBE_SUBDIV=2 PROBE_CMP=1 PROBE_TC=128 PROBE_TB=4 python scripts/probe_we.py
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
    subdiv = int(os.environ.get("PROBE_SUBDIV", "2"))
    cmp_suffix = os.environ.get("PROBE_CMP", "1") == "1"
    tc = int(os.environ.get("PROBE_TC", "128"))
    tb_sub = int(os.environ.get("PROBE_TB", "4"))
    iters = int(os.environ.get("PROBE_ITERS", "10"))

    from bench import subdivide, subdivide_to
    from voxtpu.grids.voxel_grid import GridSpec, _popcount32
    from voxtpu.mesh.mesh import Mesh
    from voxtpu.mesh.obj_io import import_mesh
    from voxtpu.ops.vox import FragmentPlan
    from voxtpu.ops.vox_pallas_we import WordEventVoxPlan, _we_words
    from voxtpu.utils.timing import time_device_fn

    mesh = import_mesh("/root/reference/assets/bunny.obj")
    target_faces = int(os.environ.get("PROBE_FACES", "0"))
    if target_faces:
        coords, faces = subdivide_to(mesh.coords, mesh.faces, target_faces)
    else:
        coords, faces = subdivide(mesh.coords, mesh.faces, subdiv)
    mesh = Mesh(name="bunny_sub", coords=coords, faces=faces,
                faces_normals=faces)
    spec = GridSpec.fit(mesh.coords, n)
    print(f"# n={n} faces={mesh.num_faces}", flush=True)

    t0 = time.time()
    fp = FragmentPlan(mesh, spec)
    plan = WordEventVoxPlan(mesh, spec, frag_plan=fp, tc=tc, tb_sub=tb_sub)
    print(f"# we plan: events={plan.num_events} fragments={plan.num_fragments}"
          f" batches={plan.num_batches} prep={time.time()-t0:.1f}s", flush=True)

    slice_out = os.environ.get("PROBE_SLICE") == "1"

    def run_we(*args):
        w = _we_words(*args, n=n, num_tiles=plan.num_tiles, tc=plan.tc,
                      tb_sub=plan.tb_sub)
        # At 4096^3 the packed grid is 8.6 GB; returning a tiny slice
        # keeps each timed execution's output a scalar-sized buffer (the
        # full grid is an execution-local temp), so the differential
        # timer's in-flight queue can't exhaust HBM.
        return w[:1, :1, :1] if slice_out else w

    we_args = (plan.cells, plan.ws, plan.his, plan.masks, plan.cnts,
               plan.batch_tile, plan.flags, plan.tile_mask)

    @jax.jit
    def popcount(words):
        return jnp.sum(
            jnp.sum(_popcount32(words), axis=(1, 2), dtype=jnp.int32)
            .astype(jnp.float32))

    def full_we(*args):
        return _we_words(*args, n=n, num_tiles=plan.num_tiles, tc=plan.tc,
                         tb_sub=plan.tb_sub)

    words_we = full_we(*we_args)
    pc_we = float(popcount(words_we))
    print(f"# we popcount = {pc_we:.0f} "
          f"({pc_we / n**3 * 100:.2f}% of {n}^3)", flush=True)
    del words_we

    if cmp_suffix:
        from voxtpu.ops.vox_pallas import PallasVoxPlan, _pallas_words

        t0 = time.time()
        splan = PallasVoxPlan(mesh, spec, frag_plan=fp)
        print(f"# suffix plan: batches={splan.num_batches} "
              f"prep={time.time()-t0:.1f}s", flush=True)

        def run_sfx(*args):
            return _pallas_words(*args, n=n, num_tiles=splan.num_tiles,
                                 tc=splan.tc, tb_sub=splan.tb_sub,
                                 seg=splan.seg)

        s_args = (splan.local_cells, splan.xs, splan.batch_tile, splan.flags,
                  splan.batch_xseg, splan.tile_mask)
        words_s = run_sfx(*s_args)

        @jax.jit
        def diffbits(a, b):
            return jnp.sum(
                jnp.sum(_popcount32(a ^ b), axis=(1, 2), dtype=jnp.int32)
                .astype(jnp.float32))

        print(f"# xor-diff bits vs suffix kernel: "
              f"{float(diffbits(full_we(*we_args), words_s)):.0f}", flush=True)
        del words_s
        dt_s = time_device_fn(run_sfx, *s_args, iters=iters)
        print(f"suffix kernel: {dt_s*1e3:.3f} ms  "
              f"({n**3/dt_s/1e9:.1f} Gvox/s)", flush=True)

    dt = time_device_fn(run_we, *we_args, iters=iters)
    print(f"we kernel: {dt*1e3:.3f} ms  ({n**3/dt/1e9:.1f} Gvox/s)", flush=True)


if __name__ == "__main__":
    main()
