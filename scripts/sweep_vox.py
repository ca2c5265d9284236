#!/usr/bin/env python
"""Sweep Pallas voxelizer (TILE_CELLS, TB_SUB) configs on the live chip.

Builds the fragment set once, then times each kernel config. Used to pick
the defaults in voxtpu/ops/vox_pallas.py (results: BENCH_NOTES.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from bench import subdivide


def main():
    n = int(os.environ.get("BENCH_N", "512"))
    subdiv = int(os.environ.get("BENCH_SUBDIV", "2"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    configs = os.environ.get("SWEEP", "128:1,128:2,128:4,256:2,256:4,512:4")

    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.mesh.mesh import Mesh
    from voxtpu.mesh.obj_io import import_mesh
    from voxtpu.ops.vox import FragmentPlan, fragments_from_plan
    from voxtpu.ops.vox_pallas import PallasVoxPlan, _pallas_words
    from voxtpu.utils.timing import time_device_fn

    mesh = import_mesh("/root/reference/assets/bunny.obj")
    coords, faces = subdivide(mesh.coords, mesh.faces, subdiv)
    mesh = Mesh(name="bunny_sub", coords=coords, faces=faces, faces_normals=faces)
    spec = GridSpec.fit(mesh.coords, n)

    t0 = time.time()
    frag_plan = FragmentPlan(mesh, spec)
    cells, xs = fragments_from_plan(frag_plan)
    cells, xs = jax.lax.sort((cells, xs), num_keys=1)
    jax.block_until_ready(cells)
    print(f"# fragments ready in {time.time() - t0:.1f}s", flush=True)

    best = None
    for cfg in configs.split(","):
        tc, tb_sub = (int(v) for v in cfg.split(":"))
        t0 = time.time()
        plan = PallasVoxPlan(mesh, spec, fragments=(cells, xs),
                             tc=tc, tb_sub=tb_sub)
        prep = time.time() - t0

        def run(*args):
            return _pallas_words(*args, n=spec.n, num_tiles=plan.num_tiles,
                                 tc=tc, tb_sub=tb_sub, seg=plan.seg)

        args = (plan.local_cells, plan.xs, plan.batch_tile, plan.flags,
                plan.batch_xseg, plan.tile_mask)
        dt = time_device_fn(run, *args, iters=iters)
        gvox = n**3 / dt / 1e9
        print(f"tc={tc} tb={tb_sub * 128}: batches={plan.num_batches} "
              f"prep={prep:.1f}s kernel={dt * 1e3:.3f}ms {gvox:.1f} Gvox/s",
              flush=True)
        if best is None or gvox > best[0]:
            best = (gvox, tc, tb_sub)
    print(f"# best: tc={best[1]} tb_sub={best[2]} {best[0]:.1f} Gvox/s")


if __name__ == "__main__":
    main()
