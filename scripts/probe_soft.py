#!/usr/bin/env python
"""Attribute the fused soft-vox fwd+bwd cost at reference scale:
tables build (expand gathers), fwd kernel, full fwd, layout-only bwd,
full fwd+bwd.

  PROBE_N=256 PROBE_FACES=1348128 python scripts/probe_soft.py

PROBE_N takes a comma list (e.g. PROBE_N=256,512,1024): sizes run in
ONE process — each new python process pays the tunnel's backend init
again (80 s - 22 min, BENCH_NOTES) — and a size that dies (OOM/outage)
is reported without killing the later ones.
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
    sizes = [int(s) for s in os.environ.get("PROBE_N", "256").split(",")]

    from bench import subdivide_to
    from voxtpu.mesh.mesh import Mesh
    from voxtpu.mesh.obj_io import import_mesh

    mesh = import_mesh("/root/reference/assets/bunny.obj")
    target_faces = int(os.environ.get("PROBE_FACES", "1348128"))
    coords, faces = subdivide_to(mesh.coords, mesh.faces, target_faces)
    mesh = Mesh(name="bunny_sub", coords=coords, faces=faces,
                faces_normals=faces)

    failures = 0
    for n in sizes:
        try:
            run(n, mesh)
        except Exception:
            failures += 1
            import traceback

            print(f"# probe_soft n={n} FAILED", flush=True)
            traceback.print_exc()
    return 1 if failures else 0


def run(n: int, mesh):
    iters = int(os.environ.get("PROBE_ITERS", "5"))
    mode = os.environ.get("PROBE_MODE", "exact8")

    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.ops.soft_vox import make_soft_plan
    from voxtpu.ops.soft_vox_fused import (NATTR, FusedSoftPlan,
                                           _expand_rows, _gather_tri,
                                           soft_voxelize_fused,
                                           triangle_coeffs)
    from voxtpu.utils.timing import time_device_fn

    spec = GridSpec.fit(mesh.coords, n)
    t0 = time.time()
    sp = make_soft_plan(mesh, spec)
    fp = FusedSoftPlan(sp)
    print(f"# n={n} faces={mesh.num_faces} pairs={fp.num_pairs} "
          f"slots={fp.num_fragments} batches={fp.num_batches} "
          f"expand_classes={[p.shape[0] for p in fp.expand_cls_d]} "
          f"build={time.time()-t0:.1f}s mode={mode}", flush=True)

    cj = jnp.asarray(mesh.coords)

    @jax.jit
    def tables_fwd(c, p):
        tri = _gather_tri(c, p.faces_d, p.vert_cls_d, p.vert_inv_d)
        co = jnp.concatenate(
            [triangle_coeffs(tri), jnp.zeros((1, NATTR), jnp.float32)])
        return _expand_rows(co, p.fidx_d, p.expand_cls_d, p.expand_inv_d)

    @jax.jit
    def tables_fwd_bwd(c, p):
        def loss(cc):
            return jnp.sum(tables_fwd(cc, p))

        return jax.value_and_grad(loss)(c)

    @jax.jit
    def full_fwd(c, p):
        return jnp.sum(soft_voxelize_fused(c, p, mode=mode))

    @jax.jit
    def full_fwd_bwd(c, p):
        return jax.value_and_grad(
            lambda cc: jnp.sum(soft_voxelize_fused(cc, p, mode=mode)))(c)

    def t(label, fn):
        out = fn(cj, fp)
        jax.block_until_ready(out)
        dt = time_device_fn(fn, cj, fp, iters=iters)
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)

    t("tables fwd      ", tables_fwd)
    t("tables fwd+bwd  ", tables_fwd_bwd)
    t("full fwd        ", full_fwd)
    t("full fwd+bwd    ", full_fwd_bwd)

    if os.environ.get("PROBE_SEG", "1") == "1":
        from voxtpu.ops.soft_vox_seg import SegSoftPlan, soft_voxelize_seg

        t0 = time.time()
        gp = SegSoftPlan(sp, mesh.coords)
        print(f"# seg pairs={gp.num_pairs} slots={gp.num_fragments} "
              f"batches={gp.num_batches} build={time.time()-t0:.1f}s",
              flush=True)

        @jax.jit
        def seg_fwd(c, p):
            return jnp.sum(soft_voxelize_seg(c, p))

        @jax.jit
        def seg_fwd_bwd(c, p):
            return jax.value_and_grad(
                lambda cc: jnp.sum(soft_voxelize_seg(cc, p)))(c)

        def ts(label, fn):
            out = fn(cj, gp)
            jax.block_until_ready(out)
            dt = time_device_fn(fn, cj, gp, iters=iters)
            print(f"{label}: {dt*1e3:.2f} ms", flush=True)

        ts("seg fwd         ", seg_fwd)
        ts("seg fwd+bwd     ", seg_fwd_bwd)


if __name__ == "__main__":
    sys.exit(main())
