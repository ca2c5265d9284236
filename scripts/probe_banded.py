#!/usr/bin/env python
"""Banded-vs-whole-axis slot pipeline A/B on hardware (round 4).

One process, one backend init (CLAUDE.md battery rule). For each N in
PROBE_N (default "1024,2048"): time the whole-axis SlotVoxPipeline
(re-measured with the round-4 zero-init output alias), then each
(band, tb_sub) banded config in PROBE_CFGS (default "256:4,256:8,128:4"),
xor-verifying every grid against the whole-axis one on device.

Env: PROBE_N, PROBE_CFGS, PROBE_FACES (1348128), PROBE_ITERS (5).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench
from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.mesh.mesh import Mesh
from voxtpu.mesh.obj_io import import_mesh
from voxtpu.utils.timing import time_device_fn


def main():
    ns = [int(s) for s in os.environ.get("PROBE_N", "1024,2048").split(",")]
    cfgs = [tuple(int(v) for v in (c.split(":") + ["2"])[:3])
            for c in os.environ.get("PROBE_CFGS", "256:4:2,256:4:4,256:4:1")
            .split(",")]
    faces = int(os.environ.get("PROBE_FACES", "1348128"))
    iters = int(os.environ.get("PROBE_ITERS", "5"))

    m = import_mesh("/root/reference/assets/bunny.obj")
    coords, f = bench.subdivide_to(m.coords, m.faces, faces)
    mesh = Mesh(name="b", coords=coords, faces=f, faces_normals=f)
    print(f"mesh: {mesh.num_faces} faces; backend={jax.default_backend()}",
          flush=True)

    for n in ns:
        spec = GridSpec.fit(mesh.coords, n)
        from voxtpu.ops.vox_slots import SlotVoxPipeline

        t0 = time.time()
        spipe = SlotVoxPipeline(mesh, spec)
        ref_words = spipe.words()
        ref_words.block_until_ready()
        build = time.time() - t0
        dt = time_device_fn(spipe.words, iters=iters)
        print(f"n={n} whole-axis slot: {dt*1e3:8.2f} ms "
              f"batches={spipe.num_batches} build={build:.0f}s", flush=True)
        del spipe

        for band, tb_sub, pack in cfgs:
            from voxtpu.ops.vox_slots_banded import BandedSlotVoxPipeline

            try:
                t0 = time.time()
                bpipe = BandedSlotVoxPipeline(mesh, spec, band=band,
                                              tb_sub=tb_sub, pack=pack)
                bwords, ovf = bpipe.words()
                bwords.block_until_ready()
                build = time.time() - t0
                xor = int(bench._count_xor_pop(ref_words, bwords))
                novf = int(ovf)
                del bwords, ovf

                def run():
                    return bpipe.words()[0]

                dt = time_device_fn(run, iters=iters)
                print(f"n={n} banded band={band} tb={tb_sub*128} "
                      f"pack={pack}: {dt*1e3:8.2f} ms "
                      f"batches={bpipe.num_batches} "
                      f"wide={bpipe.num_wide} xor={xor} ovf={novf} "
                      f"build={build:.0f}s", flush=True)
                del bpipe
            except Exception as e:  # keep the battery going
                print(f"n={n} banded band={band} tb={tb_sub*128} "
                      f"pack={pack}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
        del ref_words
    print("probe_banded done", flush=True)


if __name__ == "__main__":
    main()
