#!/usr/bin/env python
"""On-hardware smoke gate: every Pallas kernel at tiny N vs the oracle.

Interpret-mode CPU tests do NOT catch Mosaic lowering errors
(CLAUDE.md gotchas) — this is the 2-minute hardware check to run before
committing kernel changes:

    python scripts/tpu_smoke.py        # needs the real TPU

Covers: suffix vox kernel, word-event vox kernel, work-queue vox
kernel, pallas JFA (fused + stepped), fused soft-vox fwd+bwd (vs the
XLA engine, gradients included). Small grids keep bulk D2H under ~1 MB
(the tunnel moves ~100 KB/s).
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

FAILURES = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"PASS {name} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — report every kernel
        FAILURES.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)


def main() -> int:
    if jax.default_backend() != "tpu":
        print("tpu_smoke: no TPU backend — nothing to smoke", file=sys.stderr)
        return 1

    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.mesh.obj_io import import_mesh
    from voxtpu.ops.reference import jfa_ref, voxelize_ref
    from voxtpu.ops.vox import voxelize

    mesh = import_mesh("/root/reference/assets/sphere.obj")
    spec = GridSpec.fit(mesh.coords, 64)
    occ_ref = voxelize_ref(mesh, spec)

    def vox_suffix():
        got = np.asarray(voxelize(mesh, spec, backend="pallas").to_dense())
        np.testing.assert_array_equal(got, occ_ref)

    def vox_we():
        from voxtpu.ops.vox_pallas_we import voxelize_pallas_we

        got = np.asarray(voxelize_pallas_we(mesh, spec).to_dense())
        np.testing.assert_array_equal(got, occ_ref)

    def vox_wq():
        from voxtpu.ops.vox_pallas_wq import voxelize_pallas_wq

        got = np.asarray(voxelize_pallas_wq(mesh, spec).to_dense())
        np.testing.assert_array_equal(got, occ_ref)

    spec32 = GridSpec(n=32, origin=(0.1, -0.2, 0.3), voxel_size=1.0 / 32)
    zz, yy, xx = np.indices((32, 32, 32))
    ball = ((zz - 15.5) ** 2 + (yy - 15.5) ** 2 + (xx - 15.5) ** 2
            <= 11.0 ** 2)
    sdf_ref = jfa_ref(ball, spec32)

    def jfa_fused():
        from voxtpu.ops.jfa_pallas import jfa_pallas

        got = np.asarray(jfa_pallas(jnp.asarray(ball), spec32))
        np.testing.assert_allclose(got, sdf_ref, rtol=1e-5, atol=1e-7)

    def jfa_stepped():
        from voxtpu.ops.jfa_pallas import _jfa_pallas_stepped

        got = np.asarray(_jfa_pallas_stepped(
            jnp.asarray(ball), spec32.origin, spec32.voxel_size, n=32))
        np.testing.assert_allclose(got, sdf_ref, rtol=1e-5, atol=1e-7)

    def soft_fwd_bwd():
        from voxtpu.models.fit import soft_iou_loss
        from voxtpu.ops.soft_vox import make_soft_plan, soft_voxelize
        from voxtpu.ops.soft_vox_pallas import (SoftPallasPlan,
                                                soft_voxelize_pallas)

        sspec = GridSpec.fit(mesh.coords, 32)
        soft_plan = make_soft_plan(mesh, sspec)
        pplan = SoftPallasPlan(soft_plan)
        target = jnp.asarray(
            voxelize(mesh, sspec, backend="pallas").to_dense(), jnp.float32)
        coords = jnp.asarray(mesh.coords)

        @jax.jit
        def lg_pallas(c):
            return jax.value_and_grad(
                lambda cc: soft_iou_loss(soft_voxelize_pallas(cc, pplan),
                                         target))(c)

        @jax.jit
        def lg_xla(c):
            return jax.value_and_grad(
                lambda cc: soft_iou_loss(soft_voxelize(cc, soft_plan),
                                         target))(c)

        lp, gp = lg_pallas(coords)
        lx, gx = lg_xla(coords)
        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
        # gradient agreement: cosine similarity on device, scalar D2H
        num = float(jnp.vdot(gp, gx))
        den = float(jnp.linalg.norm(gp) * jnp.linalg.norm(gx) + 1e-30)
        assert num / den > 0.999, f"grad cosine {num/den}"

    def soft_fused_fwd_bwd():
        from voxtpu.models.fit import soft_iou_loss
        from voxtpu.ops.soft_vox import make_soft_plan, soft_voxelize
        from voxtpu.ops.soft_vox_fused import (FusedSoftPlan,
                                               soft_voxelize_fused)

        # Jitter off the icosphere's exactly-X-degenerate faces: their
        # knife-edge outcome depends on per-program FMA rounding of the
        # face normal, so the engines may legitimately differ there.
        from voxtpu.mesh.mesh import Mesh as _Mesh

        rngj = np.random.default_rng(0)
        jit_coords = (mesh.coords + rngj.normal(
            0, 1e-4, mesh.coords.shape).astype(np.float32))
        jmesh = _Mesh(name="j", coords=jit_coords, faces=mesh.faces,
                      faces_normals=mesh.faces_normals)
        sspec = GridSpec.fit(jmesh.coords, 32)
        soft_plan = make_soft_plan(jmesh, sspec)
        fplan = FusedSoftPlan(soft_plan)
        target = jnp.asarray(
            voxelize(jmesh, sspec, backend="pallas").to_dense(), jnp.float32)
        coords = jnp.asarray(jmesh.coords)

        @jax.jit
        def lg_fused(c):
            return jax.value_and_grad(
                lambda cc: soft_iou_loss(soft_voxelize_fused(cc, fplan),
                                         target))(c)

        @jax.jit
        def lg_xla(c):
            return jax.value_and_grad(
                lambda cc: soft_iou_loss(soft_voxelize(cc, soft_plan),
                                         target))(c)

        lf_, gf = lg_fused(coords)
        lx, gx = lg_xla(coords)
        np.testing.assert_allclose(float(lf_), float(lx), rtol=1e-3)
        num = float(jnp.vdot(gf, gx))
        den = float(jnp.linalg.norm(gf) * jnp.linalg.norm(gx) + 1e-30)
        assert num / den > 0.99, f"grad cosine {num/den}"

    check("vox_pallas_suffix@64", vox_suffix)
    check("vox_pallas_word_event@64", vox_we)
    check("vox_pallas_work_queue@64", vox_wq)
    check("jfa_pallas_fused@32", jfa_fused)
    check("jfa_pallas_stepped@32", jfa_stepped)
    check("soft_vox_pallas_fwd_bwd@32", soft_fwd_bwd)
    check("soft_vox_fused_fwd_bwd@32", soft_fused_fwd_bwd)

    if FAILURES:
        print(f"SMOKE FAILED: {FAILURES}", file=sys.stderr)
        return 1
    print("SMOKE OK: all pallas kernels match oracles on hardware")
    return 0


if __name__ == "__main__":
    sys.exit(main())
