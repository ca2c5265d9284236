"""Segmented soft voxelizer vs the fused engine, the XLA engine, and
its own plan-layout invariants.

The seg engine requires n >= 256, so these tests run a subdivided torus
at 256^3 — in interpret mode that is a few thousand Pallas grid steps,
the heaviest CPU tests in the suite.  Tolerances: seg shares the fused
engine's exact8 dot algorithms, so seg-vs-fused differences come only
from panel/carry summation reordering (tight); both engines differ from
the XLA engine's plain-f32 dots by the known bf16_3x stacking noise at
heavily-covered cells (loose; measured identical for both engines,
max ~7e-3 at 1.6M fragments)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.mesh.mesh import Mesh
from voxtpu.ops.soft_vox import make_soft_plan, soft_voxelize
from voxtpu.ops.soft_vox_fused import FusedSoftPlan, soft_voxelize_fused
from voxtpu.ops.soft_vox_seg import (LATTICE, PANEL, SegSoftPlan,
                                     soft_voxelize_seg)


@pytest.fixture(scope="module")
def seg_setup(request):
    from bench import subdivide

    mesh = request.getfixturevalue("torus_mesh")
    # One subdivision level (2,304 faces): the seg invariants (both
    # panel families, multi-fragment table rows, 8-shard plans) hold
    # from ~1K faces up, and interpret-mode cost tracks the batch
    # count, which tracks fragments (round-5 suite-time item; was
    # level 2 = 9,216 faces).
    coords, faces = subdivide(mesh.coords, mesh.faces, 1)
    rng = np.random.default_rng(0)
    coords = (coords + rng.normal(0, 1e-3, coords.shape)).astype(np.float32)
    mesh = Mesh(name="torus_sub", coords=coords, faces=faces,
                faces_normals=faces)
    # n = 256 is the engine floor, but the interpret-mode cost driver is
    # the (tile, panel) batch count, which tracks the mesh's EXTENT in
    # grid cells — so scale the spec 256/96 so the torus spans ~96
    # voxels of the 256^3 grid (same assertion surface, ~7x fewer
    # batches than a grid-filling fit; round-4 suite-time item).
    side = float(np.ptp(coords, axis=0).max())
    mins = coords.min(axis=0)
    spec = GridSpec(n=256, origin=tuple(float(v) for v in mins),
                    voxel_size=side / 96.0)
    sp = make_soft_plan(mesh, spec)
    plan = SegSoftPlan(sp, mesh.coords)
    return mesh, spec, sp, plan


def test_seg_requires_large_n(torus_mesh):
    spec = GridSpec.fit(torus_mesh.coords, 32)
    sp = make_soft_plan(torus_mesh, spec)
    with pytest.raises(ValueError, match="segmented engine needs"):
        SegSoftPlan(sp, torus_mesh.coords)


def test_plan_layout_invariants(seg_setup):
    mesh, spec, sp, plan = seg_setup
    n = spec.n
    assert plan.num_fragments > 0
    # Panels sit on the 64 lattice, fully inside the grid.
    assert (plan.batch_panel % LATTICE == 0).all()
    assert (plan.batch_panel >= 0).all()
    assert (plan.batch_panel <= n - PANEL).all()
    # Local cells within the square tile; table slots within budget.
    valid = plan.cells_b >= 0
    assert (plan.cells_b[valid] < plan.tc).all()
    assert (plan.tblidx_b[valid] < plan.tbl).all()
    # Each (tile, panel) run opens and closes exactly once, in order.
    key = plan.batch_tile.astype(np.int64) * n + plan.batch_panel
    assert (np.diff(key) >= 0).all()
    starts = np.concatenate([[True], key[1:] != key[:-1]])
    ends = np.concatenate([key[1:] != key[:-1], [True]])
    np.testing.assert_array_equal((plan.flags & 1) != 0, starts)
    np.testing.assert_array_equal((plan.flags & 2) != 0, ends)
    # Visited masks cover exactly the real batches' blocks.
    fam_b = (plan.batch_panel // LATTICE) % 2 == 1
    mask_a = np.asarray(plan.mask_a_d)
    mask_b = np.asarray(plan.mask_b_d)
    assert mask_a.sum() == len(np.unique(key[~fam_b]))
    assert mask_b.sum() == len(np.unique(key[fam_b]))
    # Square tiles shrink the table row count vs strip tiles: every
    # fragment's (tile, panel, face) triple collapses into one pair.
    assert plan.num_pairs < plan.num_fragments


def test_seg_matches_fused_and_xla(seg_setup):
    mesh, spec, sp, plan = seg_setup
    fp = FusedSoftPlan(sp)
    cj = jnp.asarray(mesh.coords)
    ref_x = np.asarray(soft_voxelize(cj, sp, clip=False))
    got_f = np.asarray(soft_voxelize_fused(cj, fp, clip=False))
    got_s = np.asarray(soft_voxelize_seg(cj, plan, clip=False))
    # Same dot algorithms; only panel/carry summation order differs.
    np.testing.assert_allclose(got_s, got_f, atol=2e-3)
    # Shared loose bound vs the plain-f32 XLA engine.
    np.testing.assert_allclose(got_s, ref_x, atol=2e-2)
    np.testing.assert_allclose(got_f, ref_x, atol=2e-2)


def test_seg_gradients_match_fused(seg_setup):
    mesh, spec, sp, plan = seg_setup
    fp = FusedSoftPlan(sp)
    cj = jnp.asarray(mesh.coords)
    rng = np.random.default_rng(1)
    probe = jnp.asarray(
        rng.standard_normal((spec.n, spec.n, spec.n)), jnp.float32)

    gs = jax.grad(
        lambda c: jnp.sum(soft_voxelize_seg(c, plan) * probe))(cj)
    gf = jax.grad(
        lambda c: jnp.sum(soft_voxelize_fused(c, fp) * probe))(cj)
    gs, gf = np.asarray(gs), np.asarray(gf)
    scale = np.abs(gf).max()
    assert scale > 0
    # Quantile agreement, not element-wise: at n = 256 the edge
    # sigmoids divide by tau_e ~ vs^2, so bf16-reordering-level VALUE
    # differences at sigmoid transition boundaries amplify into O(1)
    # relative gradient differences at a handful of vertices — measured
    # between EVERY engine pair (fused-vs-XLA disagrees by 10x at the
    # same vertices; at several, seg matches XLA bit-for-bit while
    # fused is the outlier).  Per-engine FD gradchecks are the
    # element-wise guard (scripts/tpu_smoke.py soft_vox_seg@256).
    frac = np.mean(np.abs(gs - gf) <= 5e-3 * scale)
    assert frac >= 0.999, f"only {frac:.2%} of gradient elements agree"


def test_combine_kernel_matches_xla(monkeypatch):
    """The pallas combine kernel (the 1024^3 hardware path — both XLA
    combine formulations exceed the HBM budget there) must be
    bit-identical to the XLA combine on random family outputs: same
    per-element association, pure data-movement reassembly. Driven
    directly (geometry-independent) with a large tc so the interpret
    grid stays small; includes a pad tile and the 9th (trash) block,
    both of which must be sliced away."""
    from voxtpu.ops.soft_vox_seg import _seg_combine

    rng = np.random.default_rng(3)
    n, tc, tz = 256, 2048, 8
    nt = (n * n) // tc
    nblk = n // PANEL
    xt = 1
    out_a = jnp.asarray(
        rng.standard_normal((nt + xt, nblk + 1, tc, PANEL)), jnp.float32)
    out_b = jnp.asarray(
        rng.standard_normal((nt + xt, nblk + 1, tc, PANEL)), jnp.float32)
    carry = jnp.asarray(
        rng.standard_normal((nt + xt, n // LATTICE, 1, tc)), jnp.float32)
    monkeypatch.setenv("SEG_COMBINE", "xla")
    via_xla = np.asarray(
        _seg_combine(out_a, out_b, carry, n=n, tc=tc, tz=tz, nt=nt))
    monkeypatch.setenv("SEG_COMBINE", "pallas")
    via_kernel = np.asarray(
        _seg_combine(out_a, out_b, carry, n=n, tc=tc, tz=tz, nt=nt))
    assert via_xla.shape == (n, n, n)
    np.testing.assert_array_equal(via_kernel, via_xla)


def test_tau_x_guard(seg_setup):
    mesh, spec, sp, plan = seg_setup
    cj = jnp.asarray(mesh.coords)
    with pytest.raises(ValueError, match="tau_x_frac"):
        soft_voxelize_seg(cj, plan, tau_x_frac=4.0)


def test_seg_sharded_matches_unsharded(seg_setup):
    """`make_sharded_fit_seg` on the 8-virtual-device mesh: the sharded
    loss equals the unsharded seg-engine loss, and one Adam step on the
    sharded program lowers it."""
    from jax.sharding import Mesh as DeviceMesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from voxtpu.models.fit import soft_iou_loss
    from voxtpu.parallel.sharded_soft_seg import make_sharded_fit_seg

    mesh, spec, sp, plan = seg_setup
    n = spec.n
    # Synthetic ball target (hard-voxelizing the torus at 256^3 on CPU
    # would dominate the test's cost; the loss identity doesn't care).
    # Centered on the MESH's ~96-voxel corner region — a grid-centered
    # ball would not overlap it and the IoU loss would saturate at
    # exactly 1.0 (making "one step lowers the loss" unobservable).
    ax = (np.arange(n, dtype=np.float32) - 48.0) / 48.0
    target = ((ax[:, None, None] ** 2 + ax[None, :, None] ** 2
               + ax[None, None, :] ** 2) < 0.45).astype(np.float32)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    device_mesh = DeviceMesh(devices, ("d", "z"))
    target_slab = jax.device_put(
        target, NamedSharding(device_mesh, P("z", None, None)))

    init_fn, step_fn, loss_fn, shard_plans = make_sharded_fit_seg(
        sp, mesh.coords, device_mesh, learning_rate=5e-3)
    assert len(shard_plans) == 8
    assert all(p.xhit_drift_vox(mesh.coords) == 0.0 for p in shard_plans)
    coords, opt_state = init_fn(mesh.coords)
    l_sharded = float(loss_fn(coords, target_slab))

    occ = soft_voxelize_seg(jnp.asarray(mesh.coords), plan)
    l_ref = float(soft_iou_loss(occ, jnp.asarray(target)))
    np.testing.assert_allclose(l_sharded, l_ref, rtol=2e-4)

    coords, opt_state, value = step_fn(coords, opt_state, target_slab)
    assert float(loss_fn(coords, target_slab)) < l_sharded


def test_xhit_drift_guard(seg_setup):
    """x_hit drift is the seg-specific staleness metric: zero at the
    build coordinates, bounded for a tiny uniform shift, and large for
    a move along x (x_hit translates 1:1 with x)."""
    mesh, spec, sp, plan = seg_setup
    vs = spec.voxel_size
    assert plan.xhit_drift_vox(mesh.coords) == 0.0
    shifted = mesh.coords + np.asarray([[2.0 * vs, 0.0, 0.0]], np.float32)
    d = plan.xhit_drift_vox(shifted)
    # Pure +x translation moves every x_hit by exactly 2 voxels; the
    # bound is conservative but must see at least that.
    assert d >= 2.0
