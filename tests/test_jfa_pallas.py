"""Pallas JFA vs oracle (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.ops.jfa import jfa
from voxtpu.ops.reference import jfa_ref


def _ball(n, r=0.35):
    zz, yy, xx = np.indices((n, n, n))
    c = (n - 1) / 2
    return (zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2 <= (n * r) ** 2


def test_pallas_jfa_matches_oracle_ball():
    n = 16
    occ = _ball(n)
    spec = GridSpec(n=n, origin=(0.25, -1.0, 3.0), voxel_size=1.0 / n)
    ref = jfa_ref(occ, spec)
    got = np.asarray(jfa(occ, spec, backend="pallas"))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=0)


def test_pallas_jfa_matches_oracle_random():
    rng = np.random.default_rng(7)
    n = 16
    occ = rng.random((n, n, n)) < 0.2
    spec = GridSpec(n=n, origin=(0.0, 0.0, 0.0), voxel_size=0.125)
    ref = jfa_ref(occ, spec)
    got = np.asarray(jfa(occ, spec, backend="pallas"))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=0)


def test_pipelined_flood_bit_matches_legacy_kernel():
    """The round-4 pipelined kernel (one DMA per plane, hoisted seed
    unpack, fused final pass) must be BIT-identical to the round-3
    three-plane kernel: same float selection formula, same candidate
    order, same strict-< tie-breaks (the exact-int round-3 negative
    result is why this is asserted at atol=0)."""
    from voxtpu.ops.jfa_pallas import _jfa_pallas

    rng = np.random.default_rng(11)
    n = 32
    occ = rng.random((n, n, n)) < 0.03  # sparse: long floods, real ties
    spec = GridSpec(n=n, origin=(0.5, -2.0, 1.25), voxel_size=0.0625)
    pipe = np.asarray(_jfa_pallas(occ, spec.origin, spec.voxel_size,
                                  n=n, pipe=True))
    legacy = np.asarray(_jfa_pallas(occ, spec.origin, spec.voxel_size,
                                    n=n, pipe=False))
    np.testing.assert_array_equal(pipe, legacy)
    ref = jfa_ref(occ, spec)
    np.testing.assert_allclose(pipe, ref, rtol=1e-6, atol=0)


def test_pipelined_flood_non_divisor_strides():
    """The pipelined kernel's residue walk covers all planes only when
    k | n; the halving sequence hits non-divisor strides on
    non-power-of-two N (smallest: n=14 -> k=3, and for packed grids
    N = 224 = 32*7 -> k = 3). Those steps must fall back to the
    three-plane kernel or the last n mod k planes keep garbage."""
    from voxtpu.ops.jfa_pallas import _jfa_pallas

    rng = np.random.default_rng(3)
    n = 14  # k sequence 7, 3, 1: 14 % 3 != 0
    occ = rng.random((n, n, n)) < 0.1
    spec = GridSpec(n=n, origin=(-1.0, 0.5, 2.0), voxel_size=0.25)
    pipe = np.asarray(_jfa_pallas(occ, spec.origin, spec.voxel_size,
                                  n=n, pipe=True))
    legacy = np.asarray(_jfa_pallas(occ, spec.origin, spec.voxel_size,
                                    n=n, pipe=False))
    np.testing.assert_array_equal(pipe, legacy)
    ref = jfa_ref(occ, spec)
    np.testing.assert_allclose(pipe, ref, rtol=1e-6, atol=0)


def test_yblocked_step_bit_matches_full_plane():
    """The round-5 y-blocked kernel (the 1024^3 VMEM fix: (1, H, n)
    output bands over full-plane source blocks) must be BIT-identical
    to the full-plane three-plane kernel at every stride — same float
    selection formula, same candidate order, same strict-< tie-breaks."""
    import jax.numpy as jnp

    from voxtpu.ops.jfa_pallas import (_flood_step_pallas,
                                       _flood_step_pallas_yblocked,
                                       _init_jit)

    rng = np.random.default_rng(19)
    n = 32
    occ = rng.random((n, n, n)) < 0.03
    org = jnp.asarray([0.5, -2.0, 1.25, 0.0625], jnp.float32)
    seed = _init_jit(jnp.asarray(occ), n=n)
    for k in (16, 5, 1):  # power-of-two, odd (mis-aligned rolls), final
        full = np.asarray(_flood_step_pallas(seed, org, k, n))
        for H in (8, 16):
            banded = np.asarray(
                _flood_step_pallas_yblocked(seed, org, k, n, H))
            np.testing.assert_array_equal(banded, full)
        seed = jnp.asarray(full)  # flood forward for the next stride


def test_yblocked_stepped_flood_matches_oracle():
    """Full fence-windowed per-step y-blocked flood (the 1024^3
    production path, shrunk) vs the sequential oracle and the
    whole-flood single-jit path."""
    from voxtpu.ops.jfa_pallas import _jfa_pallas, _jfa_pallas_stepped

    rng = np.random.default_rng(23)
    n = 32
    occ = rng.random((n, n, n)) < 0.05
    spec = GridSpec(n=n, origin=(0.25, -1.0, 3.0), voxel_size=1.0 / n)
    got = np.asarray(_jfa_pallas_stepped(occ, spec.origin, spec.voxel_size,
                                         n=n, yblock=8))
    fused = np.asarray(_jfa_pallas(occ, spec.origin, spec.voxel_size,
                                   n=n, pipe=False))
    np.testing.assert_array_equal(got, fused)
    ref = jfa_ref(occ, spec)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=0)


def test_pallas_jfa_routes_1024_to_yblocked_stepped(monkeypatch):
    """1024^3 must route to the fence-windowed y-blocked per-step
    dispatch (round 5 — previously delegated to the stepped XLA flood
    because the full-plane kernel exceeded physical VMEM), honoring
    JFA_YBLOCK and the JFA_PALLAS_1024=0 opt-out."""
    import voxtpu.ops.jfa_pallas as mod

    calls = {}

    def fake_stepped(occ, origin, voxel_size, *, n, pipe, yblock):
        calls["n"], calls["yblock"] = n, yblock
        return "stepped"

    monkeypatch.setattr(mod, "_jfa_pallas_stepped", fake_stepped)
    spec = GridSpec(n=1024, origin=(0, 0, 0), voxel_size=1.0)
    assert mod.jfa_pallas(np.zeros((8, 8, 8), bool), spec) == "stepped"
    assert calls == {"n": 1024, "yblock": 256}
    monkeypatch.setenv("JFA_YBLOCK", "128")
    mod.jfa_pallas(np.zeros((8, 8, 8), bool), spec)
    assert calls["yblock"] == 128

    import voxtpu.ops.jfa as jfa_mod

    monkeypatch.setenv("JFA_PALLAS_1024", "0")
    monkeypatch.setattr(jfa_mod, "jfa_xla_stepped",
                        lambda occ, origin, voxel_size, *, n: "xla")
    assert mod.jfa_pallas(np.zeros((8, 8, 8), bool), spec) == "xla"


def test_pallas_jfa_delegates_beyond_1024(monkeypatch):
    """N > 1024 exceeds both the packed encoding and a single chip's
    HBM; the pallas backend must delegate to the stepped wide XLA flood
    instead of raising (the old hard cap is gone)."""
    import voxtpu.ops.jfa as jfa_mod

    called = {}

    def fake_stepped(occ, origin, voxel_size, *, n):
        called["n"] = n
        return "delegated"

    monkeypatch.setattr(jfa_mod, "jfa_xla_stepped", fake_stepped)
    spec = GridSpec(n=2048, origin=(0, 0, 0), voxel_size=1.0)
    from voxtpu.ops.jfa_pallas import jfa_pallas

    assert jfa_pallas(np.zeros((8, 8, 8), bool), spec) == "delegated"
    assert called["n"] == 2048
