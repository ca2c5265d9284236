"""Hardware verification of the y-blocked Pallas JFA at 1024^3.

Runs the round-5 y-blocked per-step flood (`jfa_pallas` routing at
n = 1024) and the stepped packed XLA flood on the same ball occupancy,
asserts ON-DEVICE equality (both are bit-parity implementations of the
oracle selection, so the 4 GB results must agree exactly), and prints
wall times. JFA_FENCE_DEPTH=1 here: the probe holds one flood's 4 GB
result while the second flood runs, so the depth-2 overlap window's
extra live step would push the peak past the v5e's 15.75 GB.

Usage (one process, pays backend init once):
    JFA_FENCE_DEPTH=1 python scripts/probe_jfa_yblock.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JFA_FENCE_DEPTH", "1")

import jax
import jax.numpy as jnp
import numpy as np

from voxtpu.grids.voxel_grid import GridSpec

N = int(os.environ.get("PROBE_N", "1024"))


@jax.jit
def _ball():
    zz = jax.lax.broadcasted_iota(jnp.float32, (N, N, N), 0)
    yy = jax.lax.broadcasted_iota(jnp.float32, (N, N, N), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (N, N, N), 2)
    c = (N - 1) / 2.0
    return (zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2 <= (0.35 * N) ** 2


@jax.jit
def _eq(a, b):
    return jnp.all(a == b)


def _fence(a):
    jax.device_get(a.reshape(-1)[0])


def main():
    spec = GridSpec(n=N, origin=(0.0, 0.0, 0.0), voxel_size=1.0 / N)
    occ = _ball()
    _fence(occ)

    from voxtpu.ops.jfa_pallas import jfa_pallas

    t0 = time.time()
    a = jfa_pallas(occ, spec)
    _fence(a)
    t_pallas = time.time() - t0
    print(f"[jfa_yblock_pallas@{N}]: {t_pallas * 1e3:.1f} ms "
          f"(run 0 = compile)", flush=True)

    t0 = time.time()
    a2 = jfa_pallas(occ, spec)
    _fence(a2)
    print(f"[jfa_yblock_pallas@{N} warm]: {(time.time() - t0) * 1e3:.1f} ms",
          flush=True)
    del a

    from voxtpu.ops.jfa import jfa_xla_stepped

    t0 = time.time()
    b = jfa_xla_stepped(occ, spec.origin, spec.voxel_size, n=N)
    _fence(b)
    print(f"[jfa_xla_stepped@{N}]: {(time.time() - t0) * 1e3:.1f} ms "
          f"(run 0 = compile)", flush=True)

    eq = bool(jax.device_get(_eq(a2, b)))
    print(f"[jfa_yblock_equal_xla@{N}]: {eq}", flush=True)
    if not eq:
        d = np.asarray(jnp.sum(a2 != b))
        raise SystemExit(f"MISMATCH: {d} differing voxels")


if __name__ == "__main__":
    main()
