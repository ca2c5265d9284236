#!/usr/bin/env python
"""On-chip JFA probe at large N (the round-1 blocker was 1024^3).

Ball occupancy (device-generated), stepped pallas flood, scalar-only
D2H (finite count + interior/exterior sums). Timing = wall clock around
the stepped dispatch loop, min of repeats — at 4 GB of state per step
the differential timer's queued executions are the OOM risk round 1
hit, so the loop is fenced once at the end instead.

    PROBE_N=1024 python scripts/probe_jfa.py
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
    n = int(os.environ.get("PROBE_N", "1024"))
    repeats = int(os.environ.get("PROBE_REPEATS", "3"))

    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.ops.jfa_pallas import jfa_pallas

    spec = GridSpec(n=n, origin=(0.0, 0.0, 0.0), voxel_size=1.0 / n)

    @functools.partial(jax.jit, static_argnames=("n",))
    def ball(*, n):
        zz = jax.lax.broadcasted_iota(jnp.float32, (n, n, n), 0)
        yy = jax.lax.broadcasted_iota(jnp.float32, (n, n, n), 1)
        xx = jax.lax.broadcasted_iota(jnp.float32, (n, n, n), 2)
        c = (n - 1) / 2.0
        return ((zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2
                <= (0.35 * n) ** 2)

    @jax.jit
    def stats(sdf):
        finite = jnp.isfinite(sdf)
        return (jnp.sum(finite.astype(jnp.float32)),
                jnp.sum((sdf > 0).astype(jnp.float32)),
                jnp.max(jnp.where(finite, sdf, -jnp.inf)),
                jnp.min(jnp.where(finite, sdf, jnp.inf)))

    occ = ball(n=n)
    print(f"# n={n} flood steps={n.bit_length() - 1}", flush=True)

    best = None
    for r in range(repeats):
        t0 = time.perf_counter()
        sdf = jfa_pallas(occ, spec)
        s = [float(x) for x in stats(sdf)]
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        print(f"# run {r}: {dt*1e3:.1f} ms (incl. per-step dispatch + "
              f"scalar fence)", flush=True)
        del sdf
    interior_expect = 4.0 / 3.0 * np.pi * (0.35 * n) ** 3
    print(f"finite={s[0]:.0f}/{n**3} interior={s[1]:.0f} "
          f"(ball expect ~{interior_expect:.0f}) "
          f"max={s[2]:.4f} min={s[3]:.4f}")
    print(f"jfa {n}^3 full SDF: {best*1e3:.1f} ms wall (stepped)")


if __name__ == "__main__":
    main()
