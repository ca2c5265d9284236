#!/usr/bin/env python
"""Micro-probes informing the fused soft-vox engine design:

- row-gather: jnp.take of (P, 16) f32 rows by static-ish indices from a
  (T, 16) table (the pair-table expansion candidate)
- wide sort: lax.sort of 17 x P f32/int32 lanes (the sort-trick
  expansion candidate)
- element gather: the round-1 folklore number, for calibration
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from voxtpu.utils.timing import time_device_fn


def main():
    p = int(os.environ.get("MICRO_P", str(1 << 20)))
    t = int(os.environ.get("MICRO_T", str(256 * 1024)))
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((t, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, t, size=p), jnp.int32)

    @jax.jit
    def row_gather(tab, ix):
        return jnp.take(tab, ix, axis=0)

    dt = time_device_fn(row_gather, table, idx, iters=int(os.environ.get("MICRO_ITERS", "3")), repeats=2)
    gb = p * 16 * 4 / dt / 1e9
    print(f"row-gather ({p}x16 f32 rows): {dt*1e3:.3f} ms = {gb:.1f} GB/s")

    big = jnp.asarray(rng.standard_normal(8 * p), jnp.float32)
    eidx = jnp.asarray(rng.integers(0, 8 * p, size=8 * p), jnp.int32)

    @jax.jit
    def elem_gather(a, ix):
        return a[ix]

    dt = time_device_fn(elem_gather, big, eidx, iters=2, repeats=2)
    print(f"elem-gather ({8*p} f32): {dt*1e3:.3f} ms = "
          f"{8*p*4/dt/1e9:.1f} GB/s")

    key = jnp.asarray(rng.integers(0, p, size=p), jnp.int32)
    lanes = [jnp.asarray(rng.standard_normal(p), jnp.float32)
             for _ in range(16)]

    @jax.jit
    def wide_sort(k, *ls):
        return jax.lax.sort((k, *ls), num_keys=1)

    dt = time_device_fn(wide_sort, key, *lanes, iters=int(os.environ.get("MICRO_ITERS", "3")), repeats=2)
    print(f"17-lane sort ({p} rows): {dt*1e3:.3f} ms")

    @jax.jit
    def seg_fill(flag, *ls):
        # forward-fill via Hillis-Steele doubling, capped at 3 passes
        # (table runs are <= 8 rows; associative_scan hangs compiling
        # at these sizes on this TPU)
        vals = list(ls)
        filled = flag
        for shift in (1, 2, 4):
            fs = jnp.concatenate([jnp.zeros((shift,), bool), filled[:-shift]])
            take = ~filled & fs
            for i, v in enumerate(vals):
                sv = jnp.concatenate([jnp.zeros((shift,), v.dtype),
                                      v[:-shift]])
                vals[i] = jnp.where(take, sv, v)
            filled = filled | fs
        return tuple(vals)

    flag = jnp.asarray(rng.random(p) < 0.3)
    dt = time_device_fn(seg_fill, flag, *lanes,
                        iters=int(os.environ.get("MICRO_ITERS", "3")),
                        repeats=2)
    print(f"16-lane segmented fill ({p} rows): {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
