#!/usr/bin/env python
"""JFA flood-step cost attribution on hardware (round 4, VERDICT #5).

The battery's A/B showed the round-4 pipelined kernel (2.3x less HBM
traffic, ~half the per-candidate ALU, 4 rolled planes per candidate)
is ~17% SLOWER than the legacy three-plane kernel — so the flood's
cost model (rolls vs ALU vs DMA/overhead) is not understood well
enough to optimize. This probe times ONE flood step at a fixed (n, k)
across distortions of the legacy kernel that isolate each term:

  legacy   the production `_step_kernel` (baseline)
  rolls    same 26 rolls + masks, fold = integer min (ALU removed)
  alu      same 26 seed_d2 folds, all on the UNROLLED plane (rolls
           removed; a per-candidate XOR keeps CSE from collapsing it)
  hoist    legacy restructured: lane (dx) rolls hoisted per plane and
           reused across dy (18 lane + 6 sublane rolls -> 6 + 18);
           fold order unchanged -> bit-identical output
  hoistv   hoist + validity folded into one inf-select on d2 (the
           rolled garbage can never win: inf is never strictly less)

`hoist`/`hoistv` are candidate production kernels: both fold in the
oracle's (dz, dy, dx) order with strict-< tie-breaks, so they must be
bit-identical to legacy (asserted on device before timing).

Env: JFA_MICRO_N (512), JFA_MICRO_K (comma list, default "4,128"),
JFA_MICRO_ITERS (5).
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

_MASK10 = 0x3FF


def _candidates():
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dz == 0 and dy == 0 and dx == 0:
                    continue
                yield dz, dy, dx


def _kernel(n: int, k: int, variant: str):
    from jax.experimental import pallas as pl

    def kernel(seed_m, seed_0, seed_p, org_ref, out_seed):
        z = pl.program_id(0)
        ox, oy, oz, vs = org_ref[0], org_ref[1], org_ref[2], org_ref[3]
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        px = ox + cols.astype(jnp.float32) * vs
        py = oy + rows.astype(jnp.float32) * vs
        pz = oz + jnp.float32(z) * vs
        planes = {-1: seed_m[0], 0: seed_0[0], 1: seed_p[0]}

        def seed_d2(seed):
            sx = (seed & _MASK10).astype(jnp.float32)
            sy = ((seed >> 10) & _MASK10).astype(jnp.float32)
            sz = ((seed >> 20) & _MASK10).astype(jnp.float32)
            d2 = ((px - (ox + sx * vs)) ** 2
                  + (py - (oy + sy * vs)) ** 2
                  + (pz - (oz + sz * vs)) ** 2)
            return jnp.where(seed < 0, jnp.float32(jnp.inf), d2)

        if variant == "rolls":
            # All data movement of the legacy loop, fold = integer min.
            best = planes[0]
            for dz, dy, dx in _candidates():
                p = planes[dz]
                r = jnp.roll(p, -dy * k, axis=0) if dy else p
                r = jnp.roll(r, -dx * k, axis=1) if dx else r
                best = jnp.minimum(best, r)
            out_seed[0] = best
            return

        if variant == "alu":
            # All seed_d2 folds, zero rolls; XOR with a per-candidate
            # constant defeats CSE while keeping the op count honest.
            best_seed = planes[0]
            best_d2 = seed_d2(best_seed)
            i = 1
            for dz, dy, dx in _candidates():
                nseed = planes[dz] ^ jnp.int32(i)
                i += 1
                d2 = seed_d2(nseed)
                better = d2 < best_d2
                best_d2 = jnp.where(better, d2, best_d2)
                best_seed = jnp.where(better, nseed, best_seed)
            out_seed[0] = best_seed
            return

        best_seed = planes[0]
        best_d2 = seed_d2(best_seed)
        if variant == "legacy":
            for dz in (-1, 0, 1):
                zn = z + dz * k
                plane_ok = jnp.logical_and(zn >= 0, zn < n)
                plane = planes[dz]
                for dy in (-1, 0, 1):
                    ry = jnp.roll(plane, -dy * k, axis=0) if dy else plane
                    vy = ((rows + dy * k >= 0) & (rows + dy * k < n)
                          if dy else None)
                    for dx in (-1, 0, 1):
                        if dz == 0 and dy == 0 and dx == 0:
                            continue
                        nseed = jnp.roll(ry, -dx * k, axis=1) if dx else ry
                        valid = plane_ok
                        if vy is not None:
                            valid = vy & valid
                        if dx:
                            valid = (valid & (cols + dx * k >= 0)
                                     & (cols + dx * k < n))
                        nseed = jnp.where(valid, nseed, jnp.int32(-1))
                        d2 = seed_d2(nseed)
                        better = d2 < best_d2
                        best_d2 = jnp.where(better, d2, best_d2)
                        best_seed = jnp.where(better, nseed, best_seed)
            out_seed[0] = best_seed
            return

        # hoist / hoistv: lane rolls once per (plane, dx), sublane rolls
        # per candidate; SAME fold order as legacy -> bit-identical.
        vx = {dx: ((cols + dx * k >= 0) & (cols + dx * k < n)) if dx else None
              for dx in (-1, 0, 1)}
        vym = {dy: ((rows + dy * k >= 0) & (rows + dy * k < n)) if dy else None
               for dy in (-1, 0, 1)}
        for dz in (-1, 0, 1):
            zn = z + dz * k
            plane_ok = jnp.logical_and(zn >= 0, zn < n)
            plane = planes[dz]
            rx = {dx: jnp.roll(plane, -dx * k, axis=1) if dx else plane
                  for dx in (-1, 0, 1)}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dz == 0 and dy == 0 and dx == 0:
                        continue
                    nseed = (jnp.roll(rx[dx], -dy * k, axis=0)
                             if dy else rx[dx])
                    valid = plane_ok
                    if vym[dy] is not None:
                        valid = vym[dy] & valid
                    if vx[dx] is not None:
                        valid = valid & vx[dx]
                    if variant == "hoistv":
                        # Garbage (wrapped/out-of-plane) candidates get
                        # d2 = inf in ONE select; inf is never strictly
                        # less, so best_seed never picks them.
                        d2 = jnp.where(valid & (nseed >= 0),
                                       seed_d2(nseed), jnp.float32(jnp.inf))
                    else:
                        nseed = jnp.where(valid, nseed, jnp.int32(-1))
                        d2 = seed_d2(nseed)
                    better = d2 < best_d2
                    best_d2 = jnp.where(better, d2, best_d2)
                    best_seed = jnp.where(better, nseed, best_seed)
        out_seed[0] = best_seed

    return kernel


def _step(seed, org, k: int, n: int, variant: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def zmap(dz):
        return lambda z: (jnp.clip(z + dz * k, 0, n - 1), 0, 0)

    plane = lambda dz: pl.BlockSpec((1, n, n), zmap(dz))
    return pl.pallas_call(
        _kernel(n, k, variant),
        grid=(n,),
        in_specs=[plane(-1), plane(0), plane(1),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, n, n), lambda z: (z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 if n <= 512 else 127) * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(seed, seed, seed, org)


def main():
    n = int(os.environ.get("JFA_MICRO_N", "512"))
    ks = [int(s) for s in os.environ.get("JFA_MICRO_K", "4,128").split(",")]
    iters = int(os.environ.get("JFA_MICRO_ITERS", "5"))

    # A plausible seed state: ball-shell seeds, most voxels empty.
    from voxtpu.grids.voxel_grid import GridSpec
    from voxtpu.ops.jfa import jfa_init_seed

    ax = np.arange(n, dtype=np.float32) - n / 2
    r2 = (ax[:, None, None] ** 2 + ax[None, :, None] ** 2
          + ax[None, None, :] ** 2)
    occ = jnp.asarray(r2 <= (0.3 * n) ** 2)
    spec = GridSpec(n=n, origin=(0.0, 0.0, 0.0), voxel_size=1.0 / n)
    seed = jfa_init_seed(occ)
    org = jnp.asarray(
        [spec.origin[0], spec.origin[1], spec.origin[2], spec.voxel_size],
        jnp.float32)
    seed.block_until_ready()

    for k in ks:
        ref = None
        for variant in ("legacy", "hoist", "hoistv", "rolls", "alu"):
            fn = jax.jit(lambda s, o, k=k, v=variant: _step(s, o, k, n, v))
            out = fn(seed, org)
            out.block_until_ready()
            if variant == "legacy":
                ref = out
            elif variant in ("hoist", "hoistv"):
                diff = int(jnp.sum(out != ref))
                assert diff == 0, f"{variant} k={k}: {diff} mismatches"
            dt = time_device_fn(fn, seed, org, iters=iters, repeats=3)
            print(f"n={n} k={k:4d} {variant:7s}: {dt*1e3:8.3f} ms",
                  flush=True)
            del out
    print("probe_jfa_micro done")


if __name__ == "__main__":
    main()
