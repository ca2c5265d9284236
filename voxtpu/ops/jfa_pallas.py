"""Pallas TPU JFA — VMEM-tiled flood steps.

Performance path for the SDF op (reference: `jfa/tiled.cu`). Each flood
step at stride k runs one Pallas kernel with a grid over Z planes; the
kernel receives the three source planes z-k, z, z+k (sdf + packed seed
index each) as VMEM blocks, materializes the 9 in-plane (y, x) shifts by
static slicing of an inf-padded copy, and reduces the 26 candidates with
vectorized min-updates. Every grid element is read at most 3x from HBM
per step (once per z-offset), vs. the reference's 26 strided global
reads per voxel in its naive fallback (`jfa/naive.cu:62-119`, used for
every k > 2 even by the "tiled" backend, `jfa/tiled.cu:318-322`).

The k sequence N/2 ... 1 is static, so the entire flood (log2 N pallas
calls + the XLA seed init) compiles as ONE jit; ping-pong buffers are
SSA values. Seeds travel as 10-bit-packed (z, y, x) int32 (supports
N <= 1024); world coordinates are reconstructed exactly as the
reference computed them (origin + idx * voxel_size in float32).

VMEM budget: 8 planes of N^2 f32/i32 -> N <= 512 on a 16MB core; larger
grids use the XLA backend (or the sharded path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.ops.jfa import jfa_init

_MASK10 = 0x3FF


def _step_kernel(n: int, k: int):
    from jax.experimental import pallas as pl

    def kernel(sdf_m, sdf_0, sdf_p, seed_m, seed_0, seed_p,
               org_ref, out_sdf, out_seed):
        z = pl.program_id(0)
        ox, oy, oz, vs = org_ref[0], org_ref[1], org_ref[2], org_ref[3]

        center_sdf = sdf_0[0]
        center_seed = seed_0[0]
        best = center_sdf
        best_abs = jnp.abs(center_sdf)
        best_seed = center_seed
        sign = jnp.where(jnp.signbit(center_sdf), jnp.float32(-1), jnp.float32(1))

        yy = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1)
        px = ox + xx * vs
        py = oy + yy * vs
        pz = oz + (jnp.float32(z)) * vs

        planes = ((sdf_m, seed_m, -1), (sdf_0, seed_0, 0), (sdf_p, seed_p, 1))
        for sdf_ref, seed_ref, dz in planes:
            zn = z + dz * k
            plane_ok = jnp.logical_and(zn >= 0, zn < n)
            psdf = jnp.pad(sdf_ref[0], k, constant_values=jnp.inf)
            pseed = jnp.pad(seed_ref[0], k, constant_values=0)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dz == 0 and dy == 0 and dx == 0:
                        continue
                    nsdf = psdf[k + dy * k : k + dy * k + n,
                                k + dx * k : k + dx * k + n]
                    nseed = pseed[k + dy * k : k + dy * k + n,
                                  k + dx * k : k + dx * k + n]
                    valid = jnp.isfinite(nsdf) & plane_ok
                    sx = (nseed & _MASK10).astype(jnp.float32)
                    sy = ((nseed >> 10) & _MASK10).astype(jnp.float32)
                    sz = ((nseed >> 20) & _MASK10).astype(jnp.float32)
                    d2 = ((px - (ox + sx * vs)) ** 2
                          + (py - (oy + sy * vs)) ** 2
                          + (pz - (oz + sz * vs)) ** 2)
                    better = valid & (d2 < best_abs)
                    best = jnp.where(better, sign * d2, best)
                    best_abs = jnp.where(better, d2, best_abs)
                    best_seed = jnp.where(better, nseed, best_seed)
        out_sdf[0] = best
        out_seed[0] = best_seed

    return kernel


def _flood_step_pallas(sdf, seed, org, k: int, n: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def zmap(dz):
        return lambda z: (jnp.clip(z + dz * k, 0, n - 1), 0, 0)

    plane = lambda dz: pl.BlockSpec((1, n, n), zmap(dz))
    return pl.pallas_call(
        _step_kernel(n, k),
        grid=(n,),
        in_specs=[plane(-1), plane(0), plane(1),
                  plane(-1), plane(0), plane(1),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((1, n, n), lambda z: (z, 0, 0)),
                   pl.BlockSpec((1, n, n), lambda z: (z, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n, n, n), jnp.float32),
                   jax.ShapeDtypeStruct((n, n, n), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(sdf, sdf, sdf, seed, seed, seed, org)


@functools.partial(jax.jit, static_argnames=("n",))
def _jfa_pallas(occ, origin, voxel_size, *, n: int):
    origin = jnp.asarray(origin, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    sdf, seed = jfa_init(occ, origin, vs)
    org = jnp.concatenate([origin, vs[None]]).astype(jnp.float32)
    k = n // 2
    while k >= 1:
        sdf, seed = _flood_step_pallas(sdf, seed, org, k, n)
        k //= 2
    return sdf


def jfa_pallas(occ, spec: GridSpec):
    """Signed squared distance field via VMEM-tiled Pallas flood steps."""
    if spec.n > 512:
        raise ValueError("pallas JFA supports N <= 512 (VMEM); use xla/sharded")
    return _jfa_pallas(occ, spec.origin, spec.voxel_size, n=spec.n)
