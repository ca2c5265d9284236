"""Jump Flooding Algorithm SDF — XLA backend.

TPU-first reformulation of the reference JFA
(`jfa/sequential.cpp:24-125` semantics; `jfa/naive.cu`, `jfa/tiled.cu`
performance paths):

- The flood stride sequence k = N/2, N/4, ..., 1 is *statically known*
  from N, so the host Python loop unrolls into one jitted graph of
  log2(N) steps with static-shift stencils (pad + slice, no gathers,
  no dynamic control flow). The reference launches one kernel per k
  from a host loop with full device-to-device grid copies in between
  (`jfa/naive.cu:160-174`, `jfa/tiled.cu:297-329`); here the ping-pong
  is just SSA dataflow and XLA fuses each step into a single pass.
- Seed positions: the reference carries a ``Grid<Position>`` of world
  coordinates (12 bytes/voxel). We carry a packed int32 *seed index*
  (flat voxel id) and recompute its corner coordinates on the fly —
  identical float32 values (origin + idx * voxel_size is exactly how the
  reference computed them at `jfa/sequential.cpp:31-33`), at 1/3 the
  HBM traffic. HBM bandwidth is the bottleneck of this op.

Output contract (== reference): float32 signed **squared** distance in
[z, y, x] order; surface seeds 0, interior positive, exterior negative;
unreached voxels keep +/-inf (caller init -inf, `apps/cli/main.cpp:200`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from voxtpu.grids.voxel_grid import GridSpec, VoxelGrid

_OFFSETS = tuple(
    (dz, dy, dx)
    for dz in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dx in (-1, 0, 1)
    if not (dz == 0 and dy == 0 and dx == 0)
)


def _shift3(a, dz: int, dy: int, dx: int, fill):
    """out[i] = a[i + (dz,dy,dx)] with `fill` where out of bounds (static)."""
    pads = []
    slices = []
    for d, size in zip((dz, dy, dx), a.shape):
        lo = max(0, -d)
        hi = max(0, d)
        pads.append((lo, hi))
        slices.append(slice(hi, hi + size) if d >= 0 else slice(0, size))
    padded = jnp.pad(a, pads, constant_values=fill)
    return padded[tuple(slices)]


def _corner_coords(n: int, origin, vs):
    zz = jax.lax.broadcasted_iota(jnp.float32, (n, n, n), 0)
    yy = jax.lax.broadcasted_iota(jnp.float32, (n, n, n), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (n, n, n), 2)
    return (origin[0] + xx * vs, origin[1] + yy * vs, origin[2] + zz * vs)


def jfa_init(occ, origin, vs):
    """Seed detection (`jfa/sequential.cpp:24-64`): an occupied voxel whose
    26-neighborhood touches an empty or out-of-grid voxel is a seed
    (sdf=0, seed=own index); interior occupied -> +inf; empty -> -inf."""
    n = occ.shape[0]
    all_n = jnp.ones_like(occ)
    for dz, dy, dx in _OFFSETS:
        all_n &= _shift3(occ, dz, dy, dx, False)
    boundary = occ & ~all_n
    sdf = jnp.where(
        boundary,
        jnp.float32(0),
        jnp.where(occ, jnp.float32(jnp.inf), jnp.float32(-jnp.inf)),
    )
    # Seed ids pack (z, y, x) in 10-bit fields (supports N <= 1024; the
    # reference caps packed grids at N % 32 == 0 and benches to 4096 with a
    # different memory layout — larger N uses the pallas path).
    packed = (
        (jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 0) << 20)
        | (jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 1) << 10)
        | jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 2)
    )
    seed = jnp.where(boundary, packed, jnp.int32(0))
    return sdf, seed


def _flood_step(sdf, seed, k: int, n: int, origin, vs, px, py, pz):
    """One JFA pass (`jfa/sequential.cpp:72-125`): scan 26 neighbors at
    stride k, keep the minimum squared distance to a known seed, preserve
    the sign of the center's current value (copysign semantics)."""
    best = sdf
    best_abs = jnp.abs(sdf)
    best_seed = seed
    sign = jnp.where(jnp.signbit(sdf), jnp.float32(-1), jnp.float32(1))
    mask10 = jnp.int32(0x3FF)
    # Pad once per step; the 26 neighbor views are then static slices of
    # the same buffer (XLA fuses slices into the elementwise min-chain).
    psdf = jnp.pad(sdf, k, constant_values=jnp.inf)
    pseed = jnp.pad(seed, k, constant_values=0)

    def view(p, dz, dy, dx):
        return p[
            k + dz * k : k + dz * k + n,
            k + dy * k : k + dy * k + n,
            k + dx * k : k + dx * k + n,
        ]

    for dz, dy, dx in _OFFSETS:
        nsdf = view(psdf, dz, dy, dx)
        nseed = view(pseed, dz, dy, dx)
        valid = jnp.isfinite(nsdf)
        sx = (nseed & mask10).astype(jnp.float32)
        sy = ((nseed >> 10) & mask10).astype(jnp.float32)
        sz = ((nseed >> 20) & mask10).astype(jnp.float32)
        wx = origin[0] + sx * vs
        wy = origin[1] + sy * vs
        wz = origin[2] + sz * vs
        d2 = (px - wx) ** 2 + (py - wy) ** 2 + (pz - wz) ** 2
        better = valid & (d2 < best_abs)
        best = jnp.where(better, sign * d2, best)
        best_abs = jnp.where(better, d2, best_abs)
        best_seed = jnp.where(better, nseed, best_seed)
    return best, best_seed


@functools.partial(jax.jit, static_argnames=("n",))
def jfa_xla(occ, origin, voxel_size, *, n: int):
    """Full JFA: init + statically unrolled flood over k = N/2 ... 1."""
    origin = jnp.asarray(origin, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    sdf, seed = jfa_init(occ, origin, vs)
    px, py, pz = _corner_coords(n, origin, vs)
    k = n // 2
    while k >= 1:
        sdf, seed = _flood_step(sdf, seed, k, n, origin, vs, px, py, pz)
        k //= 2
    return sdf


def jfa(grid: VoxelGrid | jnp.ndarray, spec: GridSpec | None = None,
        backend: str = "xla"):
    """Compute the signed squared distance field of an occupancy grid.

    Accepts a packed VoxelGrid or a dense bool array (+ spec).
    """
    if isinstance(grid, VoxelGrid):
        occ = grid.to_dense()
        spec = grid.spec() if spec is None else spec
    else:
        occ = jnp.asarray(grid, bool)
        if spec is None:
            raise ValueError("spec required for dense input")

    if backend == "reference":
        from voxtpu.ops.reference import jfa_ref
        import numpy as np

        return jnp.asarray(jfa_ref(np.asarray(occ), spec))
    if backend == "native":
        from voxtpu.native import native_jfa
        import numpy as np

        return jnp.asarray(native_jfa(np.asarray(occ), spec))
    if backend == "pallas":
        from voxtpu.ops.jfa_pallas import jfa_pallas

        return jfa_pallas(occ, spec)
    if backend != "xla":
        raise ValueError(f"unknown backend {backend!r}")
    return jfa_xla(occ, spec.origin, spec.voxel_size, n=spec.n)
