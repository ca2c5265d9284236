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


# Plain int, not jnp.int32(-1): a module-level device array would
# initialize the JAX backend as an import side effect.
_NO_SEED = -1


def jfa_init_seed(occ):
    """Seed detection returning the flood state as ONE packed int32 seed
    grid: 10-bit (z, y, x) fields for seeds, -1 where no seed is known.

    The 26-view flood loop is HBM-bound on re-reads of the state (each
    shifted view re-streams the whole array), so the winning layout is
    the *smallest possible state*: the sdf value is recomputable from
    the seed (8 flops) and does not travel between steps; validity is
    seed >= 0 (d2 of the -1 sentinel is forced to +inf).
    """
    n = occ.shape[0]
    all_n = jnp.ones_like(occ)
    for dz, dy, dx in _OFFSETS:
        all_n &= _shift3(occ, dz, dy, dx, False)
    boundary = occ & ~all_n
    packed = (
        (jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 0) << 20)
        | (jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 1) << 10)
        | jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 2)
    )
    return jnp.where(boundary, packed, _NO_SEED)


def _seed_d2(seed, origin, vs, px, py, pz):
    """Squared world distance voxel->seed; +inf for the -1 sentinel
    (world coords reconstructed exactly as the reference computes them,
    `jfa/sequential.cpp:31-33`: origin + idx * voxel_size, float32)."""
    mask10 = jnp.int32(0x3FF)
    sx = (seed & mask10).astype(jnp.float32)
    sy = ((seed >> 10) & mask10).astype(jnp.float32)
    sz = ((seed >> 20) & mask10).astype(jnp.float32)
    d2 = (
        (px - (origin[0] + sx * vs)) ** 2
        + (py - (origin[1] + sy * vs)) ** 2
        + (pz - (origin[2] + sz * vs)) ** 2
    )
    return jnp.where(seed < 0, jnp.float32(jnp.inf), d2)


def _flood_step_seed(seed, k: int, n: int, origin, vs, px, py, pz):
    """One JFA pass (`jfa/sequential.cpp:72-125`): scan 26 neighbors at
    stride k, keep the seed with minimum squared distance. Strict `<`
    with the reference's offset order preserves its tie-breaking."""
    # Pad once per step; the 26 neighbor views are then static slices of
    # the same buffer (XLA fuses slices into the elementwise min-chain).
    pseed = jnp.pad(seed, k, constant_values=_NO_SEED)

    def view(dz, dy, dx):
        return pseed[
            k + dz * k : k + dz * k + n,
            k + dy * k : k + dy * k + n,
            k + dx * k : k + dx * k + n,
        ]

    best_d2 = _seed_d2(seed, origin, vs, px, py, pz)
    for dz, dy, dx in _OFFSETS:
        nseed = view(dz, dy, dx)
        d2 = _seed_d2(nseed, origin, vs, px, py, pz)
        better = d2 < best_d2
        best_d2 = jnp.where(better, d2, best_d2)
        seed = jnp.where(better, nseed, seed)
    return seed


@functools.partial(jax.jit, static_argnames=("n",))
def jfa_xla(occ, origin, voxel_size, *, n: int):
    """Full JFA: init + statically unrolled flood over k = N/2 ... 1.

    Requires N <= 1024: seed coordinates are 10-bit packed; larger N
    would silently corrupt the (z, y, x) fields.

    Output contract (== reference `jfa/sequential.cpp`): signed squared
    world-space distance; surface seeds 0, interior +, exterior -,
    unreached interior +inf / exterior -inf (caller-init convention,
    `apps/cli/main.cpp:200`).
    """
    if n > 1024:
        raise ValueError("jfa_xla supports N <= 1024 (10-bit packed seeds); "
                         "use the sharded path for larger grids")
    origin = jnp.asarray(origin, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    seed = jfa_init_seed(occ)
    px, py, pz = _corner_coords(n, origin, vs)
    k = n // 2
    while k >= 1:
        seed = _flood_step_seed(seed, k, n, origin, vs, px, py, pz)
        k //= 2
    sign = jnp.where(occ, jnp.float32(1), jnp.float32(-1))
    return sign * _seed_d2(seed, origin, vs, px, py, pz)


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
