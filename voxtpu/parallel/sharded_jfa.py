"""Multi-device JFA: Z-sharded grid with k-halo exchange over ICI.

The CP/ring-attention-shaped component of this framework (SURVEY.md §5
"long-context analog"): the voxel grid is sharded along Z; each flood
step at stride k needs the best-seed planes at z +/- k, which live at
most one device away while k <= slab thickness. Two regimes:

- **k < slab**: exchange k-plane halos with `jax.lax.ppermute` (up and
  down along the "z" mesh axis), then run the local 26-neighbor stencil
  on the halo-padded slab. Communication: 2 * k * N^2 * 4 bytes.
- **k >= slab**: the first log2(dz) steps reach across several devices;
  `all_gather` the slabs (these early steps are few and the reference
  equivalently reads the whole grid each step).

State is ONE packed int32 seed grid (-1 = no seed), the same
HBM-traffic-minimal formulation as `voxtpu.ops.jfa.jfa_xla` — the flood
is memory-bound on state re-reads, and on the wire the halo is a single
int32 plane set instead of sdf + seed (or three coordinate planes).
Edge devices receive zero-filled halos from `ppermute` (no sender),
overridden to the -1 sentinel (out-of-grid neighbors are "skipped" in
the reference, `jfa/sequential.cpp:96-101`; d2(-1) = +inf loses every
strict `<` comparison).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.ops.jfa import _OFFSETS, _seed_d2


def _halo_exchange(arr, k: int, axis_name: str, fill):
    """Concatenate [lower k planes from z-1 device, arr, upper k planes
    from z+1 device] along axis 0 inside shard_map."""
    nz = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = arr[-k:]     # goes to device idx+1 as its lower halo
    bottom = arr[:k]   # goes to device idx-1 as its upper halo
    up_perm = [(i, i + 1) for i in range(nz - 1)]
    down_perm = [(i + 1, i) for i in range(nz - 1)]
    lower = jax.lax.ppermute(top, axis_name, up_perm)      # from idx-1
    upper = jax.lax.ppermute(bottom, axis_name, down_perm)  # from idx+1
    if fill is not None:
        lower = jnp.where(idx == 0, jnp.full_like(lower, fill), lower)
        upper = jnp.where(idx == nz - 1, jnp.full_like(upper, fill), upper)
    return jnp.concatenate([lower, arr, upper], axis=0)


def _local_coords(n: int, slab: int, origin, vs, axis_name: str):
    z0 = (jax.lax.axis_index(axis_name) * slab).astype(jnp.float32)
    zz = jax.lax.broadcasted_iota(jnp.float32, (slab, n, n), 0) + z0
    yy = jax.lax.broadcasted_iota(jnp.float32, (slab, n, n), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (slab, n, n), 2)
    return (origin[0] + xx * vs, origin[1] + yy * vs, origin[2] + zz * vs)


def _pad_yx(a, k: int, fill):
    return jnp.pad(a, ((0, 0), (k, k), (k, k)), constant_values=fill)


def _minimize(seed, best_d2, views_fn, origin, vs, px, py, pz):
    """Shared 26-neighbor minimization; views_fn(dz, dy, dx) -> plane."""
    for dz, dy, dx in _OFFSETS:
        nseed = views_fn(dz, dy, dx)
        d2 = _seed_d2(nseed, origin, vs, px, py, pz)
        better = d2 < best_d2
        best_d2 = jnp.where(better, d2, best_d2)
        seed = jnp.where(better, nseed, seed)
    return seed, best_d2


def _step_local(seed, k: int, n: int, slab: int, origin, vs, px, py, pz,
                axis_name: str):
    """One flood step on a Z-slab with k-halos (k < slab)."""
    pseed = _pad_yx(_halo_exchange(seed, k, axis_name, jnp.int32(-1)),
                    k, jnp.int32(-1))

    def view(dz, dy, dx):
        return pseed[k + dz * k : k + dz * k + slab,
                     k + dy * k : k + dy * k + n,
                     k + dx * k : k + dx * k + n]

    best_d2 = _seed_d2(seed, origin, vs, px, py, pz)
    return _minimize(seed, best_d2, view, origin, vs, px, py, pz)[0]


def _step_gathered(seed, k: int, n: int, slab: int, origin, vs, px, py, pz,
                   axis_name: str):
    """Flood step for k >= slab: all_gather the seed grid, dynamic-slice
    the local slab's neighbor views."""
    full = jax.lax.all_gather(seed, axis_name, tiled=True)  # (N, N, N)
    pseed = jnp.pad(full, k, constant_values=jnp.int32(-1))
    z0 = jax.lax.axis_index(axis_name) * slab

    def view(dz, dy, dx):
        return jax.lax.dynamic_slice(
            pseed, (z0 + k + dz * k, k + dy * k, k + dx * k), (slab, n, n)
        )

    best_d2 = _seed_d2(seed, origin, vs, px, py, pz)
    return _minimize(seed, best_d2, view, origin, vs, px, py, pz)[0]


def _init_local(occ, n: int, slab: int, axis_name: str):
    """Seed detection on a Z-slab with a 1-voxel halo; packed seed out."""
    hocc = _halo_exchange(occ, 1, axis_name, False)
    pocc = _pad_yx(hocc, 1, False)
    all_n = jnp.ones((slab, n, n), bool)
    for dz, dy, dx in _OFFSETS:
        all_n &= pocc[1 + dz : 1 + dz + slab, 1 + dy : 1 + dy + n,
                      1 + dx : 1 + dx + n]
    boundary = occ & ~all_n
    z0 = jax.lax.axis_index(axis_name).astype(jnp.int32) * slab
    packed = (
        ((jax.lax.broadcasted_iota(jnp.int32, (slab, n, n), 0) + z0) << 20)
        | (jax.lax.broadcasted_iota(jnp.int32, (slab, n, n), 1) << 10)
        | jax.lax.broadcasted_iota(jnp.int32, (slab, n, n), 2)
    )
    return jnp.where(boundary, packed, jnp.int32(-1))


def jfa_sharded(occ, spec: GridSpec, device_mesh: Mesh, axis_name: str = "z"):
    """Z-sharded JFA over a device mesh; returns the sharded SDF array."""
    n = spec.n
    if n > 1024:
        raise ValueError(
            "jfa_sharded supports N <= 1024: seeds are 10-bit packed "
            "(z, y, x) int32 fields; larger grids need a wider seed "
            "encoding (planned: int64 or slab-local coordinates)"
        )
    dz = device_mesh.shape[axis_name]
    if n % dz != 0:
        raise ValueError(f"N={n} must divide by z axis {dz}")
    slab = n // dz

    def fn(occ_slab):
        origin = jnp.asarray(spec.origin, jnp.float32)
        vs = jnp.float32(spec.voxel_size)
        seed = _init_local(occ_slab, n, slab, axis_name)
        px, py, pz = _local_coords(n, slab, origin, vs, axis_name)
        k = n // 2
        while k >= 1:
            if k < slab:
                seed = _step_local(seed, k, n, slab, origin, vs, px, py, pz,
                                   axis_name)
            else:
                seed = _step_gathered(seed, k, n, slab, origin, vs,
                                      px, py, pz, axis_name)
            k //= 2
        sign = jnp.where(occ_slab, jnp.float32(1), jnp.float32(-1))
        return sign * _seed_d2(seed, origin, vs, px, py, pz)

    in_spec = P(axis_name, None, None)
    return jax.jit(
        jax.shard_map(
            fn, mesh=device_mesh,
            in_specs=(in_spec,), out_specs=in_spec,
            check_vma=False,
        )
    )(occ)
