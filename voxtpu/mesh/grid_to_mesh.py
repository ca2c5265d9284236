"""Grid -> mesh exporters (inverse direction: voxels to renderable geometry).

Equivalents of `vplib/src/mesh/grid_to_mesh.{h,cpp}`:

- :func:`voxels_grid_to_mesh_compressed` — boundary-quad surface with
  deduplicated lattice vertices (`grid_to_mesh.cpp:9-62`). The reference
  walks voxels sequentially with an unordered_map + per-plane bitsets;
  we compute all exposed faces with vectorized shifts and dedupe with
  `np.unique` — same output geometry, different (sorted) ordering.
- :func:`voxels_grid_to_mesh` — one colored cube per voxel, SDF color ramp
  (`grid_to_mesh.cpp:65-172`).
- :func:`voxels_grid_to_point_cloud` — SDF-colored voxel-center points
  (`grid_to_mesh.cpp:176-201`).
- :func:`sdf_to_rgb` — cbrt blue->red ramp (`grid_to_mesh.h:15-22`).

These run on host (export prep is I/O-bound); inputs are dense NumPy
occupancy (and SDF) grids in [z, y, x] order.
"""

from __future__ import annotations

import numpy as np

from voxtpu.grids.voxel_grid import GridSpec
from voxtpu.mesh.mesh import Mesh

# Canonical normal set, same 6 directions as `grid_to_mesh.cpp:22-29`.
_NORMALS = np.array(
    [(0, 0, 1), (0, 1, 0), (1, 0, 0), (0, 0, -1), (0, -1, 0), (-1, 0, 0)],
    np.float32,
)
_NORMAL_INDEX = {(0, 0, 1): 0, (0, 1, 0): 1, (1, 0, 0): 2,
                 (0, 0, -1): 3, (0, -1, 0): 4, (-1, 0, 0): 5}


def sdf_to_rgb(v: np.ndarray, vmax: float) -> np.ndarray:
    """cbrt-eased blue->red ramp over [0, vmax] (`grid_to_mesh.h:15-22`)."""
    t = np.clip(np.nan_to_num(v, nan=0.0, posinf=vmax), 0.0, vmax) / vmax
    t = np.cbrt(t)
    rgb = np.stack([t, np.zeros_like(t), 1.0 - t], axis=-1)
    return rgb


def _shift_occ(occ, d, axis):
    """occ shifted by d along axis with False outside the grid."""
    out = np.zeros_like(occ)
    n = occ.shape[axis]
    src = [slice(None)] * 3
    dst = [slice(None)] * 3
    if d > 0:
        src[axis], dst[axis] = slice(0, n - d), slice(d, n)
    elif d < 0:
        src[axis], dst[axis] = slice(-d, n), slice(0, n + d)
    out[tuple(dst)] = occ[tuple(src)]
    return out


def voxels_grid_to_mesh_compressed(occ: np.ndarray, spec: GridSpec) -> Mesh:
    """Boundary surface of the occupied set as a deduped triangle mesh."""
    occ = np.asarray(occ, bool)
    n = spec.n
    nv = n + 1  # lattice vertices per side

    # (u_axis, v_axis) per world axis chosen so that u x v = +axis.
    # axis indices are world x=0, y=1, z=2; grid arrays are [z, y, x].
    bases = {0: (1, 2), 1: (2, 0), 2: (0, 1)}

    tri_vids = []
    tri_nids = []
    for world_axis in range(3):
        arr_axis = 2 - world_axis  # x->2, y->1, z->0 in [z,y,x] arrays
        for front in (0, 1):
            d = 1 if front else -1
            exposed = occ & ~_shift_occ(occ, -d, arr_axis)
            zz, yy, xx = np.nonzero(exposed)
            if xx.size == 0:
                continue
            vox = np.stack([xx, yy, zz], axis=1).astype(np.int64)  # (M, 3) xyz
            plane = vox[:, world_axis] + front
            ua, va = bases[world_axis]
            if not front:
                ua, va = va, ua  # flip winding for the back face

            def corner(du, dv):
                c = vox.copy()
                c[:, world_axis] = plane
                c[:, ua] += du
                c[:, va] += dv
                return (c[:, 2] * nv + c[:, 1]) * nv + c[:, 0]

            c00, c10, c01, c11 = corner(0, 0), corner(1, 0), corner(0, 1), corner(1, 1)
            tri_vids.append(np.stack([c00, c10, c11], axis=1))
            tri_vids.append(np.stack([c00, c11, c01], axis=1))
            normal = [0, 0, 0]
            normal[world_axis] = d
            nid = _NORMAL_INDEX[tuple(normal)]
            tri_nids.append(np.full((xx.size, 3), nid, np.int32))
            tri_nids.append(np.full((xx.size, 3), nid, np.int32))

    if not tri_vids:
        return Mesh(name="compressed", normals=_NORMALS.copy())

    faces_flat = np.concatenate(tri_vids, axis=0)
    faces_normals = np.concatenate(tri_nids, axis=0)
    unique_vids, inverse = np.unique(faces_flat, return_inverse=True)
    faces = inverse.reshape(faces_flat.shape).astype(np.int32)

    vx = unique_vids % nv
    vy = (unique_vids // nv) % nv
    vz = unique_vids // (nv * nv)
    coords = np.stack(
        [
            spec.origin[0] + vx * spec.voxel_size,
            spec.origin[1] + vy * spec.voxel_size,
            spec.origin[2] + vz * spec.voxel_size,
        ],
        axis=1,
    ).astype(np.float32)
    colors = np.full((coords.shape[0], 4), 255, np.uint8)
    return Mesh(
        name="compressed",
        coords=coords,
        normals=_NORMALS.copy(),
        colors=colors,
        faces=faces,
        faces_normals=faces_normals,
    )


_CUBE_CORNERS = np.array(
    [(dx, dy, dz) for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)], np.int64
)
# 12 triangles over the 8 corners (index = dx + 2*dy + 4*dz), outward winding.
_CUBE_TRIS = np.array(
    [
        (0, 2, 1), (1, 2, 3),  # -z
        (4, 5, 6), (5, 7, 6),  # +z
        (0, 1, 4), (1, 5, 4),  # -y
        (2, 6, 3), (3, 6, 7),  # +y
        (0, 4, 2), (2, 4, 6),  # -x
        (1, 3, 5), (3, 7, 5),  # +x
    ],
    np.int64,
)
_CUBE_TRI_NORMALS = np.array([3, 3, 0, 0, 4, 4, 1, 1, 5, 5, 2, 2], np.int32)


def voxels_grid_to_mesh(occ: np.ndarray, sdf: np.ndarray, spec: GridSpec) -> Mesh:
    """One cube per occupied voxel with finite SDF, colored by sqrt(sdf)."""
    occ = np.asarray(occ, bool)
    sdf = np.asarray(sdf, np.float32)
    sel = occ & np.isfinite(sdf)
    zz, yy, xx = np.nonzero(sel)
    vs = spec.voxel_size
    vmax = float(np.sqrt((spec.n * vs) ** 2 * 3))

    base = np.stack([xx, yy, zz], axis=1)  # (M, 3) xyz voxel indices
    corners = base[:, None, :] + _CUBE_CORNERS[None]  # (M, 8, 3)
    coords = (corners * vs + np.asarray(spec.origin)).reshape(-1, 3).astype(np.float32)

    rgb = sdf_to_rgb(np.sqrt(np.maximum(sdf[zz, yy, xx], 0.0)), vmax)
    colors = np.clip(np.round(rgb * 255), 0, 255).astype(np.uint8)
    colors = np.repeat(colors, 8, axis=0)
    colors = np.concatenate([colors, np.full((colors.shape[0], 1), 255, np.uint8)], 1)

    m = base.shape[0]
    offs = (np.arange(m, dtype=np.int64) * 8)[:, None, None]
    faces = (offs + _CUBE_TRIS[None]).reshape(-1, 3).astype(np.int32)
    fnormals = np.tile(_CUBE_TRI_NORMALS, m)
    faces_normals = np.repeat(fnormals, 3).reshape(-1, 3).astype(np.int32)
    return Mesh(
        name="voxels",
        coords=coords,
        normals=_NORMALS.copy(),
        colors=colors,
        faces=faces,
        faces_normals=faces_normals,
    )


def voxels_grid_to_point_cloud(occ: np.ndarray, sdf: np.ndarray, spec: GridSpec) -> Mesh:
    """Voxel-center point cloud of the occupied set, SDF-colored."""
    occ = np.asarray(occ, bool)
    sdf = np.asarray(sdf, np.float32)
    zz, yy, xx = np.nonzero(occ)
    vs = spec.voxel_size
    vmax = float(np.sqrt((spec.n * vs) ** 2 * 3))
    coords = np.stack(
        [
            spec.origin[0] + xx * vs + vs / 2,
            spec.origin[1] + yy * vs + vs / 2,
            spec.origin[2] + zz * vs + vs / 2,
        ],
        axis=1,
    ).astype(np.float32)
    with np.errstate(invalid="ignore"):
        rgb = sdf_to_rgb(np.sqrt(np.abs(sdf[zz, yy, xx])), vmax)
    colors = np.clip(np.round(rgb * 255), 0, 255).astype(np.uint8)
    colors = np.concatenate([colors, np.full((colors.shape[0], 1), 255, np.uint8)], 1)
    return Mesh(name="points", coords=coords, colors=colors)
