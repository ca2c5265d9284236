"""ctypes bindings for the native C++/OpenMP host library.

The library builds on demand (`make -C voxtpu/native`, ~2 s) and loads
lazily; every entry point raises ImportError when g++/the .so is
unavailable so callers can fall back to the pure-Python paths.

Exposes:
- native_import_mesh / native_export_mesh — fast OBJ I/O (C5 analog)
- native_voxelize — OpenMP solid voxelizer (V3 analog, dense bool out)
- native_jfa — OpenMP Jump-Flooding SDF (J3 analog)
- native_csg — OpenMP packed CSG word fold (S2 analog)
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvoxnative.so")
_lib = None
_build_failed = False


class _VoxMesh(ctypes.Structure):
    _fields_ = [
        ("coords", ctypes.POINTER(ctypes.c_float)),
        ("num_vertices", ctypes.c_int32),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("num_normals", ctypes.c_int32),
        ("colors", ctypes.POINTER(ctypes.c_uint8)),
        ("has_colors", ctypes.c_int32),
        ("faces", ctypes.POINTER(ctypes.c_int32)),
        ("faces_normals", ctypes.POINTER(ctypes.c_int32)),
        ("num_faces", ctypes.c_int32),
    ]


def _load():
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        raise ImportError("voxnative build previously failed")
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_DIR, "voxnative.cpp")
    ):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "libvoxnative.so"],
                check=True, capture_output=True, text=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            _build_failed = True
            raise ImportError(f"voxnative build failed: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vox_import_obj.argtypes = [ctypes.c_char_p, ctypes.POINTER(_VoxMesh)]
    lib.vox_import_obj.restype = ctypes.c_int
    lib.vox_free_mesh.argtypes = [ctypes.POINTER(_VoxMesh)]
    lib.vox_export_obj.restype = ctypes.c_int
    lib.vox_voxelize.restype = ctypes.c_int
    lib.vox_jfa.restype = ctypes.c_int
    lib.vox_csg.restype = ctypes.c_int
    _lib = lib
    return lib


def _as_f32(a):
    return np.ascontiguousarray(a, np.float32)


def native_import_mesh(path: str):
    from voxtpu.mesh.mesh import Mesh

    lib = _load()
    out = _VoxMesh()
    rc = lib.vox_import_obj(path.encode(), ctypes.byref(out))
    if rc != 0:
        return None
    try:
        nv, nn, nf = out.num_vertices, out.num_normals, out.num_faces
        coords = np.ctypeslib.as_array(out.coords, (nv, 3)).copy() if nv else np.zeros((0, 3), np.float32)
        normals = np.ctypeslib.as_array(out.normals, (nn, 3)).copy() if nn else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(out.faces, (nf, 3)).copy() if nf else np.zeros((0, 3), np.int32)
        fnormals = np.ctypeslib.as_array(out.faces_normals, (nf, 3)).copy() if nf else np.zeros((0, 3), np.int32)
        if out.has_colors and nv:
            colors = np.ctypeslib.as_array(out.colors, (nv, 4)).copy()
        else:
            colors = np.zeros((0, 4), np.uint8)
    finally:
        lib.vox_free_mesh(ctypes.byref(out))
    mesh = Mesh(name=path, coords=coords, normals=normals, colors=colors,
                faces=faces, faces_normals=fnormals)
    # Same guard as the pure-Python importer (obj_io): out-of-range
    # (incl. OBJ-relative negative) indices must raise here, not
    # segfault later inside the C++ voxelizer's pointer arithmetic.
    mesh.validate()
    return mesh


def native_export_mesh(path: str, mesh) -> bool:
    lib = _load()
    nv = mesh.num_vertices
    nf = mesh.num_faces
    colors = mesh.colors
    if colors is None or colors.shape[0] != nv:
        colors = np.full((nv, 4), 255, np.uint8)
    colors = np.ascontiguousarray(colors, np.uint8)
    coords = _as_f32(mesh.coords)
    normals = _as_f32(mesh.normals)
    fn = mesh.faces_normals
    if fn is None or fn.shape[0] != nf:
        fn = mesh.faces
    faces = np.ascontiguousarray(mesh.faces, np.int32)
    fn = np.ascontiguousarray(fn, np.int32)
    rc = lib.vox_export_obj(
        path.encode(),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nv,
        normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(normals.shape[0]),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nf,
    )
    return rc == 0


def native_voxelize(mesh, spec) -> np.ndarray:
    """OpenMP solid voxelization -> dense bool [z, y, x]."""
    lib = _load()
    n = spec.n
    coords = _as_f32(mesh.coords)
    faces = np.ascontiguousarray(mesh.faces, np.int32)
    origin = _as_f32(spec.origin)
    occ = np.zeros((n, n, n), np.uint8)
    rc = lib.vox_voxelize(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(mesh.num_faces), n,
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(spec.voxel_size),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"vox_voxelize failed rc={rc}")
    return occ.view(np.bool_)  # C++ writes 0/1 bytes; view is copy-free


def native_jfa(occ: np.ndarray, spec) -> np.ndarray:
    if spec.n > (1 << 21):
        raise ValueError("native JFA seeds pack 21-bit coordinate fields "
                         "(N <= 2^21); host memory is the practical limit")
    lib = _load()
    n = spec.n
    occ8 = np.ascontiguousarray(occ, np.uint8)
    origin = _as_f32(spec.origin)
    sdf = np.empty((n, n, n), np.float32)
    rc = lib.vox_jfa(
        occ8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(spec.voxel_size),
        sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"vox_jfa failed rc={rc}")
    return sdf


def native_csg(words1: np.ndarray, words2: np.ndarray, op: str) -> np.ndarray:
    lib = _load()
    ops = {"void": 0, "union": 1, "intersection": 2, "difference": 3}
    w1 = np.ascontiguousarray(words1, np.uint32).copy()
    w2 = np.ascontiguousarray(words2, np.uint32)
    rc = lib.vox_csg(
        w1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        w2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(w1.size), ops[op],
    )
    if rc != 0:
        raise RuntimeError(f"vox_csg failed rc={rc}")
    return w1.reshape(words1.shape)
