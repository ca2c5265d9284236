"""Wavefront OBJ import/export.

Feature parity with the reference importer/exporter
(`vplib/src/mesh/mesh_io.cpp:15-131`):

- Imports ``v x y z`` with the optional per-vertex RGB color extension
  (``v x y z r g b``, `mesh_io.cpp:57-59`), ``vn``, and triangular faces.
- Exports colored vertices, normals and ``f v//vn`` faces with fixed
  6-decimal precision (`mesh_io.cpp:92-120`).

Documented divergences from reference quirks (SURVEY.md §7):
- The reference stores the *green* channel in both G and B on import
  (`mesh_io.cpp:59` passes ``g`` twice) — we read R, G, B correctly.
- The reference's face parser only understands ``v//vn`` triplets
  (`mesh_io.cpp:66` sscanf) and leaves the normal index uninitialized for
  ``v`` or ``v/vt/vn`` forms; we accept ``v``, ``v/vt``, ``v//vn`` and
  ``v/vt/vn`` and default missing normal indices to the vertex index.

If the native C++ parser extension is available it is used for large
files (see `voxtpu/native`); this pure-Python path is the fallback and
the specification.
"""

from __future__ import annotations

import os

import numpy as np

from voxtpu.mesh.mesh import Mesh


def _parse_float_block(lines: list[str], width_choices=(3, 6)) -> np.ndarray:
    if not lines:
        return np.zeros((0, 3), np.float32)
    tokens = " ".join(lines).split()
    try:
        vals = np.array(tokens, dtype=np.float32)
    except ValueError:
        vals = None  # non-numeric tokens somewhere: per-row fallback
    if vals is not None:
        for w in width_choices:
            if vals.size % w == 0 and len(lines) * w == vals.size:
                return vals.reshape(-1, w)
    # Ragged rows (e.g. a file mixing "v x y z" and "v x y z r g b", or
    # 4-component "v x y z w"): parse per line, keep coords, and keep
    # colors only when EVERY row carries three numeric channels.
    rows = [ln.split() for ln in lines]
    bad = next((i for i, r in enumerate(rows) if len(r) < 3), None)
    if bad is not None:
        raise ValueError(
            f"OBJ float row {bad + 1} has {len(rows[bad])} component(s); "
            "expected at least 3 (x y z)"
        )
    try:
        coords = np.array([r[:3] for r in rows], np.float32)
    except ValueError as e:
        raise ValueError(f"non-numeric OBJ vertex/normal component: {e}") from None
    if all(len(r) >= 6 for r in rows):
        try:
            rgb = np.array([r[3:6] for r in rows], np.float32)
        except ValueError:
            return coords  # trailing tokens are not colors (e.g. comments)
        return np.concatenate([coords, rgb], axis=1)
    return coords


def import_mesh(filename: str | os.PathLike, use_native: bool = True) -> Mesh:
    """Parse an .obj file into a :class:`Mesh`. Triangular faces only."""
    filename = os.fspath(filename)
    ext = os.path.splitext(filename)[1].lower()
    if ext != ".obj":
        raise ValueError(f"{ext!r} is a wrong file extension. It must be .obj")

    if use_native:
        try:
            from voxtpu.native import native_import_mesh

            m = native_import_mesh(filename)
            if m is not None:
                return m
        except ImportError:
            pass

    v_lines: list[str] = []
    vn_lines: list[str] = []
    f_lines: list[str] = []
    with open(filename, "r") as fh:
        for line in fh:
            if line.startswith("v "):
                v_lines.append(line[2:])
            elif line.startswith("vn "):
                vn_lines.append(line[3:])
            elif line.startswith("f "):
                f_lines.append(line[2:])

    coords = np.zeros((0, 3), np.float32)
    colors = np.zeros((0, 4), np.uint8)
    if v_lines:
        block = _parse_float_block(v_lines)
        coords = block[:, :3].astype(np.float32)
        if block.shape[1] >= 6:
            rgb = np.clip(np.round(block[:, 3:6] * 255.0), 0, 255).astype(np.uint8)
            colors = np.concatenate(
                [rgb, np.full((rgb.shape[0], 1), 255, np.uint8)], axis=1
            )

    normals = _parse_float_block(vn_lines)[:, :3] if vn_lines else np.zeros((0, 3), np.float32)

    faces = np.zeros((0, 3), np.int32)
    faces_normals = np.zeros((0, 3), np.int32)
    if f_lines:
        # Fast path: every face line uses the same "a", "a/b", "a//c" or
        # "a/b/c" form over EVERY vertex token (a probe of only the first
        # token could pass lines mixing forms internally and silently
        # misalign all indices); normalize to whitespace-separated ints.
        forms = {tok.count("/") * 10 + ("//" in tok)
                 for ln in f_lines for tok in ln.split()}
        # Token-less first line (e.g. "f" + trailing spaces) has no form
        # to probe — route through the per-line path, which reports the
        # offending line number instead of an IndexError here.
        uniform = len(forms) == 1 and bool(f_lines[0].split())
        vals = None
        if uniform:
            text = " \n".join(f_lines)
            probe = f_lines[0].split()[0]
            n_slash = probe.count("/")
            toks = text.replace("//", " ").replace("/", " ").split()
            vals = np.array(toks, dtype=np.int64)
            # Exact triangular size: 3 vertices x (1, 2 or 3) ints each.
            ints_per_vert = {0: 1, 1: 2}.get(
                n_slash, 2 if "//" in probe else 3
            )
            uniform = vals.size == len(f_lines) * 3 * ints_per_vert
        if uniform:
            if n_slash == 0:
                vi = vals.reshape(-1, 3)
                ni = vi
            elif n_slash == 1:
                pairs = vals.reshape(-1, 6)
                vi = pairs[:, 0::2]
                ni = vi
            else:  # v//vn (2 ints after collapse) or v/vt/vn (3 ints)
                per_vert = vals.size // (len(f_lines) * 3)
                tri = vals.reshape(-1, 3 * per_vert)
                vi = tri[:, 0::per_vert]
                ni = tri[:, per_vert - 1 :: per_vert]
        else:
            # Mixed forms within one file: parse per token (slower but
            # correct; the probe-only detection would misalign indices).
            vi_rows, ni_rows = [], []
            for lineno, ln in enumerate(f_lines, 1):
                toks = ln.split()
                if len(toks) != 3:
                    raise ValueError(
                        f"face {lineno} has {len(toks)} vertices; only "
                        "triangular faces are supported (triangulate "
                        "quads/ngons before import)"
                    )
                vs, ns = [], []
                for tok in toks:
                    parts = tok.split("/")
                    vs.append(int(parts[0]))
                    ns.append(int(parts[2]) if len(parts) == 3 and parts[2]
                              else int(parts[0]))
                vi_rows.append(vs)
                ni_rows.append(ns)
            vi = np.asarray(vi_rows, np.int64)
            ni = np.asarray(ni_rows, np.int64)
        faces = (vi - 1).astype(np.int32)
        faces_normals = (ni - 1).astype(np.int32)

    mesh = Mesh(
        name=filename,
        coords=coords,
        normals=normals,
        colors=colors,
        faces=faces,
        faces_normals=faces_normals,
    )
    mesh.validate()
    return mesh


def export_mesh(filename: str | os.PathLike, mesh: Mesh, use_native: bool = True) -> None:
    """Write a Mesh as .obj (colored vertices, normals, ``f v//vn`` faces)."""
    filename = os.fspath(filename)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)

    if use_native:
        try:
            from voxtpu.native import native_export_mesh

            if native_export_mesh(filename, mesh):
                return
        except ImportError:
            pass

    V = mesh.num_vertices
    F = mesh.num_faces
    colors = mesh.colors
    if colors is None or colors.shape[0] != V:
        colors = np.full((V, 4), 255, np.uint8)

    parts = [
        "# OBJ file written by voxtpu\n"
        f"# Vertices: {V}\n"
        f"# Faces: {F}\n"
    ]
    if V:
        vblock = np.concatenate(
            [mesh.coords.astype(np.float64), colors[:, :3].astype(np.float64) / 255.0],
            axis=1,
        )
        rows = [f"v {a:.6f} {b:.6f} {c:.6f} {r:.6f} {g:.6f} {bl:.6f}" for a, b, c, r, g, bl in vblock]
        parts.append("\n".join(rows) + "\n\n")
    if mesh.normals.shape[0]:
        rows = [f"vn {a:.6f} {b:.6f} {c:.6f}" for a, b, c in mesh.normals.astype(np.float64)]
        parts.append("\n".join(rows) + "\n\n")
    if F:
        fn = mesh.faces_normals
        if fn is None or fn.shape[0] != F:
            fn = mesh.faces
        vi = mesh.faces.astype(np.int64) + 1
        ni = fn.astype(np.int64) + 1
        rows = [
            f"f {a}//{na} {b}//{nb} {c}//{nc}"
            for (a, b, c), (na, nb, nc) in zip(vi, ni)
        ]
        parts.append("\n".join(rows) + "\n")

    with open(filename, "w") as fh:
        fh.write("".join(parts))
