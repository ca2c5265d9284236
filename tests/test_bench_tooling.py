"""Battery-mode and in-process benchmark tooling (tunnel-consolidation
paths: one backend init must be able to serve a whole measurement
matrix, with per-item failure isolation)."""

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def _run_battery(items, monkeypatch):
    monkeypatch.setenv("BENCH_OP", "battery")
    monkeypatch.setenv("BENCH_BATTERY_ITEMS", json.dumps(items))
    import bench

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench._battery()
    return rc, buf.getvalue()


def test_battery_isolation_and_json_lines(monkeypatch):
    """One good item emits its JSON line; a bad item (N % 32 != 0) is
    isolated and flips the exit code without killing the battery."""
    items = [
        {"BENCH_OP": "csg", "BENCH_N": "32", "BENCH_FACES": "56172",
         "BENCH_ITERS": "2"},
        # BENCH_FACES pinned: the packing failure triggers before the
        # mesh matters, and the default would subdivide to 1.35M faces.
        {"BENCH_OP": "jfa", "BENCH_N": "33", "BENCH_ITERS": "1",
         "BENCH_FACES": "56172"},
    ]
    rc, out = _run_battery(items, monkeypatch)
    lines = [json.loads(l) for l in out.splitlines()
             if l.startswith("{")]
    assert rc == 1  # the N=33 item failed
    assert len(lines) == 1
    assert lines[0]["metric"].startswith("csg_union_packed_ms_32")
    assert lines[0]["value"] > 0
    # the ambient BENCH_OP=battery must not leak into items
    assert os.environ["BENCH_OP"] == "battery"


def test_benchmarks_runner_in_process(tmp_path, monkeypatch):
    """--in-process drives voxtpu.cli.main directly and writes the same
    per-(mesh, algo) CSVs as the subprocess contract."""
    import csv

    import scripts.benchmarks as bm

    monkeypatch.setattr(
        sys, "argv",
        ["benchmarks", "--meshes", "/root/reference/assets/d20.obj",
         "--types", "1", "--minsize", "32", "--maxsize", "32",
         "--niter", "2", "--no-sdf", "--output", str(tmp_path),
         "--in-process"])
    assert bm.main() == 0
    vox_csv = tmp_path / "d20" / "d20_xla_vox.csv"
    assert vox_csv.exists()
    with open(vox_csv) as fh:
        rows = list(csv.reader(fh))
    assert rows[0][0] == "size"
    assert "xla_vox" in rows[0]
    assert "xla_vox__processing" in rows[0]
    assert len(rows) == 3  # header + 2 iterations
    assert all(r[0] == "32" for r in rows[1:])


def test_grid_digest_detects_single_bit_flips():
    """The 4096^3 path verifies banded-vs-event equivalence by digest
    (two 8.6 GB grids cannot coexist in HBM): equal grids must agree,
    and any single-bit difference must flip the digest."""
    import numpy as np

    import bench

    rng = np.random.default_rng(7)
    words = rng.integers(0, 2**32, size=(8, 8, 2), dtype=np.uint32)
    d0 = tuple(int(x) for x in bench._grid_digest(words))
    assert d0 == tuple(int(x) for x in bench._grid_digest(words.copy()))
    for z, y, w, b in [(0, 0, 0, 0), (7, 3, 1, 31), (4, 7, 0, 13)]:
        flipped = words.copy()
        flipped[z, y, w] ^= np.uint32(1 << b)
        assert tuple(int(x) for x in bench._grid_digest(flipped)) != d0
