#!/usr/bin/env python
"""Benchmark runner: sweep meshes x backends x grid sizes through the CLI.

Keeps the reference harness's observable contract (SURVEY.md §3.5): runs
the CLI as a subprocess, scrapes ``[Label]: X ms`` profiling lines from
stdout, groups hierarchical ``Parent::Child`` labels into snake_case CSV
columns, and writes one CSV per (mesh, algorithm) under --output.

Usage:
    python scripts/benchmarks.py --folder /root/reference/assets \
        --types 1 2 --minsize 32 --maxsize 256 --niter 5 --output benchmarks

``--in-process`` runs the CLI by calling ``voxtpu.cli.main`` with
redirected stdout instead of spawning subprocesses — same scrape
contract, ONE backend init for the whole matrix. On the tunneled TPU
every subprocess re-pays init + plan H2D (80 s - 22 min variance,
BENCH_NOTES), which at a ~50-config matrix dominates the battery; the
reference's per-config cold process start only matters for iteration 1,
which the mean-excluding-max plots drop anyway.
"""

from __future__ import annotations

import argparse
import csv
import os
import re
import subprocess
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LINE_RE = re.compile(r"\[(.*)\]: ([\d.]+) ms")


def to_snake_case(name: str) -> str:
    name = name.replace("::", "__")
    name = re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", name)
    name = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", name)
    return re.sub(r"__+", "__", name.lower())


def scrape(stdout: str):
    """Yield per-iteration {column: ms} dicts keyed by main label."""
    per_main = defaultdict(list)
    current = {}
    for line in stdout.splitlines():
        m = LINE_RE.search(line)
        if not m:
            continue
        label = re.sub(r"\s*\(.*?\)", "", m.group(1))
        main = to_snake_case(label.split("::")[0])
        full = to_snake_case(label)
        value = float(m.group(2))
        current[full] = current.get(full, 0.0) + value
        if "__" not in full:  # main line closes one iteration
            per_main[main].append(dict(current))
            current.clear()
    return per_main


def _run_config(argv: list[str], in_process: bool) -> str | None:
    """One CLI config; returns its stdout text, or None on failure."""
    if not in_process:
        cmd = [sys.executable, "-m", "voxtpu.cli"] + argv
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"  FAILED rc={r.returncode}\n{r.stderr[-2000:]}",
                  file=sys.stderr)
            return None
        return r.stdout

    import contextlib
    import io
    import traceback

    from voxtpu.cli import main as cli_main

    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            rc = cli_main(argv)
    except Exception:
        print(f"  FAILED (in-process)\n{traceback.format_exc()[-2000:]}",
              file=sys.stderr)
        return None
    if rc != 0:
        print(f"  FAILED rc={rc}", file=sys.stderr)
        return None
    return buf.getvalue()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--niter", type=int, default=5)
    ap.add_argument("--folder", default="/root/reference/assets")
    ap.add_argument("--meshes", nargs="*", default=None,
                    help="specific .obj files (default: all in folder)")
    ap.add_argument("--minsize", type=int, default=32)
    ap.add_argument("--maxsize", type=int, default=128)
    ap.add_argument("--output", default="benchmarks")
    ap.add_argument("--no-sdf", action="store_true")
    ap.add_argument("--types", nargs="+", default=["1", "2"],
                    help="backends: 0=reference 1=xla 2=pallas 3=native")
    ap.add_argument("--device", default=None)
    ap.add_argument("--in-process", action="store_true",
                    help="call voxtpu.cli.main directly (one backend "
                         "init for the whole matrix; tunneled-TPU mode)")
    args = ap.parse_args()

    out_root = Path(args.output)
    out_root.mkdir(parents=True, exist_ok=True)

    if args.meshes:
        meshes = [Path(m) for m in args.meshes]
    else:
        meshes = sorted(Path(args.folder).glob("*.obj"))

    sizes = []
    s = args.minsize
    while s <= args.maxsize:
        sizes.append(s)
        s *= 2

    for mesh in meshes:
        all_data = defaultdict(dict)  # main -> size -> [iteration dicts]
        for t in args.types:
            for size in sizes:
                argv = [str(mesh), "-n", str(size), "-t", str(t),
                        "-m", str(args.niter), "-p", "1"]
                if not args.no_sdf and size <= 512:
                    argv.append("-s")
                if args.device:
                    argv += ["--device", args.device]
                print("Running:", " ".join(argv), flush=True)
                stdout = _run_config(argv, args.in_process)
                if stdout is None:
                    continue
                for main, iters in scrape(stdout).items():
                    all_data[main].setdefault(size, []).extend(iters)

        for main, by_size in all_data.items():
            cols = sorted({k for its in by_size.values() for it in its for k in it})
            out_dir = out_root / mesh.stem
            out_dir.mkdir(parents=True, exist_ok=True)
            with open(out_dir / f"{mesh.stem}_{main}.csv", "w", newline="") as fh:
                w = csv.writer(fh)
                w.writerow(["size"] + cols)
                for size in sorted(by_size):
                    for it in by_size[size]:
                        w.writerow([size] + [it.get(c, "") for c in cols])
    return 0


if __name__ == "__main__":
    sys.exit(main())
