#!/usr/bin/env python
"""Plot benchmark CSVs: runtime-vs-size comparison lines and per-stage
stacked bars (T2-T4 analog of the reference's plotting scripts).

    python scripts/plot_benchmarks.py benchmarks/sphere --out images/sphere
"""

from __future__ import annotations

import argparse
import csv
from collections import defaultdict
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def load_csv(path: Path):
    with open(path) as fh:
        rows = list(csv.reader(fh))
    header = rows[0]
    by_size = defaultdict(list)
    for row in rows[1:]:
        size = int(row[0])
        vals = {h: (float(v) if v else np.nan) for h, v in zip(header[1:], row[1:])}
        by_size[size].append(vals)
    return by_size


def robust_mean(vals):
    """Mean excluding the max sample, per column independently —
    the reference's exact semantics (plot_comparison.py:41-45); the
    dropped sample is usually but not necessarily the warm-up."""
    vals = [v for v in vals if np.isfinite(v)]
    if len(vals) > 2:
        vals = sorted(vals)[:-1]
    return float(np.mean(vals)) if vals else np.nan


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("folder", help="per-mesh CSV folder from benchmarks.py")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    # resolve(): running from inside the folder ('.') would make
    # folder.name empty and corrupt the algo-label strip below.
    folder = Path(args.folder).resolve()
    out = Path(args.out or folder / "plots")
    out.mkdir(parents=True, exist_ok=True)

    csvs = sorted(folder.glob("*.csv"))
    groups = defaultdict(dict)  # op ('vox'|'jfa'|'csg') -> algo -> data
    for f in csvs:
        op_suffix = f.stem.split("_")[-1]
        # e.g. "sphere_pallas_vox" -> algo "pallas_vox" (keying by the
        # op suffix alone would collapse different backends' CSVs).
        algo = f.stem.replace(folder.name + "_", "", 1)
        for op in ("vox", "jfa", "csg"):
            if op_suffix.endswith(op):
                groups[op][algo] = load_csv(f)

    for op, algos in groups.items():
        # comparison line plot
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for algo, by_size in sorted(algos.items()):
            sizes = sorted(by_size)
            main_col_candidates = [
                c for c in by_size[sizes[0]][0] if "__" not in c
            ]
            if not main_col_candidates:
                continue
            col = main_col_candidates[0]
            ys = [robust_mean([it.get(col, np.nan) for it in by_size[s]]) for s in sizes]
            ax.plot(sizes, ys, marker="o", label=algo)
        ax.set_xscale("log", base=2)
        ax.set_yscale("log")
        ax.set_xlabel("grid size (voxels/side)")
        ax.set_ylabel("runtime (ms)")
        ax.set_title(f"{folder.name} {op} comparison")
        ax.grid(True, alpha=0.3)
        ax.legend()
        fig.tight_layout()
        fig.savefig(out / f"{folder.name}_{op}_comparison.png", dpi=120)
        plt.close(fig)

        # per-stage stacked bars
        for algo, by_size in sorted(algos.items()):
            sizes = sorted(by_size)
            stage_cols = sorted(
                {c for s in sizes for it in by_size[s] for c in it if "__" in c}
            )
            if not stage_cols:
                continue
            fig, ax = plt.subplots(figsize=(7, 4.5))
            bottom = np.zeros(len(sizes))
            for c in stage_cols:
                ys = np.array(
                    [robust_mean([it.get(c, np.nan) for it in by_size[s]]) for s in sizes]
                )
                ys = np.nan_to_num(ys)
                ax.bar([str(s) for s in sizes], ys, bottom=bottom,
                       label=c.split("__", 1)[1])
                bottom += ys
            ax.set_xlabel("grid size")
            ax.set_ylabel("runtime (ms)")
            ax.set_title(f"{folder.name} {algo} stages")
            ax.legend(fontsize=7)
            fig.tight_layout()
            fig.savefig(out / f"{folder.name}_{algo}_bar.png", dpi=120)
            plt.close(fig)

    print(f"plots written to {out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
