#!/bin/bash
# Round-5 final verification battery (committed code only).
#
#   bash scripts/tpu_battery_r5e.sh 2>&1 | tee /tmp/battery_r5e.log
#
# 1. Headline @512 with the swept banded default (expect ~2.1 ms) +
#    @256 + jfa@1024 (packed donated steps — first single-chip number).
# 2. 4096^3 with band=192 (vs the measured 108.3 ms at band=256).
# 3. Seg @1024 fwd+bwd (optimization_barrier fix: the remat'd cotangent
#    producer was the last 4 GB pair of the 17.58G OOM).
cd "$(dirname "$0")/.." || exit 1
set -x

timeout 5400 env BENCH_OP=battery BENCH_BATTERY_ITEMS='[
  {"BENCH_OP": "vox", "BENCH_N": "512", "BENCH_ITERS": "20"},
  {"BENCH_OP": "voxtotal", "BENCH_N": "256", "BENCH_ITERS": "20"},
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_ITERS": "2"}
]' python bench.py

timeout 5400 env BENCH_OP=voxtotal BENCH_N=4096 BENCH_ITERS=2 \
    BENCH_BAND=192 BENCH_PACK=2 python bench.py

timeout 4800 env PROBE_SEG=1 PROBE_N=1024 \
    python scripts/probe_soft.py
