#!/bin/bash
# Round-5b battery: JFA fence-depth A/B at 1024^3 (committed code).
#
#   bash scripts/tpu_battery_r6.sh > /tmp/battery_r6.log 2>&1
#
# The 2157.8 ms jfa@1024 wall includes ~11 serialized fence round
# trips over the tunnel; depth d overlaps d-1 of each with the next
# step's execution at the cost of d concurrent steps' ~4 GB temps.
# Depth 3 is the OOM-risk probe and runs LAST.
cd "$(dirname "$0")/.." || exit 1
set -x

timeout 5400 env BENCH_OP=battery BENCH_BATTERY_ITEMS='[
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_ITERS": "2", "JFA_FENCE_DEPTH": "1"},
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_ITERS": "2", "JFA_FENCE_DEPTH": "2"},
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_ITERS": "2", "JFA_FENCE_DEPTH": "3"}
]' python bench.py
