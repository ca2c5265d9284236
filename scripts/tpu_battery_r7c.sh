#!/bin/bash
# Round-5 final battery, take 2 (committed code): y-blocked Pallas JFA
# at 1024^3 after the r7 OOM fixes (timer frees the previous dispatch's
# output before enqueuing the next; the non-donated pallas stepped path
# defaults to fence depth 1).
#
#   bash scripts/tpu_battery_r7c.sh > /tmp/battery_r7c.log 2>&1
#
# The smoke gate jfa_yblocked_vs_full_plane@32 already PASSED on this
# kernel (battery r7b) — not re-run. Depth-2 A/B runs LAST (OOM risk).
cd "$(dirname "$0")/.." || exit 1
set -x

timeout 2400 env JFA_FENCE_DEPTH=1 python scripts/probe_jfa_yblock.py

timeout 5400 env BENCH_OP=battery BENCH_BATTERY_ITEMS='[
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_BACKEND": "pallas", "BENCH_ITERS": "2", "JFA_YBLOCK": "256"},
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_BACKEND": "pallas", "BENCH_ITERS": "2", "JFA_YBLOCK": "128"},
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_BACKEND": "pallas", "BENCH_ITERS": "2", "JFA_YBLOCK": "512"},
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_BACKEND": "pallas", "BENCH_ITERS": "2", "JFA_YBLOCK": "256", "JFA_FENCE_DEPTH": "2"}
]' python bench.py
