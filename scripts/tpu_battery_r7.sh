#!/bin/bash
# Round-5 final battery: y-blocked Pallas JFA at 1024^3 (committed code).
#
#   bash scripts/tpu_battery_r7.sh > /tmp/battery_r7.log 2>&1
#
# 1. Hardware bit-parity gates for the new kernel (small grids).
# 2. Equality + wall @1024 vs the stepped XLA flood (the 1898 ms
#    round-5 default this kernel replaces).
# 3. JFA_YBLOCK band sweep (one bench battery process).
cd "$(dirname "$0")/.." || exit 1
set -x

timeout 1800 env SMOKE_ONLY=jfa_yblocked,jfa_pallas python scripts/tpu_smoke.py

timeout 2400 env JFA_FENCE_DEPTH=1 python scripts/probe_jfa_yblock.py

timeout 5400 env BENCH_OP=battery BENCH_BATTERY_ITEMS='[
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_BACKEND": "pallas", "BENCH_ITERS": "2", "JFA_YBLOCK": "256"},
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_BACKEND": "pallas", "BENCH_ITERS": "2", "JFA_YBLOCK": "128"},
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_BACKEND": "pallas", "BENCH_ITERS": "2", "JFA_YBLOCK": "512"}
]' python bench.py
