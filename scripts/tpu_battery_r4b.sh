#!/bin/bash
# Round-4 follow-up battery: the items the main battery could not
# capture, each in the process shape it needs.
#
#   bash scripts/tpu_battery_r4b.sh 2>&1 | tee /tmp/battery_r4b.log
#
# 1. 4096^3 total ALONE (it needs nearly the whole chip's HBM — the
#    main battery ran it after the 2048^3 item and the chip was still
#    holding earlier buffers when the first execution allocated).
# 2. The 1024^3 stepped JFA + CSG items that died in the cascade.
# 3. The seg-engine 256^3 FD gradcheck (fixed probe tet: the old one
#    OOM'd the XLA oracle, not the seg engine).
# 4. JFA flood-step cost attribution (roll vs ALU vs hoisted variants).
cd "$(dirname "$0")/.." || exit 1
set -x

timeout 7200 env BENCH_OP=battery BENCH_BATTERY_ITEMS='[{"BENCH_OP": "voxtotal", "BENCH_N": "4096", "BENCH_ITERS": "2"}]' \
    python bench.py

timeout 3600 env BENCH_OP=battery BENCH_BATTERY_ITEMS='[{"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_ITERS": "2"}, {"BENCH_OP": "csg", "BENCH_N": "512"}]' \
    python bench.py

timeout 2400 env SMOKE_ONLY=seg python scripts/tpu_smoke.py

timeout 3600 env JFA_MICRO_N=512 JFA_MICRO_K=4,128 python scripts/probe_jfa_micro.py
