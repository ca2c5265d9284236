#!/bin/bash
# Round-4 closing battery: the items built after the main battery.
#
#   bash scripts/tpu_battery_r4c.sh 2>&1 | tee /tmp/battery_r4c.log
#
# 1. Banded slot pipeline with the slot-level greedy layout (re-measure
#    1024/2048 after the padding fix; xor-verified vs whole-axis).
# 2. Seg engine @1024^3 fwd+bwd (the backward OOM fix: g_t 64-block
#    indexing replaced five ~4.3 GB transposes).
# 3. Full smoke gate (now incl. vox_banded_total@64) — the commit gate
#    for every kernel touched this round.
cd "$(dirname "$0")/.." || exit 1
set -x

timeout 3000 env PROBE_N=1024,2048 PROBE_CFGS=256:4:4,256:4:2,256:4:8 \
    python scripts/probe_banded.py

timeout 3600 env PROBE_SEG=1 PROBE_N=1024 \
    python scripts/probe_soft.py

timeout 2400 python scripts/tpu_smoke.py
