#!/bin/bash
# Round-5 small-N banded sweep: with per-candidate windows the banded
# fill (band=64) does ~4x less MXU + operand work per batch than the
# whole-axis fill even at 512 — candidate to beat the 4.89 ms @512
# headline and the 2.45 ms @256.
#
#   bash scripts/tpu_battery_r5d.sh 2>&1 | tee /tmp/battery_r5d.log
cd "$(dirname "$0")/.." || exit 1
set -x

timeout 5400 env PROBE_N=256,512 \
    PROBE_CFGS=64:4:4,64:4:8,96:4:4,128:4:4 \
    python scripts/probe_banded.py
