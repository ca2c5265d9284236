#!/bin/bash
# Round-5 follow-up: band-width sweep for the banded slot pipeline.
#
# Round 5 moved the narrow/wide fits test to the greedy layout's
# 32-aligned base, removing 96 columns of panel-alignment slack — so
# band can now shrink toward the mesh's real x extents. Fill, pack and
# operand-build cost all scale with band; at 2048 they were ~32 ms of
# the 61 ms total (BENCH_NOTES round-4 attribution), so band=160 is
# worth ~12 ms if the narrow set holds.
#
#   bash scripts/tpu_battery_r5b.sh 2>&1 | tee /tmp/battery_r5b.log
cd "$(dirname "$0")/.." || exit 1
set -x

timeout 7200 env PROBE_N=1024,2048 \
    PROBE_CFGS=160:4:4,192:4:4,256:4:4,160:4:2,192:4:2,256:4:2 \
    python scripts/probe_banded.py
