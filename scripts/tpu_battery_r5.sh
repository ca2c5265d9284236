#!/bin/bash
# Round-5 hardware battery. Each numbered block is one python process
# (every process re-pays backend init; items group by failure domain —
# the 4096^3 and seg-backward items can RESOURCE_EXHAUST the chip, so
# they get their own processes, round-4 cascade lesson).
#
#   bash scripts/tpu_battery_r5.sh 2>&1 | tee /tmp/battery_r5.log
#
# 1. Smoke gate: every pallas kernel vs its oracle on hardware.
# 2. Standard battery matrix (headline @512, totals ladder to 2048,
#    JFA A/B, CSG) — one process, per-item isolation.
# 3. 4096^3 vox total: event pipeline + the banded slot pipeline
#    (round 5: first banded run above 2048; digest-verified).
# 4. Seg engine @1024^3 fwd+bwd (round-4c dtab layout fix: the padded
#    (B, tbl, 16) output cost 2 x 3.8 GB; never hardware-validated).
cd "$(dirname "$0")/.." || exit 1
set -x

timeout 2400 python scripts/tpu_smoke.py

timeout 5400 env BENCH_OP=battery python bench.py

timeout 5400 env BENCH_OP=voxtotal BENCH_N=4096 BENCH_ITERS=2 \
    python bench.py

timeout 4800 env PROBE_SEG=1 PROBE_N=1024 \
    python scripts/probe_soft.py
