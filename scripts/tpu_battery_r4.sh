#!/bin/bash
# Round-4 TPU measurement battery. PRIORITY-ORDERED: the items VERDICT
# r3 demands land first so a mid-run tunnel outage still leaves the
# round's headline numbers captured. Run in ONE session (warm compile
# cache); do NOT pipe through grep (block buffering — CLAUDE.md).
#
#   bash scripts/tpu_battery_r4.sh 2>&1 | tee /tmp/battery_r4.log
#
# Consolidation: every python process pays the tunnel's backend init +
# plan H2D again (80 s - 22 min variance), so the whole bench matrix
# runs as ONE process (BENCH_OP=battery, per-item isolation inside) and
# the soft probes as one more (PROBE_N comma list).
cd "$(dirname "$0")/.." || exit 1
set -x

# 1. Hardware smoke gate: bit-parity for every kernel incl. the
#    round-4 pipelined JFA (default + explicit pipe-vs-legacy A/B),
#    slot total, seg engine FD gradcheck.
timeout 2400 python scripts/tpu_smoke.py

# 2-4. The whole bench matrix in one process: headline vox total @512
#    (VERDICT r3 #1/#2), ladder totals incl. 4096^3 (#4), JFA
#    pipelined-vs-legacy A/B @256/512 + @1024 stepped (#5), CSG.
timeout 14400 env BENCH_OP=battery python bench.py

# 5. Segmented + fused soft engine hardware numbers (VERDICT r3 #3):
#    256/512 first (the round's claims), 1024 north-star last.
timeout 9000 env PROBE_SEG=1 PROBE_N=256,512,1024 PROBE_FACES=1348128 \
    python scripts/probe_soft.py

# 6. Stage attribution @512 (event pipeline stages vs slot path).
timeout 2400 env PROBE_N=512 PROBE_FACES=1348128 PROBE_ITERS=10 \
    python scripts/probe_stages.py || true

# 7. CSV matrix + plots refresh (VERDICT r3 #7/#9) — run last,
#    it is the longest and least outage-sensitive.
bash scripts/tpu_battery_matrix.sh || true
