#!/bin/bash
# Round-5 rerun battery: the items the first battery lost to mid-edit
# imports (NameError) or to the bugs fixed at a0906e4. COMMITTED CODE
# ONLY — hardware processes import whatever is on disk at exec time.
#
#   bash scripts/tpu_battery_r5c.sh 2>&1 | tee /tmp/battery_r5c.log
#
# 1. Banded band sweep at 1024/2048 with per-candidate windows (the
#    optimum should move well below 256 now that window width is
#    O(err), not O(extent)).
# 2. 4096^3 vox total: event + banded (digest-verified; SMEM fix).
# 3. Seg engine @1024^3 fwd+bwd (NATTR-major tables cut 3.3 GB of
#    padding; expected peak ~14.3G < 15.75G).
# 4. voxtotal 1024/2048 + jfa@1024 (now the stepped-XLA path) +
#    the default @512 headline re-run, one battery process.
cd "$(dirname "$0")/.." || exit 1
set -x

timeout 7200 env PROBE_N=1024,2048 \
    PROBE_CFGS=64:4:4,64:4:2,96:4:4,128:4:4,256:4:4,256:4:2 \
    python scripts/probe_banded.py

timeout 5400 env BENCH_OP=voxtotal BENCH_N=4096 BENCH_ITERS=2 \
    python bench.py

timeout 4800 env PROBE_SEG=1 PROBE_N=1024 \
    python scripts/probe_soft.py

timeout 5400 env BENCH_OP=battery BENCH_BATTERY_ITEMS='[
  {"BENCH_OP": "voxtotal", "BENCH_N": "1024", "BENCH_ITERS": "10"},
  {"BENCH_OP": "voxtotal", "BENCH_N": "2048", "BENCH_ITERS": "5"},
  {"BENCH_OP": "jfa", "BENCH_N": "1024", "BENCH_ITERS": "2"},
  {"BENCH_OP": "vox", "BENCH_N": "512", "BENCH_ITERS": "20"}
]' python bench.py
