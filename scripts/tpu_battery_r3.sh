#!/bin/bash
# Round-3 TPU measurement battery. Run in ONE session so the compile
# cache stays warm; do NOT pipe the output through grep/filters (block
# buffering hides everything until exit — CLAUDE.md gotcha). Typical:
#
#   bash scripts/tpu_battery_r3.sh 2>&1 | tee /tmp/battery_r3.log
#
cd "$(dirname "$0")/.." || exit 1
set -x

# 1. Hardware smoke gate (now incl. slot-total + seg-engine checks).
timeout 2400 python scripts/tpu_smoke.py

# 2. Vox total attribution @512^3: event pipeline stages vs slot path.
timeout 2400 env PROBE_N=512 PROBE_FACES=1348128 PROBE_ITERS=10 \
    python scripts/probe_stages.py

# 3. Headline bench (kernel Gvox/s + both totals) @512^3 and @1024^3,
#    then the totals alone @2048^3 (ref: 959.97 total / 43.45 compute)
#    and @4096^3 (event pipeline only — slot caps at 2048; ref:
#    7436.95 total / 241.15 compute; 8.6 GB packed output => iters=2).
timeout 2400 env BENCH_N=256 BENCH_ITERS=20 BENCH_OP=voxtotal python bench.py
timeout 2400 env BENCH_N=512 BENCH_ITERS=20 python bench.py
timeout 3000 env BENCH_N=1024 BENCH_ITERS=10 python bench.py
timeout 3600 env BENCH_N=2048 BENCH_ITERS=5 BENCH_OP=voxtotal python bench.py
timeout 3600 env BENCH_N=4096 BENCH_ITERS=2 BENCH_OP=voxtotal python bench.py

# 4. Segmented soft engine at reference scale (first hardware numbers).
timeout 2400 env PROBE_SEG=1 PROBE_N=256 PROBE_FACES=1348128 \
    python scripts/probe_soft.py
timeout 3000 env PROBE_SEG=1 PROBE_N=512 PROBE_FACES=1348128 \
    python scripts/probe_soft.py
# North-star scale (BASELINE.md): full differentiable fwd+bwd at 1024^3
# on the 1.35M-face bunny, one chip. Last (optional): a failure here
# must not block the rows above.
timeout 3600 env PROBE_SEG=1 PROBE_N=1024 PROBE_FACES=1348128 \
    python scripts/probe_soft.py || true
