#!/bin/bash
# Round-4 TPU measurement battery. PRIORITY-ORDERED: the items VERDICT
# r3 demands land first so a mid-run tunnel outage still leaves the
# round's headline numbers captured. Run in ONE session (warm compile
# cache); do NOT pipe through grep (block buffering — CLAUDE.md).
#
#   bash scripts/tpu_battery_r4.sh 2>&1 | tee /tmp/battery_r4.log
#
cd "$(dirname "$0")/.." || exit 1
set -x

# 1. Hardware smoke gate: bit-parity for every kernel incl. the
#    round-4 pipelined JFA (now default under jfa_pallas), slot total,
#    seg engine FD gradcheck.
timeout 2400 python scripts/tpu_smoke.py

# 2. THE round-4 number: default bench @512^3 — headline JSON is the
#    end-to-end vox total (slot vs event, xor-verified), kernel Gvox/s
#    secondary. (VERDICT r3 next #1/#2.)
timeout 2400 env BENCH_N=512 BENCH_ITERS=20 python bench.py

# 3. Totals across the ladder (VERDICT r3 next #4: the 4096 total).
timeout 2400 env BENCH_N=256 BENCH_ITERS=20 BENCH_OP=voxtotal python bench.py
timeout 3000 env BENCH_N=1024 BENCH_ITERS=10 BENCH_OP=voxtotal python bench.py
timeout 3600 env BENCH_N=2048 BENCH_ITERS=5 BENCH_OP=voxtotal python bench.py
timeout 3600 env BENCH_N=4096 BENCH_ITERS=2 BENCH_OP=voxtotal python bench.py

# 4. JFA pipelined-vs-legacy A/B (VERDICT r3 next #5: target <= 90 ms
#    @512; r3 numbers: 12.75 ms @256 / 121.4 ms @512 legacy).
timeout 2400 env BENCH_OP=jfa BENCH_N=256 JFA_PIPE=1 python bench.py
timeout 2400 env BENCH_OP=jfa BENCH_N=256 JFA_PIPE=0 python bench.py
timeout 2400 env BENCH_OP=jfa BENCH_N=512 JFA_PIPE=1 python bench.py
timeout 2400 env BENCH_OP=jfa BENCH_N=512 JFA_PIPE=0 python bench.py

# 5. Segmented soft engine first hardware numbers (VERDICT r3 next #3);
#    fused engine comparison rides in the same probe.
timeout 2400 env PROBE_SEG=1 PROBE_N=256 PROBE_FACES=1348128 \
    python scripts/probe_soft.py
timeout 3000 env PROBE_SEG=1 PROBE_N=512 PROBE_FACES=1348128 \
    python scripts/probe_soft.py

# 6. Stage attribution @512 (event pipeline stages vs slot path).
timeout 2400 env PROBE_N=512 PROBE_FACES=1348128 PROBE_ITERS=10 \
    python scripts/probe_stages.py

# 7. JFA @1024 stepped with the pipelined kernel (was 1.50 s r2).
timeout 3000 env BENCH_OP=jfa BENCH_N=1024 BENCH_ITERS=2 JFA_PIPE=1 \
    python bench.py || true

# 8. North-star: seg fwd+bwd @1024 (optional; failure must not block).
timeout 3600 env PROBE_SEG=1 PROBE_N=1024 PROBE_FACES=1348128 \
    python scripts/probe_soft.py || true

# 9. CSV matrix + plots refresh (VERDICT r3 next #7/#9) — run last,
#    it is the longest and least outage-sensitive.
bash scripts/tpu_battery_matrix.sh || true
