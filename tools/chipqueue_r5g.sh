#!/bin/bash
# Round-5 queue G (chained after queue F): dense-warmup follow-ups the
# rescue result (r32_dec init1: 0.821 -> 0.977 with tome_warmup=900)
# demands, most-valuable-first:
#   1) Rescue at the PRESET budget: r16_dec init_seed=1 flattened at
#      0.817 without warmup — does warmup=900 rescue r=16 too? This is
#      the cell that decides whether fast_finetune ships tome_warmup.
#   2) Warmup-size sensitivity: half the window (450) on the same
#      bad-mode r32 init — how sharp is the "through the takeoff
#      window" requirement? Informs the documented rule of thumb.
#   3) Depth interaction: at 24 layers DENSE is the mode that never
#      takes off (0.746) while merged escapes (r8_dec 0.930) — a dense
#      warmup there could HURT. One cell decides whether the warmup
#      guidance needs a depth caveat.
# Copy to /tmp before running (never edit a script bash is executing).
set -u
cd /root/repo
QARGS="steps=2400 eval_every=300 contrast=80 n_train=8192"
run() {
  echo "=== QG cell $* $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 2700 python tools/tome_quality_ab.py "$@" \
    || echo "CELL $* FAILED rc=$?"
}
run r16_dec $QARGS tome_warmup=900 init_seed=1
run r32_dec $QARGS tome_warmup=450 init_seed=1
run r8_dec steps=3600 eval_every=300 contrast=80 n_train=8192 layers=24 tome_warmup=900
echo "=== QUEUE G DONE $(date -u +%H:%M:%S) ==="
