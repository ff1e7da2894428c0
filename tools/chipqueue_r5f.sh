#!/bin/bash
# Round-5 queue F (chained after queue E): follow-ups the quality A/B
# data demands, most-valuable-first so a flaky tunnel still lands the
# high-information cells.
#   1) Dense-warmup rescue test: tome_warmup=900 (dense through the
#      dense takeoff window, then merged) on the BAD-MODE init
#      (r32_dec init_seed=1 flattened at 0.821). If warmup rescues it,
#      init-sensitivity is an early-training artifact and the guidance
#      gets a fix, not just a warning.
#   2) Same warmup on the good init (does warmup cost the good mode?).
#   3) init_seed=2 replicates of the two headline budgets — activates
#      the n>=3 spread gate in tests/test_quality_band.py.
#   4) r8_dec init replicate (resolves the dec<const noise read).
#   5) 24-layer dense retry at lr=5e-4: the 24L dense anchor plateaued
#      AT the easy-class floor (0.7456) — test whether that is an
#      optimization artifact of lr=1e-3 at depth before reading the
#      24L merged cells against it.
# Copy to /tmp before running (never edit a script bash is executing).
set -u
cd /root/repo
QARGS="steps=2400 eval_every=300 contrast=80 n_train=8192"
run() {
  echo "=== QF cell $* $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 2700 python tools/tome_quality_ab.py "$@" \
    || echo "CELL $* FAILED rc=$?"
}
run r32_dec $QARGS tome_warmup=900 init_seed=1
run r32_dec $QARGS tome_warmup=900
run r32_dec $QARGS init_seed=2
run r16_dec $QARGS init_seed=2
run r8_dec  $QARGS init_seed=1
run dense steps=3600 eval_every=300 contrast=80 n_train=8192 layers=24 lr=5e-4
echo "=== QUEUE F DONE $(date -u +%H:%M:%S) ==="
