#!/bin/bash
# Round-5 queue H (after queue G): widen the warmup-rescue sample with a
# third init. The rescue/no-cost claims each rest on init_seed∈{0,1};
# init_seed=2's no-warmup anchors exist (r32 0.941, r16 0.935 — both
# "good mode"), so the warmup cells here test the no-cost finding on a
# third init at BOTH budgets (prediction from the measured pattern:
# ~dense parity, >= the no-warmup runs).
# Copy to /tmp before running (never edit a script bash is executing).
set -u
cd /root/repo
QARGS="steps=2400 eval_every=300 contrast=80 n_train=8192"
run() {
  echo "=== QH cell $* $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 2700 python tools/tome_quality_ab.py "$@" \
    || echo "CELL $* FAILED rc=$?"
}
run r16_dec $QARGS tome_warmup=900 init_seed=2
run r32_dec $QARGS tome_warmup=900 init_seed=2
echo "=== QUEUE H DONE $(date -u +%H:%M:%S) ==="
