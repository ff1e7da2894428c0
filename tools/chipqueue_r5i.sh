#!/bin/bash
# Round-5 queue I (chained after queue H): the r16_dec init2 warmup=900
# cell FLOORED (0.745) while no-warmup merged on the same init reached
# 0.935 — and its dense-phase evals (0.573/0.413/0.685 at 300/600/900,
# bit-identical to a dense run's first 900 steps) show init 2 is a SLOW
# DENSE STARTER: W=900 ends before this init's takeoff window. Two
# cells close the story:
#   1) dense init_seed=2 anchor — does dense take off later but
#      converge fine on this init (the 'dense spread' claim), and
#      WHERE is its takeoff?
#   2) r16_dec init2 warmup=1500 — does covering the later takeoff
#      window restore the rescue (the dose-response rule, applied)?
# Copy to /tmp before running (never edit a script bash is executing).
set -u
cd /root/repo
QARGS="steps=2400 eval_every=300 contrast=80 n_train=8192"
run() {
  echo "=== QI cell $* $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 2700 python tools/tome_quality_ab.py "$@" \
    || echo "CELL $* FAILED rc=$?"
}
run dense $QARGS init_seed=2
run r16_dec $QARGS tome_warmup=1500 init_seed=2
echo "=== QUEUE I DONE $(date -u +%H:%M:%S) ==="
