#!/bin/bash
# Round-5 queue J: recovery re-run. A host reboot lost queue H's appended
# rows (the r16_dec init2 warmup=900 floor at ~0.745 was observed and is
# cited in the queue-I commit message, but never landed in
# BENCH_QUALITY_AB.jsonl) and queue I never started. Re-run all four
# cells so the warmup-miss story is committed data:
#   1) r16_dec init2 W=900  — the observed miss (re-measure to commit it)
#   2) r32_dec init2 W=900  — the other headline budget on the same init
#   3) dense   init2        — dense anchor: where is init 2's takeoff?
#   4) r16_dec init2 W=1500 — does covering the later takeoff restore
#      the rescue (dose-response rule applied)?
# Copy to /tmp before running (never edit a script bash is executing).
set -u
cd /root/repo
QARGS="steps=2400 eval_every=300 contrast=80 n_train=8192"
run() {
  echo "=== QJ cell $* $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 2700 python tools/tome_quality_ab.py "$@" \
    || echo "CELL $* FAILED rc=$?"
  sync
}
run r16_dec $QARGS tome_warmup=900 init_seed=2
run r32_dec $QARGS tome_warmup=900 init_seed=2
run dense $QARGS init_seed=2
run r16_dec $QARGS tome_warmup=1500 init_seed=2
echo "=== QUEUE J DONE $(date -u +%H:%M:%S) ==="
