#!/bin/bash
# Round-5 queue A: token-merging convergence quality A/B (VERDICT r4 #1).
# Copy to /tmp before running (never edit a script bash is executing).
# Each cell is its own process; results append to BENCH_QUALITY_AB.jsonl.
set -u
cd /root/repo
ARGS="steps=2400 eval_every=300 contrast=80 n_train=8192"
for cell in dense r8_const r8_dec r16_const r16_dec r32_const r32_dec r48_dec; do
  echo "=== QAB cell $cell $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 1800 python tools/tome_quality_ab.py "$cell" $ARGS \
    || echo "CELL $cell FAILED rc=$?"
done
# dense re-run with a different init on the SAME data: the noise floor
echo "=== QAB cell dense-initB $(date -u +%H:%M:%S) ==="
tools/chipgate.sh timeout 1800 python tools/tome_quality_ab.py dense $ARGS init_seed=1 \
  || echo "CELL dense-initB FAILED rc=$?"
echo "=== QUEUE A DONE $(date -u +%H:%M:%S) ==="
