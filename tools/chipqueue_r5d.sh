#!/bin/bash
# Round-5 queue D (chained after queue B): (1) init replicate of the
# SHIPPED recommendation r16_dec — the r32_dec replicate swung 13 pts
# with init, so the default's band needs its own replicate; (2) the
# 24-layer depth-quality cells from the staged queue C (VERDICT r4 weak
# #6), most-valuable-first so a flaky tunnel still lands the anchors:
# dense anchor -> r8_dec (quality-plausible band of the ViT-L/H rows)
# -> r16_dec -> r24_dec (clamp floor).
# Copy to /tmp before running (never edit a script bash is executing).
set -u
cd /root/repo
echo "=== QAB r16_dec init replicate $(date -u +%H:%M:%S) ==="
tools/chipgate.sh timeout 2700 python tools/tome_quality_ab.py \
  r16_dec steps=2400 init_seed=1 eval_every=300 contrast=80 n_train=8192 \
  || echo "CELL r16_dec init_seed=1 FAILED rc=$?"
QARGS="steps=3600 eval_every=300 contrast=80 n_train=8192 layers=24"
for cell in dense r8_dec r16_dec r24_dec; do
  echo "=== QAB-24L cell $cell $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 3600 python tools/tome_quality_ab.py "$cell" $QARGS \
    || echo "CELL $cell FAILED rc=$?"
done
echo "=== QUEUE D DONE $(date -u +%H:%M:%S) ==="
