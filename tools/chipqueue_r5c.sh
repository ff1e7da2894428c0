#!/bin/bash
# Round-5 queue C: DEPTH-scaling quality probe (VERDICT r4 weak #6: the
# ViT-L/H clamp-floor throughput rows had no quality evidence at ANY
# depth). Same hard synthetic task and width as queue A, but 24 layers —
# the ViT-L depth — so the r·L budget vs the 576-token supply spans the
# regimes the big-model rows live in:
#   r8_dec  : budget 192/576  (the "quality-plausible band" claim)
#   r16_dec : budget 384/576  (ViT-L's measured +123% train row)
#   r24_dec : budget 576/576  (clamp floor — the ceiling-demonstration
#             regime of ViT-H r=8 and ViT-L r=32)
# Copy to /tmp before running (never edit a script bash is executing).
set -u
cd /root/repo
QARGS="steps=3600 eval_every=300 contrast=80 n_train=8192 layers=24"
for cell in dense r8_dec r16_dec r24_dec; do
  echo "=== QAB-24L cell $cell $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 3600 python tools/tome_quality_ab.py "$cell" $QARGS \
    || echo "CELL $cell FAILED rc=$?"
done
echo "=== QUEUE C DONE $(date -u +%H:%M:%S) ==="
