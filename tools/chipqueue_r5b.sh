#!/bin/bash
# Round-5 queue B: (1) extended-steps quality cells — every merged cell in
# queue A shows a DELAYED TAKEOFF (flat ~0.74 then a late break), so the
# 2400-step table measures convergence SPEED, not the plateau; extend the
# two headline recipes + a dense anchor to 4800 steps to bound the
# plateau gap. (2) an init replicate of r32_dec (queue A's r-ordering is
# non-monotone — bound the noise). (3) int8-STE keep/no-go re-probe at
# ViT-L/H (VERDICT r4 weak #2: decided only at ViT-B where fwd
# projections are ~1/3 of step FLOPs).
# Copy to /tmp before running (never edit a script bash is executing).
set -u
cd /root/repo
QARGS="eval_every=300 contrast=80 n_train=8192"
for spec in "r32_dec steps=4800" "r16_dec steps=4800" "dense steps=4800" \
            "r32_dec steps=2400 init_seed=1"; do
  echo "=== QAB-ext cell $spec $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 2700 python tools/tome_quality_ab.py $spec $QARGS \
    || echo "CELL $spec FAILED rc=$?"
done
echo "=== int8-STE re-probe ViT-L/H $(date -u +%H:%M:%S) ==="
for spec in "dense 24 model=vit_l16" "int8 24 model=vit_l16" \
            "dense 16 model=vit_h14 img=224" "int8 16 model=vit_h14 img=224"; do
  echo "=== probe $spec $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 1200 python tools/train_accel_probe.py $spec \
    || echo "PROBE $spec FAILED rc=$?"
done
echo "=== QUEUE B DONE $(date -u +%H:%M:%S) ==="
