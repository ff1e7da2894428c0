#!/bin/bash
# Round-5 queue E (chained after queue D): (1) packed-train rows with the
# new within-segment token merging (tools/packed_probe.py; the 1152-token
# 2x576 packing has ZERO padding, so these rows measure the content-merge
# worst case, not the pad-compaction freebie); (2) the ViT-H r=2
# decreasing train row (VERDICT r4 weak #6: quote the quality-plausible
# band, r=8 was the clamp-floor ceiling demo).
# Copy to /tmp before running (never edit a script bash is executing).
set -u
cd /root/repo
for spec in "32 16 1 0" "32 16 1 16 decreasing" "32 16 1 32 decreasing"; do
  echo "=== packed probe $spec $(date -u +%H:%M:%S) ==="
  tools/chipgate.sh timeout 1200 python tools/packed_probe.py $spec \
    || echo "PACKED $spec FAILED rc=$?"
done
echo "=== ViT-H r=2 decreasing train row $(date -u +%H:%M:%S) ==="
tools/chipgate.sh timeout 1200 python tools/train_accel_probe.py \
  tome 16 2 model=vit_h14 img=224 sched=decreasing remat=1 \
  || echo "PROBE vith r2 FAILED rc=$?"
echo "=== QUEUE E DONE $(date -u +%H:%M:%S) ==="
