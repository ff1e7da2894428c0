#!/bin/bash
# Round-4 queue D: ViT-L TRAINING with token merging (first train rows
# beyond ViT-B — BASELINE configs[2]'s model at train time), the r=24
# decreasing band point, and a @512 tome train row. Same .done-marker
# resume discipline; run only when no CPU-heavy job shares the host
# (BENCH_NOTES timing discipline).
cd /root/repo
. tools/chipqueue_lib.sh

run 51_train_t24_dec   1800 python tools/train_accel_probe.py tome 36 24 sched=decreasing
run 52_vitl_dense      2400 python tools/train_accel_probe.py dense 24 model=vit_l16
run 53_vitl_t8_dec     2400 python tools/train_accel_probe.py tome 24 8 model=vit_l16 sched=decreasing
run 54_vitl_t16_dec    2400 python tools/train_accel_probe.py tome 24 16 model=vit_l16 sched=decreasing
run 55_vitl_t16_const  2400 python tools/train_accel_probe.py tome 24 16 model=vit_l16
run 56_b512_dense      2400 python tools/train_accel_probe.py dense 32 img=512
run 57_b512_t32_dec    2400 python tools/train_accel_probe.py tome 32 32 img=512 sched=decreasing
echo "QUEUE-D COMPLETE $(date -u +%H:%M:%S)"
