#!/bin/bash
# Round-4 queue C: tome_schedule=decreasing measurements (train + the
# deep-stack/long-seq serving configs where the constant schedule
# clamps), plus clean re-runs of 20-22 (their first runs shared the
# single host core with a CPU bench — BENCH_NOTES timing discipline).
# Same .done-marker resume discipline; run AFTER chipqueue_r4b.sh.
cd /root/repo
. tools/chipqueue_lib.sh

run 40_train_t32_dec   1800 python tools/train_accel_probe.py tome 36 32 sched=decreasing
run 41_train_t16_dec   1800 python tools/train_accel_probe.py tome 36 16 sched=decreasing
run 42_vitl_dec        1800 python tools/tome_probe.py real 32 16 32 model=vit_l16 sched=decreasing
run 43_b512_dec        1800 python tools/tome_probe.py real 32 32 img=512 sched=decreasing
run 44_train_t48_dec   1800 python tools/train_accel_probe.py tome 36 48 sched=decreasing
run 45_rerun_t32_norem 1800 python tools/train_accel_probe.py tome 36 32 remat=0
run 46_rerun_t32_b48   1800 python tools/train_accel_probe.py tome 48 32
run 47_rerun_t32_b64   1800 python tools/train_accel_probe.py tome 64 32
# single-pull serving forward (logits only; host sigmoid — saves one
# ~33 ms tunnel round-trip per micro-batch): re-measure the b8/b32
# accel e2e rows (items 27/31 ran the two-pull build)
run 48_e2e_b8_1pull    1800 python tools/serve_e2e_probe.py static 32 8 160 8 1
run 49_e2e_b32_1pull   2400 python tools/serve_e2e_probe.py static 32 16 320 32 1
run 50_e2e_bf16_1pull  1800 python tools/serve_e2e_probe.py none 0 8 160 8 1
echo "QUEUE-C COMPLETE $(date -u +%H:%M:%S)"
