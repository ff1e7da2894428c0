#!/bin/bash
# Round-4 chip measurement queue — drains every pending BENCH_NOTES row
# while the tunneled TPU is alive. Sequential (one chip); each job under
# a hard timeout; logs to .chiplog/NN_name.log. Safe to re-run: finished
# jobs are skipped via their .done marker.
cd /root/repo
. tools/chipqueue_lib.sh

# --- train-step levers (VERDICT r3 #2/#3) — the round-4 headline work
run 01_train_dense   1800 python tools/train_accel_probe.py dense 36
run 02_train_tome16  1800 python tools/train_accel_probe.py tome 36 16
run 03_train_tome32  1800 python tools/train_accel_probe.py tome 36 32
run 04_train_tome8   1800 python tools/train_accel_probe.py tome 36 8
run 05_train_int8    1800 python tools/train_accel_probe.py int8 36

# --- round-3 queued: post-ties-fix serving re-measures
run 06_tome_serve    1800 python tools/tome_probe.py real 64 8 16 24 32
run 07_quant_static  1200 python tools/quant_probe.py 64 static
run 08_quant_bf16    1200 python tools/quant_probe.py 64 bf16

# --- e2e serving at accelerated configs (VERDICT r3 #7)
run 09_e2e_accel     1800 python tools/serve_e2e_probe.py static 32 8 160 8 1
run 10_e2e_bf16      1800 python tools/serve_e2e_probe.py none 0 8 160 8 1

# --- extended sweep (VERDICT r3 #8)
run 11_tome_vitl     1800 python tools/tome_probe.py real 32 16 32 model=vit_l16
run 12_tome_512      2400 python tools/tome_probe.py real 32 16 32 img=512
run 13_tome_bf16     1800 python tools/tome_probe.py real 64 16 32 quant=none

# --- full-scale e2e trainer loop (round-3 queued)
run 14_fullscale     2400 python tools/fullscale_e2e.py 240 50
echo "QUEUE COMPLETE $(date -u +%H:%M:%S)"
