#!/bin/bash
# Round-4 follow-up queue: tome-train batch/remat sweep (merging shrinks
# activation memory — the b36+remat sweet spot likely moved), cold-start
# e2e serving, and validation of bench.py's new tome16 fields.
# Run AFTER chipqueue_r4.sh. Same .done-marker resume discipline.
cd /root/repo
. tools/chipqueue_lib.sh

run 20_tome32_noremat  1800 python tools/train_accel_probe.py tome 36 32 remat=0
run 21_tome32_b48      1800 python tools/train_accel_probe.py tome 48 32
run 22_tome32_b64      1800 python tools/train_accel_probe.py tome 64 32
run 23_tome16_noremat  1800 python tools/train_accel_probe.py tome 36 16 remat=0
run 24_tome48_b36      1800 python tools/train_accel_probe.py tome 36 48
run 29_tome512_base    1800 python tools/tome_probe.py real 32 0 img=512
run 30_tome512_bf16    1800 python tools/tome_probe.py real 32 0 32 img=512 quant=none
run 25_e2e_cold        1800 python tools/serve_e2e_probe.py static 32 8 160 8 0
run 27_e2e_accel_b32   2400 python tools/serve_e2e_probe.py static 32 16 320 32 1
run 28_e2e_bf16_b32    2400 python tools/serve_e2e_probe.py none 0 16 320 32 1
# queue-A e2e rows (09/10, b8) ran with the PIL fallback — libcxrdecode.so
# wasn't built after the box reboot — and with the serialized batcher.
# Re-measure b8 with the native stage + the two-stage pipeline (new
# default), plus pipeline-OFF rows for a clean A/B (probe prints both).
run 31_e2e_accel_nat   1800 python tools/serve_e2e_probe.py static 32 8 160 8 1
run 32_e2e_bf16_nat    1800 python tools/serve_e2e_probe.py none 0 8 160 8 1
run 33_e2e_accel_nopl  1800 env CXR_SERVE_PIPELINE=0 python tools/serve_e2e_probe.py static 32 8 160 8 1
run 34_e2e_bf16_nopl   1800 env CXR_SERVE_PIPELINE=0 python tools/serve_e2e_probe.py none 0 8 160 8 1
run 26_bench_tome16    2700 python bench.py
echo "QUEUE-B COMPLETE $(date -u +%H:%M:%S)"
