#!/bin/bash
# Round-5 on-chip queue, phase 6: head-barrier A/B (SR head conv streams at
# 314 GB/s with the [...,:4] slice fused into the conv — barrier keeps the
# 8-padded T(8,128) tile), then the FIXED host-warp overlap demo (exec_platform
# now honors the default_device scope so loader-worker synthesis runs the CPU
# raster path inside a TPU session).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/tmp/tpu_q6.log
date >> $L

phase() { echo "=== $1 ===" >> $L; }

phase "P6a SR head barrier (baseline 278.84)"
IVID_TPU_HEAD_BARRIER=1 timeout 1800 python bench_sr.py >> $L 2>&1
phase "P6b flagship head barrier (baseline 114.34)"
IVID_TPU_HEAD_BARRIER=1 timeout 1800 python bench_step.py >> $L 2>&1

phase "P6c host-warp overlap demo (exec_platform fixed)"
timeout 2400 python bench_warp_host.py --steps 30 --batches 2,8 >> $L 2>&1

phase "DONE phase6"
date >> $L
