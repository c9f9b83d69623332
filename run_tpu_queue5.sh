#!/bin/bash
# Round-5 on-chip queue, phase 5: upsample-add A/B, host-warp overlap demo,
# full bench (measures the chained cond view for the 3x9 accounting).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/tmp/tpu_q5.log
date >> $L

phase() { echo "=== $1 ===" >> $L; }

phase "P5a SR up-add 4d (baseline 278.84)"
IVID_TPU_UP_ADD=4d timeout 1800 python bench_sr.py >> $L 2>&1
phase "P5b flagship up-add 4d (baseline 114.36)"
IVID_TPU_UP_ADD=4d timeout 1800 python bench_step.py >> $L 2>&1

phase "P5c host-warp overlap demo"
timeout 2400 python bench_warp_host.py --steps 30 --batches 2,8 >> $L 2>&1

phase "P5d full bench.py"
timeout 5400 python bench.py >> $L 2>&1

phase "DONE phase5"
date >> $L
