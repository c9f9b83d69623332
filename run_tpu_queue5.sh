#!/bin/bash
# Round-5 on-chip measurement queue, phase 1: MXU row-sum A/B (VERDICT #1a, #7).
# Appends to /tmp/tpu_q5.log; safe to re-run (compile cache).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/tmp/tpu_q5.log
date >> $L

phase() { echo "=== $1 ===" >> $L; }

# A: SR model-step A/B of the ones-column MXU row sum (dark knob, in-tree)
phase "A1 SR baseline (defer+exp2 ON, mxu_sum OFF)"
timeout 1800 python bench_sr.py >> $L 2>&1
phase "A2 SR mxu_sum ON"
IVID_TPU_ATTN_MXU_SUM=1 timeout 1800 python bench_sr.py >> $L 2>&1

# B: flagship model-step A/B (seq-1024 attention ~4 ms/step; small but free to try)
phase "B1 flagship baseline"
timeout 1800 python bench_step.py >> $L 2>&1
phase "B2 flagship mxu_sum ON"
IVID_TPU_ATTN_MXU_SUM=1 timeout 1800 python bench_step.py >> $L 2>&1

phase "DONE phase1"
date >> $L
