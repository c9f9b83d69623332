#!/bin/bash
# Round-4 on-chip measurement queue — run when the relay is up.
# Each phase appends to /tmp/tpu_queue.log; safe to re-run (compile cache).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/tmp/tpu_queue.log
date >> $L

phase() { echo "=== $1 ===" >> $L; }

# A1: fused-agg A/B at bucket 1 (per-slot cost, fused vs baseline vs cols)
phase "A1 bucket1 baseline (cached)"
IVID_TPU_BENCH_AGG_MODES=0 IVID_TPU_BENCH_BUCKETS=1 timeout 1200 python bench_agg_batch.py >> $L 2>&1
phase "A1 bucket1 fused"
IVID_TPU_AGG_FUSED=1 IVID_TPU_BENCH_AGG_MODES=0 IVID_TPU_BENCH_BUCKETS=1 timeout 1200 python bench_agg_batch.py >> $L 2>&1
phase "A1 bucket1 cols-prep"
IVID_TPU_AGG_PREP=cols IVID_TPU_BENCH_AGG_MODES=0 IVID_TPU_BENCH_BUCKETS=1 timeout 1200 python bench_agg_batch.py >> $L 2>&1
phase "A1 bucket1 fused+flat-gather"
IVID_TPU_AGG_FUSED=1 IVID_TPU_TEX_GATHER=flat IVID_TPU_BENCH_AGG_MODES=0 IVID_TPU_BENCH_BUCKETS=1 timeout 1200 python bench_agg_batch.py >> $L 2>&1

# A2: bucket scaling baseline vs fused (production bucket sizes)
phase "A2 buckets baseline"
IVID_TPU_BENCH_AGG_MODES=0 IVID_TPU_BENCH_BUCKETS=4,8,16,24 timeout 2400 python bench_agg_batch.py >> $L 2>&1
phase "A2 buckets fused"
IVID_TPU_AGG_FUSED=1 IVID_TPU_BENCH_AGG_MODES=0 IVID_TPU_BENCH_BUCKETS=4,8,16,24 timeout 2400 python bench_agg_batch.py >> $L 2>&1

# B: train steps (uncond vs cond in-step warp vs prep alone)
phase "B bench_train"
timeout 3600 python bench_train.py >> $L 2>&1

date >> $L
echo DONE >> $L
