#!/bin/bash
# Round-4 part-3 A/B queue: exp2 softmax + bf16 head stream, model-step A/B
# (the only admissible evidence per BASELINE.md methodology).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
log=/tmp/tpu_queue3.log
: > $log
run() {
  echo "=== $1 ===" >> $log
  shift
  timeout 1200 "$@" >> $log 2>&1
  echo "rc=$?" >> $log
}
run "flagship exp2"            env IVID_TPU_ATTN_EXP2=1 python bench_step.py --reps 3
run "flagship head-bf16"       env IVID_TPU_HEAD_BF16=1 python bench_step.py --reps 3
run "flagship exp2+head-bf16"  env IVID_TPU_ATTN_EXP2=1 IVID_TPU_HEAD_BF16=1 python bench_step.py --reps 3
run "sr exp2"                  env IVID_TPU_ATTN_EXP2=1 python bench_sr.py --reps 3
run "sr head-bf16"             env IVID_TPU_HEAD_BF16=1 python bench_sr.py --reps 3
run "sr exp2+head-bf16"        env IVID_TPU_ATTN_EXP2=1 IVID_TPU_HEAD_BF16=1 python bench_sr.py --reps 3
echo "QUEUE3 DONE" >> $log
