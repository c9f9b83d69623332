#!/bin/bash
# Round-4 part-4: producer-side bf16 head stream A/B (exp2 now default ON).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
log=/tmp/tpu_queue4.log
: > $log
run() {
  echo "=== $1 ===" >> $log
  shift
  timeout 1500 "$@" >> $log 2>&1
  echo "rc=$?" >> $log
}
run "sr exp2-default (base re-check)"  python bench_sr.py --reps 3
run "sr head-bf16-v2"                  env IVID_TPU_HEAD_BF16=1 python bench_sr.py --reps 3
run "flagship exp2-default"            python bench_step.py --reps 3
run "flagship head-bf16-v2"            env IVID_TPU_HEAD_BF16=1 python bench_step.py --reps 3
echo "QUEUE4 DONE" >> $log
