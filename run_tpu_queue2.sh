#!/bin/bash
# Round-4 on-chip queue, part 2 — run after run_tpu_queue.sh.
# Cond-train (incl. host-warp step), SR profile, flagship step, final bench.
# Each phase retries through relay flaps (probe: /tmp/tpu_probe.log).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/tmp/tpu_queue2.log
date >> $L

phase() { echo "=== $1 ===" >> $L; }

# run <timeout> <cmd...> — retry up to 3x with a 120 s pause on failure
# (the relay drops compiles and goes UNAVAILABLE for minutes; see CLAUDE.md).
run() {
  local T=$1; shift
  for i in 1 2 3; do
    timeout "$T" "$@" >> $L 2>&1 && return 0
    echo "--- attempt $i failed (rc=$?); sleeping 120 ---" >> $L
    sleep 120
  done
  echo "--- phase FAILED after 3 attempts: $* ---" >> $L
  return 1
}

phase "cond train steps (in-step vs host-warp)"
run 3600 python bench_train.py

phase "SR step + profile"
run 2400 python bench_sr.py --profile /tmp/srprof_r4

phase "SR trace roofline"
run 1200 python bench_trace.py /tmp/srprof_r4 --top 40

phase "flagship step"
run 2400 python bench_step.py

phase "final bench.py"
run 7200 python bench.py

date >> $L
echo DONE >> $L
