#!/bin/bash
# Round-5 on-chip queue, phase 4: attribute the pair-kernel flagship loss
# (123.9 vs 114.4 ms) — profile pair-ON steps on both models and decompose.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/tmp/tpu_q5.log
date >> $L

phase() { echo "=== $1 ===" >> $L; }

phase "P4a flagship pair ON profiled"
rm -rf /tmp/flag_pair_prof
IVID_TPU_PAIR_SKIP=1 timeout 1800 python bench_step.py --profile /tmp/flag_pair_prof >> $L 2>&1
phase "P4a trace"
timeout 600 python bench_trace.py /tmp/flag_pair_prof --top 40 --steps 3 >> $L 2>&1

phase "P4b SR pair ON (VMEM-sized RB)"
rm -rf /tmp/sr_pair_prof
IVID_TPU_PAIR_SKIP=1 timeout 1800 python bench_sr.py --profile /tmp/sr_pair_prof >> $L 2>&1
phase "P4b trace"
timeout 600 python bench_trace.py /tmp/sr_pair_prof --top 40 --steps 3 >> $L 2>&1

phase "DONE phase4"
date >> $L
