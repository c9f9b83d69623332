#!/bin/bash
# Round-5 on-chip queue, phase 2: SR trace under production defaults
# (defer+exp2+mxu_sum ON) to decompose the layout-bound conv fusion bucket.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/tmp/tpu_q5.log
date >> $L
echo "=== P2 SR profile (mxu_sum ON) ===" >> $L
rm -rf /tmp/sr_prof_r5
timeout 1800 python bench_sr.py --profile /tmp/sr_prof_r5 >> $L 2>&1
echo "=== P2 trace decomposition ===" >> $L
timeout 600 python bench_trace.py /tmp/sr_prof_r5 --top 80 --steps 3 >> $L 2>&1
echo "=== DONE phase2 ===" >> $L
date >> $L
