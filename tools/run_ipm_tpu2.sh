#!/bin/bash
set -x
cd /root/repo
export RELP_TPU_LOG=INFO
P=/root/reference/tests/netlib/problem_files
echo "=== PILOT87 no-crossover (ladder) ==="
timeout 1800 python -m relp_tpu -q --algorithm ipm --no-crossover $P/PILOT87.SIF
echo "=== DFL001 no-crossover (ladder) ==="
timeout 3600 python -m relp_tpu -q --algorithm ipm --no-crossover --max-iter 2000 $P/DFL001.SIF
echo "=== done ==="
