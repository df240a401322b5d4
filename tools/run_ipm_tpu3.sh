#!/bin/bash
set -x
cd /root/repo
export RELP_TPU_LOG=INFO
P=/root/reference/tests/netlib/problem_files
echo "=== PILOT87 ipm+crossover (chunked, cold incl compile) ==="
timeout 2400 python -m relp_tpu -q --algorithm ipm $P/PILOT87.SIF
echo "=== PILOT87 ipm+crossover (warm cache) ==="
timeout 1200 python -m relp_tpu -q --algorithm ipm $P/PILOT87.SIF
echo "=== DFL001 ipm no-crossover (chunked, cold) ==="
timeout 3600 python -m relp_tpu -q --algorithm ipm --no-crossover --max-iter 2000 $P/DFL001.SIF
echo "=== DFL001 ipm no-crossover (warm cache) ==="
timeout 1200 python -m relp_tpu -q --algorithm ipm --no-crossover --max-iter 2000 $P/DFL001.SIF
echo "=== done ==="
