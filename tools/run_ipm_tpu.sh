#!/bin/bash
# Sequential TPU probe of the IPM engine (one TPU process at a time).
set -x
cd /root/repo
export RELP_TPU_LOG=INFO
P=/root/reference/tests/netlib/problem_files
echo "=== ADLITTLE (compile probe, small shape) ==="
timeout 900 python -m relp_tpu -q --algorithm ipm $P/ADLITTLE.SIF
echo "=== PILOT87 no-crossover ==="
timeout 1800 python -m relp_tpu -q --algorithm ipm --no-crossover $P/PILOT87.SIF
echo "=== PILOT87 with crossover ==="
timeout 1800 python -m relp_tpu -q --algorithm ipm $P/PILOT87.SIF
echo "=== DFL001 no-crossover ==="
timeout 3600 python -m relp_tpu -q --algorithm ipm --no-crossover $P/DFL001.SIF
echo "=== done ==="
