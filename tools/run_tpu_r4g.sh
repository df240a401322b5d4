#!/bin/bash
set -x
cd /root/repo
export RELP_TPU_LOG=INFO
P=/root/reference/tests/netlib/problem_files
echo "=== fleet: DENSE-768x1536 n=256 ipm (TPU) ==="
timeout 5400 python bench.py --suite fleet --fleet-base DENSE-768x1536 --fleet-n 64 --fleet-engine ipm
echo "=== PILOT87 ipm + push crossover + verify (TPU) ==="
timeout 2400 python -m relp_tpu -q --algorithm ipm --verify $P/PILOT87.SIF
echo "=== DFL001 pdlp + push crossover + verify (TPU) ==="
timeout 5400 python -m relp_tpu -q --algorithm pdlp --verify $P/DFL001.SIF
echo "=== done ==="
