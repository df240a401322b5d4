#!/bin/bash
# Round-3 TPU queue C: fleet bench + warm DFL001 rerun (sequential).
cd /root/repo

echo "=== job 1: fleet bench SCTAP3 N=256"
timeout 5400 python bench.py --suite fleet --fleet-base SCTAP3 --fleet-n 256 \
  --verbose > runs/bench_fleet_tpu_r3b.log 2>&1
echo "fleet rc=$?"

echo "=== job 2: DFL001 PDLP warm rerun"
RELP_TPU_LOG=1 timeout 1800 python -m relp_tpu \
  /root/reference/tests/netlib/problem_files/DFL001.SIF \
  --algorithm pdlp --no-crossover --json -q \
  > runs/DFL001_pdlp_tpu_r3e.log 2>&1
echo "dfl001 rc=$?"

echo "=== queue C done"
