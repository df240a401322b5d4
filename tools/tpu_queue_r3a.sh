#!/bin/bash
# Round-3 TPU job queue — strictly sequential (single axon tunnel).
cd /root/repo
B=/root/reference/tests/netlib/problem_files

echo "=== job 1: dense compile probe (verdict r2 item 6)"
timeout 900 python -m relp_tpu "$B/AFIRO.SIF" --matrix-format dense --json \
  > runs/probe_dense_r3.log 2>&1
echo "probe_dense rc=$?" | tee -a runs/probe_dense_r3.log

echo "=== job 2: fleet bench (verdict r2 item 2)"
timeout 3600 python bench.py --suite fleet --verbose \
  > runs/bench_fleet_tpu_r3.log 2>&1
echo "fleet rc=$?" | tee -a runs/bench_fleet_tpu_r3.log

echo "=== job 3: STOCFOR3 PDLP clean run (artifact entry)"
RELP_TPU_LOG=1 timeout 1800 python -m relp_tpu "$B/STOCFOR3.SIF" \
  --algorithm pdlp --no-crossover --json \
  > runs/STOCFOR3_pdlp_tpu_r3c.log 2>&1
echo "stocfor3 rc=$?" | tee -a runs/STOCFOR3_pdlp_tpu_r3c.log

echo "=== queue done"
