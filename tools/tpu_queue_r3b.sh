#!/bin/bash
# Round-3 TPU queue B: XL PDLP reruns on the refinement path (sequential).
cd /root/repo
B=/root/reference/tests/netlib/problem_files

echo "=== job 1: DFL001 PDLP (refinement path)"
RELP_TPU_LOG=1 timeout 1800 python -m relp_tpu "$B/DFL001.SIF" \
  --algorithm pdlp --no-crossover --json \
  > runs/DFL001_pdlp_tpu_r3d.log 2>&1
echo "dfl001 rc=$?"

echo "=== job 2: STOCFOR3 PDLP rerun (warm compile cache)"
RELP_TPU_LOG=1 timeout 1800 python -m relp_tpu "$B/STOCFOR3.SIF" \
  --algorithm pdlp --no-crossover --json \
  > runs/STOCFOR3_pdlp_tpu_r3d.log 2>&1
echo "stocfor3 rc=$?"

echo "=== queue B done"
