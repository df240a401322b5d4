#!/bin/bash
set -x
cd /root/repo
export RELP_TPU_LOG=INFO
P=/root/reference/tests/netlib/problem_files
echo "=== bench full (merged small groups) ==="
timeout 9000 python bench.py --suite full --verbose
echo "=== bench xl (regression check vs XL_r03) ==="
timeout 7200 python bench.py --suite xl --verbose
echo "=== DFL001 ipm --verify (clean 1e-10-feasible point) ==="
timeout 7200 python -m relp_tpu -q --algorithm ipm --verify $P/DFL001.SIF
echo "=== STOCFOR3 rerun: pdlp + crossover + verify ==="
timeout 5400 python -m relp_tpu -q --algorithm pdlp --verify $P/STOCFOR3.SIF
echo "=== done ==="
