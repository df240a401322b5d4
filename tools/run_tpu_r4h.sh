#!/bin/bash
set -x
cd /root/repo
export RELP_TPU_LOG=INFO
P=/root/reference/tests/netlib/problem_files
echo "=== bench full verbose (headline + group breakdown) ==="
timeout 9000 python bench.py --suite full --verbose
echo "=== bench large with ipm ==="
timeout 9000 python bench.py --suite large --algorithm ipm --verbose
echo "=== STOCFOR3 pdlp + crossover + verify (primal-xl tier) ==="
timeout 5400 python -m relp_tpu -q --algorithm pdlp --verify $P/STOCFOR3.SIF
echo "=== done ==="
