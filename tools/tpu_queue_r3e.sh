#!/bin/bash
# Round-3 TPU queue E: full + large suites (sequential).
cd /root/repo
echo "=== job 1: full suite"
timeout 4800 python bench.py --suite full --verbose > runs/bench_full_tpu_r3.log 2>&1
echo "full rc=$?"
echo "=== job 2: large suite"
timeout 7200 python bench.py --suite large --verbose > runs/bench_large_tpu_r3.log 2>&1
echo "large rc=$?"
echo "=== queue E done"
