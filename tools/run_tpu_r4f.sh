#!/bin/bash
set -x
cd /root/repo
export RELP_TPU_LOG=INFO
echo "=== bench full (batched headline) ==="
timeout 9000 python bench.py --suite full --verbose
echo "=== fleet: 80BAU3B n=256 pdlp ==="
timeout 5400 python bench.py --suite fleet --fleet-base 80BAU3B --fleet-n 256
echo "=== done ==="
