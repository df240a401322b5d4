#!/bin/bash
set -x
cd /root/repo
export RELP_TPU_LOG=INFO
echo "=== fleet probe: SCTAP2 n=8 simplex-warm ==="
timeout 2400 python bench.py --suite fleet --fleet-base SCTAP2 --fleet-n 8 --fleet-engine simplex
echo "=== fleet: SCTAP3 n=128 simplex-warm ==="
timeout 3600 python bench.py --suite fleet --fleet-base SCTAP3 --fleet-n 128 --fleet-engine simplex
echo "=== fleet: 80BAU3B n=32 simplex-warm ==="
timeout 3600 python bench.py --suite fleet --fleet-base 80BAU3B --fleet-n 32 --fleet-engine simplex
echo "=== done ==="
