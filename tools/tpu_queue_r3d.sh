#!/bin/bash
# Round-3 TPU queue D: final fleet artifact + XL suite (sequential).
cd /root/repo

echo "=== job 1: fleet SCTAP3 N=256 (early handoff + arg-passing)"
RELP_TPU_LOG=1 timeout 3600 python bench.py --suite fleet \
  --fleet-base SCTAP3 --fleet-n 256 --verbose \
  > runs/bench_fleet_tpu_r3f.log 2>&1
echo "fleet rc=$?"

echo "=== job 2: XL suite on TPU (8 instances via PDLP)"
RELP_TPU_LOG=1 timeout 10000 python bench.py --suite xl --verbose \
  > runs/bench_xl_tpu_r3.log 2>&1
echo "xl rc=$?"

echo "=== queue D done"
