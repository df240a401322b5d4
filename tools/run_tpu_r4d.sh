#!/bin/bash
set -x
cd /root/repo
export RELP_TPU_LOG=INFO
P=/root/reference/tests/netlib/problem_files
echo "=== pallas support probe ==="
timeout 1200 python tools/probe_pallas.py
echo "=== pallas vs xla bench: DFL001 STOCFOR3 ==="
timeout 2400 python tools/bench_pallas.py DFL001 STOCFOR3
echo "=== PILOT87 ipm + dual-informed crossover + exact verify ==="
timeout 2400 python -m relp_tpu -q --algorithm ipm --verify $P/PILOT87.SIF
echo "=== DFL001 pdlp + dual-informed crossover + exact verify ==="
timeout 3600 python -m relp_tpu -q --algorithm pdlp --verify $P/DFL001.SIF
echo "=== PILOT87 ipm in-process warm timing ==="
timeout 2400 python - <<'EOF'
import time
from relp_tpu.api import solve
from relp_tpu.utils.config import SolverConfig
P='/root/reference/tests/netlib/problem_files/PILOT87.SIF'
cfg = SolverConfig(algorithm='ipm', pdlp_crossover=False)
t0=time.time(); r1 = solve(P, cfg); t1=time.time()
t2=time.time(); r2 = solve(P, cfg); t3=time.time()
print(f"PILOT87 ipm cold={t1-t0:.1f}s warm={t3-t2:.1f}s obj={r2.solution.objective_value}", flush=True)
EOF
echo "=== done ==="
