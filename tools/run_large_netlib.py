"""Solve the large beyond-ceiling Netlib instances on the TPU, one by one."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import relp_tpu
from relp_tpu.api import solve
from relp_tpu.utils.config import SolverConfig

CASES = [
    ("BNL2", 1.8112365404e3),
    ("PILOT87", 3.0171034733e2),
    ("GREENBEA", -7.2555248129845987457557870574845e7),
    ("GREENBEB", -4.3022602612065867539213672544432e6),
    ("80BAU3B", 9.872241924e05),
    ("FIT2P", 6.8464293294e4),
]
for name, expected in CASES:
    t0 = time.perf_counter()
    try:
        res = solve(f"/root/reference/tests/netlib/problem_files/{name}.SIF",
                    SolverConfig())
        dt = time.perf_counter() - t0
        got = res.solution.objective_value if res.solution else None
        it = res.simplex.iterations if res.simplex else 0
        rel = abs(got - expected) / (1 + abs(expected)) if got is not None else None
        print(f"{name}: {res.kind.value} obj={got} (expected {expected}, "
              f"rel={rel}) iters={it} wall={dt:.1f}s",
              flush=True)
    except Exception as e:
        print(f"{name}: EXC {e}", flush=True)
