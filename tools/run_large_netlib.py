"""Solve the large beyond-ceiling Netlib instances on the TPU.

Each instance runs in its own subprocess so a device fault on one cannot
poison the rest (the axon backend caches init failures per process).
"""

import os
import subprocess
import sys

CASES = [
    ("BNL2", 1.8112365404e3),
    ("PILOT87", 3.0171034733e2),
    ("GREENBEA", -7.2555248129845987457557870574845e7),
    ("GREENBEB", -4.3022602612065867539213672544432e6),
    ("80BAU3B", 9.872241924e05),
    ("FIT2P", 6.8464293294e4),
]

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
import relp_tpu
from relp_tpu.api import solve
from relp_tpu.utils.config import SolverConfig
name, expected = sys.argv[1], float(sys.argv[2])
t0 = time.perf_counter()
res = solve(f"/root/reference/tests/netlib/problem_files/{{name}}.SIF", SolverConfig())
dt = time.perf_counter() - t0
got = res.solution.objective_value if res.solution else None
rel = abs(got - expected) / (1 + abs(expected)) if got is not None else None
it = res.simplex.iterations if res.simplex else 0
print(f"{{name}}: {{res.kind.value}} obj={{got}} rel={{rel}} iters={{it}} wall={{dt:.1f}}s", flush=True)
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = CHILD.format(repo=repo)
    for name, expected in CASES:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code, name, str(expected)],
                capture_output=True,
                text=True,
                timeout=3600,
            )
            out = [
                l for l in (proc.stdout + proc.stderr).splitlines()
                if l.startswith(f"{name}:")
            ]
            if out:
                print(out[-1], flush=True)
            else:
                tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
                print(f"{name}: FAILED rc={proc.returncode} | " + " | ".join(tail), flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
