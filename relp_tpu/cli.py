"""Command-line interface:  python -m relp_tpu <problem_file>

Counterpart of the reference `relp` binary (src/bin/main.rs:24-64):
import → GeneralForm → (presolve may fully solve → print & exit) →
two-phase simplex on device → reconstruct → print solution.
"""

from __future__ import annotations

import argparse
import sys
import time

from relp_tpu.api import solve
from relp_tpu.io.errors import ImportError_
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.utils.config import SolverConfig


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="relp_tpu",
        description="TPU-native linear program solver (two-phase revised simplex)",
    )
    ap.add_argument("problem_file", help="path to a .mps (free) or .sif (fixed) file")
    ap.add_argument("--max-iter", type=int, default=0, help="iteration cap (0 = auto)")
    ap.add_argument("--no-scale", action="store_true", help="disable equilibration scaling")
    ap.add_argument("--pricing", choices=["dantzig", "bland"], default="dantzig")
    ap.add_argument("--refactor", type=int, default=64, help="refactorization period")
    ap.add_argument("-q", "--quiet", action="store_true", help="objective only")
    ap.add_argument(
        "--verify",
        action="store_true",
        help="certify the solution with the exact (rational) verifier",
    )
    args = ap.parse_args(argv)

    config = SolverConfig(
        max_iter=args.max_iter,
        scale=not args.no_scale,
        pricing=args.pricing,
        refactor_period=args.refactor,
    )

    t0 = time.perf_counter()
    try:
        res = solve(args.problem_file, config)
    except (OSError, ImportError_) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    dt = time.perf_counter() - t0

    if res.kind is LinearProgramType.FINITE_OPTIMUM:
        sol = res.solution
        print(f"objective {sol.objective_value:.12g}")
        if not args.quiet:
            for name, value in sol.solution_values:
                print(f"  {name} = {value:.12g}")
        if res.simplex is not None:
            print(
                f"iterations {res.simplex.iterations}  wall_s {dt:.3f}  "
                f"iters/s {res.simplex.iterations / max(dt, 1e-9):.1f}",
                file=sys.stderr,
            )
        if args.verify:
            from relp_tpu.numerics.exact import ExactVerifier

            check = ExactVerifier(args.problem_file).check(sol.as_dict())
            ok = check.ok(tol=1e-6)
            print(
                f"exact check: {'OK' if ok else 'VIOLATED'}  "
                f"obj {float(check.objective):.12g}  "
                f"row_viol {float(check.max_row_violation):.3g}  "
                f"bound_viol {float(check.max_bound_violation):.3g}",
                file=sys.stderr,
            )
            if not ok:
                return 3
        return 0
    print(f"result: {res.kind.value}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
