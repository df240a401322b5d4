"""Benchmark: Netlib suite wall-clock + simplex iterations/s on device.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md: "no benches/
dir"), and cannot even solve the larger configs in exact arithmetic, so
``vs_baseline`` is anchored to the round-1 measurement of this framework
itself (value / BASELINE_ITERS_PER_S); the capability story vs the
reference is the suite composition: it includes instances the reference
tags "too computationally intensive".

Usage: python bench.py [--quick] [--suite small|full]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

SUITE_SMALL = [
    "AFIRO", "SC50A", "SC50B", "KB2", "SC105", "BLEND", "SHARE2B",
    "ADLITTLE", "SC205", "RECIPELP", "LOTFI", "STOCFOR1", "SCAGR7",
    "BOEING2", "SHARE1B", "VTP-BASE", "BORE3D",
]
# adds instances beyond the reference's exact-arithmetic ceiling.
# (BNL2/PILOT87/FIT2P-class instances solve too — see ROUND1.md — but are
# kept out of the aggregate so the iters/s metric stays comparable across
# rounds; their wall-clock would dominate the sum.)
SUITE_FULL = SUITE_SMALL + ["SCORPION", "25FV47"]

# round-1 calibration: the first working engine solved this same 19-instance
# suite (incl. 25FV47, which the reference cannot solve at all) in 27.165 s
# on a single TPU v5e chip; vs_baseline = speedup over that (higher is
# better).  Secondary fields report iterations/s for the record — note
# devex pricing deliberately trades iterations/s for wall clock.
BASELINE_WALL_S = {"small": 4.3, "full": 27.165}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["small", "full"], default="full")
    ap.add_argument("--quick", action="store_true", help="3 instances only")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument(
        "--batch",
        action="store_true",
        help="also time the small suite as one vmapped fleet solve",
    )
    args = ap.parse_args(argv)

    import relp_tpu  # noqa: F401
    from relp_tpu.api import solve
    from relp_tpu.model.elements import LinearProgramType
    from relp_tpu.utils.config import SolverConfig

    names = SUITE_FULL if args.suite == "full" else SUITE_SMALL
    if args.quick:
        names = names[:3]
    config = SolverConfig()
    base = "/root/reference/tests/netlib/problem_files"

    # warmup pass: populate the jit cache for every padded shape bucket
    for name in names:
        try:
            solve(f"{base}/{name}.SIF", config)
        except Exception as e:  # keep benching the rest
            print(f"# warmup {name}: {e}", file=sys.stderr)

    total_wall = 0.0
    total_iters = 0
    solved = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            res = solve(f"{base}/{name}.SIF", config)
        except Exception as e:
            print(f"# {name}: EXC {e}", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        ok = res.kind is LinearProgramType.FINITE_OPTIMUM
        iters = res.simplex.iterations if res.simplex else 0
        total_wall += dt
        total_iters += iters
        solved += int(ok)
        if args.verbose:
            print(
                f"# {name}: {res.kind.value} iters={iters} wall={dt:.3f}s",
                file=sys.stderr,
            )

    import jax

    iters_per_s = total_iters / max(total_wall, 1e-9)
    payload = {
        "metric": f"netlib_{args.suite}_wall_s",
        "value": round(total_wall, 3),
        "unit": "seconds (lower is better)",
        "vs_baseline": round(
            BASELINE_WALL_S[args.suite] / max(total_wall, 1e-9), 3
        ),
        "solved": f"{solved}/{len(names)}",
        "iters_per_s": round(iters_per_s, 2),
        "total_iters": total_iters,
        "hardware": f"{len(jax.devices())}x {jax.devices()[0].device_kind}",
    }

    if args.batch:
        from relp_tpu.io import import_lp
        from relp_tpu.simplex.driver import solve_general_forms_batched

        fleet_names = SUITE_SMALL
        generals = [import_lp(f"{base}/{n}.SIF") for n in fleet_names]
        solve_general_forms_batched(generals, config)  # warmup/compile
        generals = [import_lp(f"{base}/{n}.SIF") for n in fleet_names]
        t0 = time.perf_counter()
        results = solve_general_forms_batched(generals, config)
        dt = time.perf_counter() - t0
        ok = sum(
            1
            for r in results
            if r.kind is LinearProgramType.FINITE_OPTIMUM
        )
        payload["batch_small_wall_s"] = round(dt, 3)
        payload["batch_small_solved"] = f"{ok}/{len(fleet_names)}"

    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
