"""Exact-arithmetic verification of float solutions.

The reference solves entirely in rationals (``Rational64``/``RationalBig``);
here exactness is a *checking* capability: parse the MPS exactly
(``parse(..., exact=True)``, digits/10^k with no float round-trip —
reference io/mps/number/parse.rs:11-66), evaluate the float solution's
objective and row activities as ``fractions.Fraction``, and report exact
residuals.  Used by tests and the ``--verify`` CLI flag.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from pathlib import Path
from typing import Dict, List, Tuple

from relp_tpu.io.mps_parse import parse
from relp_tpu.model.elements import ConstraintRelation


@dataclass
class ExactCheck:
    objective: Fraction               # exact c@x + constant at the given x
    max_row_violation: Fraction       # worst constraint violation
    max_bound_violation: Fraction     # worst variable bound violation

    def ok(self, tol: float = 1e-6) -> bool:
        return (
            self.max_row_violation <= Fraction(tol).limit_denominator(10**12)
            and self.max_bound_violation <= Fraction(tol).limit_denominator(10**12)
        )


class ExactVerifier:
    """Exact model of one MPS problem, built once, queried per solution."""

    def __init__(self, path: str):
        p = Path(path)
        self.mps = parse(p.read_text(), fixed=p.suffix.lower() == ".sif", exact=True)

    def check(self, values: Dict[str, float]) -> ExactCheck:
        mps = self.mps
        x: List[Fraction] = []
        for col in mps.columns:
            v = values.get(col.name, 0.0)
            x.append(Fraction(v) if not isinstance(v, Fraction) else v)

        # objective (exact)
        obj = Fraction(mps.objective_constant)
        for j, c in mps.cost_values:
            obj += c * x[j]

        # row activities
        acts = [Fraction(0)] * len(mps.rows)
        for j, col in enumerate(mps.columns):
            for i, a in col.values:
                acts[i] += a * x[j]

        # rhs / ranges → intervals
        INF = None  # None = unbounded side
        lowers: List = [None] * len(mps.rows)
        uppers: List = [None] * len(mps.rows)
        # first-set-wins per row, matching the float converter's handling of
        # alternative-scenario RHS/RANGES sets (io/mps_convert.py)
        b: Dict[int, Fraction] = {}
        for rhs in mps.rhss:
            for i, v in rhs.values:
                b.setdefault(i, v)
        ranges: Dict[int, Fraction] = {}
        for rng in mps.ranges:
            for i, r in rng.values:
                ranges.setdefault(i, r)
        for i, row in enumerate(mps.rows):
            base = b.get(i, Fraction(0))
            kind = row.constraint_type
            if i in ranges:
                r = ranges[i]
                w = abs(r)
                if kind is ConstraintRelation.GREATER:
                    lowers[i], uppers[i] = base, base + w
                elif kind is ConstraintRelation.LESS:
                    lowers[i], uppers[i] = base - w, base
                else:
                    lowers[i], uppers[i] = (base, base + r) if r > 0 else (base + r, base)
            elif kind is ConstraintRelation.EQUAL:
                lowers[i] = uppers[i] = base
            elif kind is ConstraintRelation.LESS:
                uppers[i] = base
            else:
                lowers[i] = base

        max_row_violation = Fraction(0)
        for i in range(len(mps.rows)):
            if lowers[i] is not None and acts[i] < lowers[i]:
                max_row_violation = max(max_row_violation, lowers[i] - acts[i])
            if uppers[i] is not None and acts[i] > uppers[i]:
                max_row_violation = max(max_row_violation, acts[i] - uppers[i])

        # bounds via the same GLPK-default rules as the float converter
        # (io/mps_convert._compute_variables), redone in Fractions
        max_bound_violation = Fraction(0)
        lo, hi = self._exact_bounds()
        for j in range(len(mps.columns)):
            if lo[j] is not None and x[j] < lo[j]:
                max_bound_violation = max(max_bound_violation, lo[j] - x[j])
            if hi[j] is not None and x[j] > hi[j]:
                max_bound_violation = max(max_bound_violation, x[j] - hi[j])

        return ExactCheck(
            objective=obj,
            max_row_violation=max_row_violation,
            max_bound_violation=max_bound_violation,
        )

    def _exact_bounds(self) -> Tuple[List, List]:
        from relp_tpu.io.mps_model import BoundType

        n = len(self.mps.columns)
        lo: List = [None] * n
        hi: List = [None] * n
        needs_default_lower = [True] * n
        is_free = [False] * n

        def tl(j, v):
            lo[j] = v if lo[j] is None else max(lo[j], v)

        def th(j, v):
            hi[j] = v if hi[j] is None else min(hi[j], v)

        for bound in self.mps.bounds:
            for j, btype, value in bound.values:
                if btype is BoundType.LOWER_CONTINUOUS or btype is BoundType.LOWER_INTEGER:
                    tl(j, value)
                    needs_default_lower[j] = False
                elif btype is BoundType.UPPER_CONTINUOUS or btype is BoundType.UPPER_INTEGER:
                    th(j, value)
                elif btype is BoundType.FIXED:
                    tl(j, value)
                    th(j, value)
                    needs_default_lower[j] = False
                elif btype is BoundType.FREE:
                    is_free[j] = True
                    needs_default_lower[j] = False
                elif btype is BoundType.LOWER_MINUS_INFINITY:
                    needs_default_lower[j] = False
                elif btype is BoundType.UPPER_INFINITY:
                    tl(j, Fraction(0))
                    needs_default_lower[j] = False
                elif btype is BoundType.BINARY:
                    tl(j, Fraction(0))
                    th(j, Fraction(1))
                    needs_default_lower[j] = False
        for j in range(n):
            if needs_default_lower[j] and not is_free[j] and lo[j] is None:
                lo[j] = Fraction(0)
        return lo, hi


def verify_against_file(path: str, values: Dict[str, float]) -> ExactCheck:
    return ExactVerifier(path).check(values)
