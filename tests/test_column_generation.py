"""Lazy column generation tests.

Plays the role of the reference's ``examples/column_range.rs`` (warm-started
phase-2-only solves over a growing column set): a cutting-stock LP master
with a knapsack pricing generator, verified against a full enumeration of
all patterns solved directly.
"""

import itertools

import numpy as np
import pytest

import relp_tpu  # noqa: F401
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.providers.base import ColumnPool
from relp_tpu.providers.column_generation import solve_with_column_generation
from relp_tpu.simplex.driver import solve_computational_form
from relp_tpu.model.computational_form import ComputationalForm
from relp_tpu.utils.config import SolverConfig

INF = float("inf")

WIDTH = 10.0
SIZES = np.array([3.0, 4.0, 5.0])
DEMAND = np.array([30.0, 20.0, 40.0])


def make_pool(patterns: np.ndarray) -> ColumnPool:
    """Master LP:  min Σ x_p  s.t.  P x - s = d,  x >= 0, s >= 0."""
    m = len(DEMAND)
    k = patterns.shape[1]
    A = np.concatenate([patterns, -np.eye(m)], axis=1)
    return ColumnPool(
        A=A,
        b=DEMAND.copy(),
        c=np.concatenate([np.ones(k), np.zeros(m)]),
        lb=np.zeros(k + m),
        ub=np.full(k + m, INF),
        names=[f"p{j}" for j in range(k)] + [f"s{i}" for i in range(m)],
    )


def knapsack_pricing(pi, pool):
    """Best pattern by duals: max Σ pi_i a_i  s.t.  Σ size_i a_i <= WIDTH."""
    best_val, best = -1.0, None
    maxes = (WIDTH // SIZES).astype(int)
    for combo in itertools.product(*[range(mx + 1) for mx in maxes]):
        a = np.array(combo, dtype=float)
        if a @ SIZES <= WIDTH:
            val = float(pi @ a)
            if val > best_val + 1e-12:
                best_val, best = val, a
    # improving iff reduced cost 1 - pi@a < 0
    if best is None or best_val <= 1.0 + 1e-7:
        return None
    col = best.reshape(-1, 1)
    return col, [1.0], [0.0], [INF], [f"gen_{'_'.join(map(str, map(int, best)))}"]


def all_patterns() -> np.ndarray:
    cols = []
    maxes = (WIDTH // SIZES).astype(int)
    for combo in itertools.product(*[range(mx + 1) for mx in maxes]):
        a = np.array(combo, dtype=float)
        if 0 < a.sum() and a @ SIZES <= WIDTH:
            cols.append(a)
    return np.stack(cols, axis=1)


def solve_full_enumeration() -> float:
    pool = make_pool(all_patterns())
    m, n = pool.A.shape
    cf = ComputationalForm(
        A=pool.A, b=pool.b, c=pool.c, lb=pool.lb, ub=pool.ub,
        n_structural=n, slack_rows=np.zeros(0, dtype=np.int64),
        col_names=pool.names, maximize=False, fixed_cost=0.0,
        row_scale=np.ones(m), col_scale=np.ones(n),
    )
    cf._orig_cost = pool.c
    res = solve_computational_form(cf, SolverConfig(scale=False))
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    return res.objective


def test_column_generation_matches_full_enumeration():
    # start with single-size patterns only
    init = np.diag((WIDTH // SIZES).astype(float))
    result = solve_with_column_generation(
        make_pool(init), knapsack_pricing, SolverConfig(scale=False)
    )
    assert result.kind is LinearProgramType.FINITE_OPTIMUM
    full = solve_full_enumeration()
    assert result.objective == pytest.approx(full, abs=1e-7)
    assert result.rounds >= 2  # the generator actually added columns


def test_column_generation_priced_out_immediately():
    # starting from ALL patterns, the generator can't improve
    result = solve_with_column_generation(
        make_pool(all_patterns()), knapsack_pricing, SolverConfig(scale=False)
    )
    assert result.kind is LinearProgramType.FINITE_OPTIMUM
    assert result.rounds == 1
