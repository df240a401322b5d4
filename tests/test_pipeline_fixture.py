"""Staged conversion-pipeline fixture.

Counterpart of the reference's ``src/tests/problem_1.rs::conversion_pipeline``
(the Wikipedia MPS example), asserting every intermediate representation:
MPS structure → GeneralForm → computational form arrays → device solve →
reconstructed solution.  Expected values are hand-derived from the file.
"""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
from relp_tpu.io.mps_convert import mps_to_general_form
from relp_tpu.io.mps_parse import parse_free
from relp_tpu.model.computational_form import build_computational_form
from relp_tpu.model.elements import ConstraintRelation, LinearProgramType, Objective
from relp_tpu.simplex.driver import solve_general_form
from relp_tpu.utils.config import SolverConfig

INF = float("inf")

# The classic Wikipedia MPS example (same source the reference's fixture
# cites: en.wikipedia.org MPS (format))
WIKI_MPS = """NAME          TESTPROB
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    X1        COST                 1   LIM1                 1
    X1        LIM2                 1
    X2        COST                 2   LIM1                 1
    X2        MYEQN               -1
    X3        COST                -1   LIM2                 1
    X3        MYEQN                1
RHS
    RHS1      LIM1                 4   LIM2                 1
    RHS1      MYEQN                7
BOUNDS
 UP BND1      X1                   4
 LO BND1      X2                  -1
ENDATA
"""


def test_conversion_pipeline():
    # --- stage 1: MPS structure ---
    mps = parse_free(WIKI_MPS)
    assert mps.name == "TESTPROB"
    assert mps.cost_values == [(0, 1.0), (1, 2.0), (2, -1.0)]
    assert [r.constraint_type for r in mps.rows] == [
        ConstraintRelation.LESS, ConstraintRelation.GREATER, ConstraintRelation.EQUAL,
    ]
    assert mps.columns[0].values == [(0, 1.0), (1, 1.0)]
    assert mps.columns[1].values == [(0, 1.0), (2, -1.0)]
    assert mps.columns[2].values == [(1, 1.0), (2, 1.0)]
    assert mps.rhss[0].values == [(0, 4.0), (1, 1.0), (2, 7.0)]

    # --- stage 2: GeneralForm ---
    gf = mps_to_general_form(mps)
    assert gf.objective is Objective.MINIMIZE
    x1, x2, x3 = gf.variables
    assert (x1.lower, x1.upper) == (0.0, 4.0)
    assert (x2.lower, x2.upper) == (-1.0, INF)
    assert (x3.lower, x3.upper) == (0.0, INF)  # default bounds
    assert list(gf.b) == [4.0, 1.0, 7.0]
    assert gf.A.toarray().tolist() == [
        [1.0, 1.0, 0.0],
        [1.0, 0.0, 1.0],
        [0.0, -1.0, 1.0],
    ]

    # --- stage 3: computational form (standard equality form) ---
    cf = build_computational_form(gf, scale=False)
    # slacks for LESS and GREATER rows only
    assert cf.n_structural == 3 and cf.n == 5
    assert cf.slack_rows.tolist() == [0, 1]
    assert cf.lb.tolist() == [0.0, -1.0, 0.0, 0.0, -INF]
    assert cf.ub.tolist() == [4.0, INF, INF, INF, 0.0]
    assert cf.A.toarray()[:, 3].tolist() == [1.0, 0.0, 0.0]
    assert cf.A.toarray()[:, 4].tolist() == [0.0, 1.0, 0.0]

    # --- stage 4: solve + reconstruct ---
    # optimum: x2 at its lower bound -1 forces x3 = 6 via the equality;
    # x1 minimizes to 0.  objective = 0 + 2(-1) - 6 = -8.
    res = solve_general_form(mps_to_general_form(parse_free(WIKI_MPS)), SolverConfig())
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    sol = res.solution
    assert sol.objective_value == pytest.approx(-8.0, abs=1e-9)
    assert sol.value_of("X1") == pytest.approx(0.0, abs=1e-9)
    assert sol.value_of("X2") == pytest.approx(-1.0, abs=1e-9)
    assert sol.value_of("X3") == pytest.approx(6.0, abs=1e-9)
