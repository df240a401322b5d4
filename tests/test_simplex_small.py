"""Unit tests for the simplex core on tiny hand-worked LPs.

These play the role of the reference's in-module tableau/pivot tests
(tableau/mod.rs:357-519, phase_one.rs, phase_two.rs) but assert against
independently hand-computed optima with float tolerances.
"""

import numpy as np
import pytest

import relp_tpu  # noqa: F401  (enables x64)
from relp_tpu.model.computational_form import ComputationalForm
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.simplex.driver import solve_computational_form
from relp_tpu.utils.config import SolverConfig

INF = float("inf")
CFG = SolverConfig()


def make_cf(A, b, c, lb=None, ub=None, maximize=False):
    A = np.asarray(A, dtype=np.float64)
    m, n = A.shape
    lb = np.zeros(n) if lb is None else np.asarray(lb, dtype=np.float64)
    ub = np.full(n, INF) if ub is None else np.asarray(ub, dtype=np.float64)
    cf = ComputationalForm(
        A=A,
        b=np.asarray(b, dtype=np.float64),
        c=np.asarray(c, dtype=np.float64),
        lb=lb,
        ub=ub,
        n_structural=n,
        slack_rows=np.zeros(0, dtype=np.int64),
        col_names=[f"x{j}" for j in range(n)],
        maximize=maximize,
        fixed_cost=0.0,
        row_scale=np.ones(m),
        col_scale=np.ones(n),
    )
    cf._orig_cost = (-np.asarray(c, float) if maximize else np.asarray(c, float))
    return cf


def test_equality_2x2():
    # min x0 + x1  s.t.  x0 + x1 = 2, x0 - x1 = 0  =>  x = (1, 1), obj 2
    res = solve_computational_form(make_cf([[1, 1], [1, -1]], [2, 0], [1, 1]), CFG)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(2.0, abs=1e-9)
    assert res.x_structural == pytest.approx([1.0, 1.0], abs=1e-9)


def test_standard_lp():
    # min -2x0 - 3x1  s.t.  x0 + x1 + s0 = 4,  x0 + 3x1 + s1 = 6;  x,s >= 0
    # optimum at x = (3, 1): obj = -9
    A = [[1, 1, 1, 0], [1, 3, 0, 1]]
    res = solve_computational_form(make_cf(A, [4, 6], [-2, -3, 0, 0]), CFG)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(-9.0, abs=1e-9)
    assert res.x_structural[:2] == pytest.approx([3.0, 1.0], abs=1e-9)


def test_unbounded():
    # min -x0  s.t.  x0 - x1 = 0; x >= 0 — both can grow forever
    res = solve_computational_form(make_cf([[1, -1]], [0], [-1, 0]), CFG)
    assert res.kind is LinearProgramType.UNBOUNDED


def test_infeasible():
    # x0 = 1 and x0 = 2 simultaneously (single variable, two equality rows)
    res = solve_computational_form(make_cf([[1], [1]], [1, 2], [1]), CFG)
    assert res.kind is LinearProgramType.INFEASIBLE


def test_negative_rhs():
    # min x0  s.t.  -x0 = -3  =>  x0 = 3 (exercises artificial sign logic)
    res = solve_computational_form(make_cf([[-1]], [-3], [1]), CFG)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(3.0, abs=1e-9)


def test_upper_bounds_and_flip():
    # min -x0 - x1  s.t.  x0 + x1 <= 10 (as equality with slack), 0<=x<=3
    # optimum x0 = x1 = 3 (bound flips or pivots), obj -6
    A = [[1, 1, 1]]
    res = solve_computational_form(
        make_cf(A, [10], [-1, -1, 0], lb=[0, 0, 0], ub=[3, 3, INF]), CFG
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(-6.0, abs=1e-9)


def test_binding_upper_bound():
    # min -x0 - x1  s.t.  x0 + x1 + s = 4, x0 <= 3, x1 <= 3: obj -4
    A = [[1, 1, 1]]
    res = solve_computational_form(
        make_cf(A, [4], [-1, -1, 0], lb=[0, 0, 0], ub=[3, 3, INF]), CFG
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(-4.0, abs=1e-9)


def test_free_variable():
    # min x1  s.t.  x0_free + x1 = -5, x1 >= 0  =>  x1 = 0, x0 = -5
    res = solve_computational_form(
        make_cf([[1, 1]], [-5], [0, 1], lb=[-INF, 0], ub=[INF, INF]), CFG
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(0.0, abs=1e-9)
    assert res.x_structural[0] == pytest.approx(-5.0, abs=1e-9)


def test_negative_lower_bounds():
    # min x0 + x1  s.t.  x0 + x1 = -2, -3 <= x <= 3  =>  obj -2
    res = solve_computational_form(
        make_cf([[1, 1]], [-2], [1, 1], lb=[-3, -3], ub=[3, 3]), CFG
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(-2.0, abs=1e-9)


def test_degenerate():
    # degenerate vertex: multiple constraints meet at origin-ish point
    # min -x0  s.t.  x0 + s0 = 1; x0 + x1 + s1 = 1; x >= 0. obj = -1
    A = [[1, 0, 1, 0], [1, 1, 0, 1]]
    res = solve_computational_form(make_cf(A, [1, 1], [-1, 0, 0, 0]), CFG)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(-1.0, abs=1e-9)


def test_fixed_variables():
    # x0 fixed at 2: min x1 s.t. x0 + x1 = 5  =>  x1 = 3
    res = solve_computational_form(
        make_cf([[1, 1]], [5], [0, 1], lb=[2, 0], ub=[2, INF]), CFG
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(3.0, abs=1e-9)


def test_redundant_rows_rank_deficient():
    # duplicated constraint row: rank-deficient basis handled by the
    # artificial staying basic at level 0
    A = [[1, 1], [1, 1], [1, -1]]
    res = solve_computational_form(make_cf(A, [2, 2, 0], [1, 1]), CFG)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(2.0, abs=1e-9)


def test_maximize_reporting():
    # max 2x0 + 3x1  s.t.  x0 + x1 + s = 4 ; internally min -2x0-3x1
    cf = make_cf([[1, 1, 1]], [4], [-2, -3, 0], maximize=True)
    res = solve_computational_form(cf, CFG)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    # reported in the problem's own sense: max = 12 at x1 = 4
    assert res.objective == pytest.approx(12.0, abs=1e-9)


def test_chunked_device_execution_matches():
    # force many tiny device calls with exact warm-start continuation
    from relp_tpu.utils.config import SolverConfig

    A = [[1, 1, 1, 0], [1, 3, 0, 1]]
    small_chunks = SolverConfig(device_chunk_iters=2)
    res = solve_computational_form(make_cf(A, [4, 6], [-2, -3, 0, 0]), small_chunks)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.objective == pytest.approx(-9.0, abs=1e-9)
