"""Dual simplex tests: re-solve after bound tightening from the old
(now primal-infeasible, still dual-feasible) optimal basis."""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
from relp_tpu.simplex import status as st
from relp_tpu.simplex.core import solve_core
from relp_tpu.simplex.dual import solve_core_dual
from relp_tpu.utils.config import SolverConfig

CFG = SolverConfig()


def problem(m=16, n=48, seed=11):
    rng = np.random.default_rng(seed)
    A = np.where(rng.random((m, n)) < 0.4, rng.standard_normal((m, n)), 0.0)
    A[np.arange(m), rng.integers(0, n, m)] = 1.0
    b = A @ rng.random(n)
    c = rng.standard_normal(n)
    return A, b, c, np.zeros(n), np.full(n, 10.0)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_dual_resolve_after_bound_tightening(seed):
    A, b, c, lb, ub = problem(seed=seed)
    n = A.shape[1]
    out = solve_core(A, b, c, lb, ub, cfg=CFG, max_iter=2000)
    assert int(out.status) == st.OPTIMAL
    x = np.asarray(out.x)

    # tighten the upper bound of the largest basic variable below its value
    basis = np.asarray(out.basis)
    structural_basic = basis[basis < n]
    j_star = structural_basic[np.argmax(x[structural_basic])]
    if x[j_star] < 0.5:
        pytest.skip("degenerate instance")
    ub2 = ub.copy()
    ub2[j_star] = x[j_star] * 0.6  # old basis now primal infeasible

    # fresh primal reference
    ref = solve_core(A, b, c, lb, ub2, cfg=CFG, max_iter=2000)
    assert int(ref.status) == st.OPTIMAL

    # dual re-solve from the old basis
    dual = solve_core_dual(
        A, b, c, lb, ub2,
        basis0=basis, vstat0=np.asarray(out.vstat)[:n],
        cfg=CFG, max_iter=2000,
    )
    assert int(dual.status) == st.OPTIMAL
    assert float(dual.obj) == pytest.approx(float(ref.obj), abs=1e-8)
    # warm dual re-solve should take far fewer iterations than from scratch
    assert int(dual.it) < int(ref.it)


def test_dual_detects_infeasible():
    A, b, c, lb, ub = problem(seed=14)
    n = A.shape[1]
    out = solve_core(A, b, c, lb, ub, cfg=CFG, max_iter=2000)
    assert int(out.status) == st.OPTIMAL
    # make the problem infeasible: clamp every variable near zero while
    # b stays far away
    ub2 = np.full(n, 1e-3)
    dual = solve_core_dual(
        A, b, c, lb, ub2,
        basis0=np.asarray(out.basis), vstat0=np.asarray(out.vstat)[:n],
        cfg=CFG, max_iter=2000,
    )
    assert int(dual.status) == st.INFEASIBLE


def test_reoptimize_api_fallbacks():
    from relp_tpu.simplex.reoptimize import reoptimize_with_bounds

    A, b, c, lb, ub = problem(seed=15)
    out = solve_core(A, b, c, lb, ub, cfg=CFG, max_iter=2000)
    assert int(out.status) == st.OPTIMAL
    # loosen + tighten a mix of bounds
    rng = np.random.default_rng(0)
    ub2 = ub * (0.5 + rng.random(len(ub)))
    out2 = reoptimize_with_bounds(A, b, c, lb, ub2, out, CFG)
    ref = solve_core(A, b, c, lb, ub2, cfg=CFG, max_iter=2000)
    assert int(out2.status) == int(ref.status)
    if int(ref.status) == st.OPTIMAL:
        assert float(out2.obj) == pytest.approx(float(ref.obj), abs=1e-8)
