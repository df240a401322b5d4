"""Branch-and-bound on INTEGER variables — consuming the reference's
FeasibilityLogic hook (matrix_provider/variable.rs:14-41); the reference
itself leaves B&B unchecked on its roadmap (README.md)."""

import numpy as np
import pytest
import scipy.sparse as sp

import relp_tpu  # noqa: F401
from relp_tpu.model.elements import (
    ConstraintRelation,
    LinearProgramType,
    Objective,
    RangedConstraintRelation,
    VariableType,
)
from relp_tpu.model.general_form import GeneralForm, Variable
from relp_tpu.models.branch_bound import solve_mip
from relp_tpu.providers.variable import FeasibilityLogic

INF = float("inf")


def mip(A, kinds, b, vars_, objective=Objective.MINIMIZE):
    mk = {
        "==": RangedConstraintRelation.equal,
        "<=": RangedConstraintRelation.less,
        ">=": RangedConstraintRelation.greater,
    }
    return GeneralForm(
        objective=objective,
        A=sp.csc_matrix(np.asarray(A, float)),
        constraint_types=[mk[k]() for k in kinds],
        b=np.asarray(b, float),
        variables=[Variable(**v) for v in vars_],
    )


def IV(name, cost, upper=1.0):
    return dict(
        name=name, cost=cost, lower=0.0, upper=upper,
        variable_type=VariableType.INTEGER,
    )


def test_feasibility_logic():
    fl = FeasibilityLogic(VariableType.INTEGER)
    assert fl.is_feasible(3.0) and fl.is_feasible(2.9999999)
    assert not fl.is_feasible(2.5)
    assert fl.closest_feasible(2.6) == 3.0
    cont = FeasibilityLogic(VariableType.CONTINUOUS)
    assert cont.is_feasible(2.5) and cont.closest_feasible(2.5) == 2.5


def test_knapsack():
    # max 8a+11b+6c+4d st 5a+7b+4c+3d <= 14, binary → 21 (b,c,d)
    g = mip(
        [[5, 7, 4, 3]], ["<="], [14],
        [IV("a", 8), IV("b", 11), IV("c", 6), IV("d", 4)],
        objective=Objective.MAXIMIZE,
    )
    res = solve_mip(g)
    assert res.is_optimal
    assert res.objective == pytest.approx(21.0, abs=1e-6)
    assert res.values == {"a": 0.0, "b": 1.0, "c": 1.0, "d": 1.0}
    assert res.nodes >= 1


def test_integer_rounding_matters():
    # min x+y st x+2y >= 5, 2x+y >= 5, integer → LP relax (5/3,5/3)=10/3;
    # integer optimum 4 (e.g. x=2,y=2 or x=1,y=3... x=1,y=2: 1+4=5 ok,
    # 2+2=4 <5 no; x=2,y=2: 2+4=6>=5, 4+2=6>=5 → obj 4)
    g = mip(
        [[1, 2], [2, 1]], [">=", ">="], [5, 5],
        [IV("x", 1, upper=10), IV("y", 1, upper=10)],
    )
    res = solve_mip(g)
    assert res.is_optimal
    assert res.objective == pytest.approx(4.0, abs=1e-6)
    assert res.best_bound <= res.objective + 1e-6


def test_mip_infeasible():
    g = mip(
        [[1, 1]], ["=="], [0.5],  # x+y == 0.5 has no integer solution
        [IV("x", 1), IV("y", 1)],
    )
    res = solve_mip(g)
    assert res.kind is LinearProgramType.INFEASIBLE


def test_mixed_integer_continuous():
    # min -x - 10y, x cont in [0, 3.7], y int in [0,2]; x + y <= 4
    #   y=2 (forced by cost), x = 2 → obj -22... x<=3.7 but x+y<=4 → x=2
    g = mip(
        [[1, 1]], ["<="], [4],
        [
            dict(name="x", cost=-1.0, lower=0.0, upper=3.7),
            IV("y", -10.0, upper=2.0),
        ],
    )
    res = solve_mip(g)
    assert res.is_optimal
    assert res.values["y"] == 2.0
    assert res.objective == pytest.approx(-22.0, abs=1e-6)


def test_pure_lp_delegates():
    g = mip(
        [[1, 1]], ["<="], [4],
        [
            dict(name="x", cost=-1.0, lower=0.0, upper=3.0),
            dict(name="y", cost=-2.0, lower=0.0, upper=3.0),
        ],
    )
    res = solve_mip(g)
    assert res.is_optimal and res.objective == pytest.approx(-7.0, abs=1e-7)


def test_gomory_cuts_close_root_gap():
    """max x+y st 2x+2y <= 3, x,y binary: the root LP relaxation is
    fractional (x+y = 1.5); one GMI round derives x+y <= 1 (up to
    scaling) and the cut-strengthened root solves integrally with NO
    branching (branch_bound._gomory_cuts)."""
    g = mip(
        [[2, 2]], ["<="], [3],
        [IV("x", 1), IV("y", 1)],
        objective=Objective.MAXIMIZE,
    )
    res = solve_mip(g, cut_rounds=4)
    assert res.is_optimal
    assert res.objective == pytest.approx(1.0)
    vals = sorted(res.values.values())
    assert vals == pytest.approx([0.0, 1.0])
    # the cut made the root integral: 1 root node, no tree
    assert res.nodes == 1

    # plain B&B still gets the optimum, but needs to branch
    res0 = solve_mip(g, cut_rounds=0)
    assert res0.is_optimal
    assert res0.objective == pytest.approx(1.0)
    assert res0.nodes > 1


def test_gomory_cuts_general_integer():
    """Non-binary integers with a fractional LP vertex: max 3x+4y st
    3x+5y <= 14, 4x+y <= 9, x,y in Z, 0<=x,y<=4 — LP vertex
    (31/17, 29/17) is fractional; integer optimum 11 at (1, 2).
    Cuts must not cut off the integer hull."""
    g = mip(
        [[3, 5], [4, 1]], ["<=", "<="], [14, 9],
        [IV("x", 3, upper=4.0), IV("y", 4, upper=4.0)],
        objective=Objective.MAXIMIZE,
    )
    for rounds in (0, 4):
        res = solve_mip(g, cut_rounds=rounds)
        assert res.is_optimal
        assert res.objective == pytest.approx(11.0)
        assert res.values["x"] == pytest.approx(1.0)
        assert res.values["y"] == pytest.approx(2.0)


def test_warm_restart_infeasible_child_detected():
    """Regression: a warm primal start whose basis is reduced-cost optimal
    but primal INFEASIBLE under tightened bounds must not report OPTIMAL
    (core.py xb_ok terminal gate).  Child x>=2, y>=2 of the LP below is
    infeasible (3*2+5*2 > 14); the pre-fix core returned the parent vertex
    as 'optimal' and the B&B looped to max_nodes."""
    import dataclasses as dc

    import scipy.sparse as sp2

    from relp_tpu.model.computational_form import build_computational_form
    from relp_tpu.simplex import status as st
    from relp_tpu.simplex.core import solve_core
    from relp_tpu.simplex.driver import _bucket
    from relp_tpu.simplex.reoptimize import reoptimize_with_bounds
    from relp_tpu.utils.config import DEFAULT_CONFIG

    g = mip(
        [[3, 5], [4, 1]], ["<=", "<="], [14, 9],
        [IV("x", 3, upper=4.0), IV("y", 4, upper=4.0)],
        objective=Objective.MAXIMIZE,
    )
    config = dc.replace(DEFAULT_CONFIG, scale=False, presolve=False)
    cf = build_computational_form(g, scale=False)
    m_pad = _bucket(cf.m, config.row_align * 8)
    n_pad = _bucket(cf.n, config.col_align * 2)
    A = np.zeros((m_pad, n_pad))
    A[: cf.m, : cf.n] = sp2.csc_matrix(cf.A).toarray()
    b = np.zeros(m_pad)
    b[: cf.m] = cf.b
    c = np.zeros(n_pad)
    c[: cf.n] = cf.c
    lb = np.zeros(n_pad)
    ub = np.zeros(n_pad)
    lb[: cf.n] = cf.lb
    ub[: cf.n] = cf.ub
    mi = config.resolve_max_iter(m_pad, n_pad)
    root = solve_core(A, b, c, lb, ub, cfg=config, max_iter=mi)
    assert int(root.status) == st.OPTIMAL
    lb2 = lb.copy()
    lb2[0], lb2[1] = 2.0, 2.0  # jointly infeasible tightening
    out = reoptimize_with_bounds(
        A, b, c, lb2, ub, root, config=config, max_iter=mi
    )
    assert int(out.status) == st.INFEASIBLE


def test_pseudo_cost_branching_matches_fractional():
    """config.mip_branch: the pseudo-cost product rule (learned per-
    variable bound degradations, VERDICT r2 weak #7) must find the same
    optimum as the most-fractional rule on a multi-level knapsack whose
    tree is deep enough for the pseudo-costs to engage."""
    from relp_tpu.utils.config import SolverConfig

    rng = np.random.default_rng(11)
    n = 12
    w = rng.integers(3, 17, n).astype(float)
    p = (w + rng.integers(1, 6, n)).astype(float)
    w2 = rng.integers(1, 9, n).astype(float)

    def g():
        return mip(
            [list(w), list(w2)],
            ["<=", "<="],
            [float(w.sum() * 0.4), 30.0],
            [IV(f"x{i}", float(p[i]), upper=3.0) for i in range(n)],
            objective=Objective.MAXIMIZE,
        )
    res_p = solve_mip(g(), SolverConfig(mip_branch="pseudo"))
    res_f = solve_mip(g(), SolverConfig(mip_branch="fractional"))
    assert res_p.is_optimal and res_f.is_optimal
    assert res_p.objective == pytest.approx(res_f.objective, abs=1e-6)
