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
