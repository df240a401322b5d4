"""Presolve rule tests (counterpart of the reference's
general_form/presolve/test/per_rule.rs and with_application.rs scenarios)."""

import numpy as np
import pytest
import scipy.sparse as sp

import relp_tpu  # noqa: F401
from relp_tpu.model.elements import (
    LinearProgramType,
    Objective,
    RangedConstraintRelation,
)
from relp_tpu.model.general_form import GeneralForm, Variable
from relp_tpu.presolve.engine import presolve
from relp_tpu.simplex.driver import solve_general_form
from relp_tpu.utils.config import SolverConfig

INF = float("inf")


def make_gf(A, types, b, variables, objective=Objective.MINIMIZE, fixed_cost=0.0):
    return GeneralForm(
        objective=objective,
        A=sp.csc_matrix(np.asarray(A, dtype=float)),
        constraint_types=types,
        b=np.asarray(b, dtype=float),
        variables=variables,
        fixed_cost=fixed_cost,
    )


def test_fixed_variable_substitution():
    # x fixed at 2; row x + y <= 10 becomes y <= 8
    gf = make_gf(
        [[1.0, 1.0]],
        [RangedConstraintRelation.less()],
        [10.0],
        [Variable("x", cost=3.0, lower=2, upper=2), Variable("y", cost=1.0, lower=0)],
    )
    res = presolve(gf)
    assert res.status is None
    assert gf.removed_variables["x"] == 2.0
    # presolve cascades: after substitution the row is a singleton (y <= 8),
    # then y sits only in the objective => fully solved at its lower bound
    sol = gf.compute_solution_where_possible()
    assert sol is not None
    assert sol.value_of("x") == 2.0
    assert sol.value_of("y") == 0.0
    assert sol.objective_value == pytest.approx(6.0)


def test_singleton_row_becomes_bound():
    # row 2x <= 6 => x <= 3; row removed
    gf = make_gf(
        [[2.0, 0.0], [1.0, 1.0]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.less()],
        [6.0, 10.0],
        [Variable("x", cost=-1.0, lower=0), Variable("y", cost=-1.0, lower=0, upper=4)],
    )
    res = presolve(gf)
    assert res.status is None
    # cascade solves it completely: x <= 3 (cost -1 => 3), y <= 4 => 4
    sol = gf.compute_solution_where_possible()
    assert sol is not None
    assert sol.value_of("x") == pytest.approx(3.0)
    assert sol.value_of("y") == pytest.approx(4.0)
    assert sol.objective_value == pytest.approx(-7.0)


def test_singleton_equality_fixes_variable():
    gf = make_gf(
        [[2.0, 0.0], [1.0, 1.0]],
        [RangedConstraintRelation.equal(), RangedConstraintRelation.less()],
        [6.0, 10.0],
        [Variable("x", cost=1.0, lower=0), Variable("y", cost=1.0, lower=0, upper=4)],
    )
    presolve(gf)
    assert gf.removed_variables["x"] == 3.0
    # remaining row became y <= 7, then y is an empty-ish singleton chain
    sol = gf.compute_full_solution({v.name: 0.0 for v in gf.variables})
    assert sol.value_of("x") == 3.0


def test_slack_column_folds_into_range():
    # x + s == 10 with 0 <= s <= 4, s costless => 6 <= x <= 10
    gf = make_gf(
        [[1.0, 1.0]],
        [RangedConstraintRelation.equal()],
        [10.0],
        [Variable("x", cost=1.0, lower=0), Variable("s", cost=0.0, lower=0, upper=4)],
    )
    presolve(gf)
    # row interval becomes [6, 10]; cascade then resolves x to its cheapest
    # feasible value 6, and the slack reconstructs to s = 10 - 6 = 4
    sol = gf.compute_solution_where_possible()
    assert sol is not None
    assert sol.value_of("x") == pytest.approx(6.0)
    assert sol.value_of("s") == pytest.approx(4.0)
    assert sol.objective_value == pytest.approx(6.0)


def test_infeasible_from_activity():
    # x + y >= 10 with x <= 2, y <= 3 impossible
    gf = make_gf(
        [[1.0, 1.0]],
        [RangedConstraintRelation.greater()],
        [10.0],
        [Variable("x", lower=0, upper=2), Variable("y", lower=0, upper=3)],
    )
    res = presolve(gf)
    assert res.status is LinearProgramType.INFEASIBLE


def test_forcing_constraint():
    # x + y >= 5 with x <= 2, y <= 3: activity max == 5 => both forced to ub
    gf = make_gf(
        [[1.0, 1.0]],
        [RangedConstraintRelation.greater()],
        [5.0],
        [Variable("x", cost=1.0, lower=0, upper=2), Variable("y", cost=1.0, lower=0, upper=3)],
    )
    res = presolve(gf)
    assert res.status is None
    assert gf.removed_variables["x"] == 2.0
    assert gf.removed_variables["y"] == 3.0
    assert gf.nr_constraints == 0 and gf.nr_variables == 0
    sol = gf.compute_solution_where_possible()
    assert sol.objective_value == pytest.approx(5.0)


def test_redundant_row_removed():
    gf = make_gf(
        [[1.0, 1.0]],
        [RangedConstraintRelation.less()],
        [100.0],
        [Variable("x", lower=0, upper=2), Variable("y", lower=0, upper=3)],
    )
    presolve(gf)
    assert gf.nr_constraints == 0


def test_empty_column_objective_only():
    # y has no constraints: cost 1 => at lower bound
    gf = make_gf(
        [[1.0, 0.0]],
        [RangedConstraintRelation.equal()],
        [4.0],
        [Variable("x", cost=0.0, lower=0), Variable("y", cost=1.0, lower=-5, upper=9)],
    )
    presolve(gf)
    assert gf.removed_variables["y"] == -5.0
    assert gf.removed_variables["x"] == 4.0


def test_unbounded_empty_column():
    gf = make_gf(
        [[1.0, 0.0]],
        [RangedConstraintRelation.equal()],
        [4.0],
        [Variable("x", cost=0.0, lower=0), Variable("y", cost=-1.0, lower=0, upper=INF)],
    )
    res = presolve(gf)
    assert res.status is LinearProgramType.UNBOUNDED


def test_presolve_preserves_netlib_objectives():
    from tests.conftest import reference_problem
    from relp_tpu.api import solve

    for name, expected, tol in [
        ("AFIRO", -464.75314, 1e-3),
        ("SC50B", -70.0, 1e-7),
        ("BLEND", -30.81215, 1e-3),
    ]:
        path = reference_problem("netlib", f"{name}.SIF")
        res = solve(path, SolverConfig(presolve=True))
        assert res.kind is LinearProgramType.FINITE_OPTIMUM
        assert res.solution.objective_value == pytest.approx(expected, abs=tol), name


def test_pilot87_not_falsely_infeasible():
    """Regression: activity-scaled tolerances once let the forcing rule
    fire on nearly-tight PILOT87 rows, cascading into a false INFEASIBLE
    (aggressive actions must use tight, row-bound-scaled tolerances)."""
    from tests.conftest import reference_problem
    from relp_tpu.io import import_lp

    gf = import_lp(reference_problem("netlib", "PILOT87.SIF"))
    res = presolve(gf)
    assert res.status is None
