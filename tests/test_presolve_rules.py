"""Single-rule presolve state assertions — the counterpart of the
reference's per-rule/changes scenario suites
(general_form/presolve/test/per_rule.rs and changes.rs, its largest test
file): apply ONE rule to a minimal problem and assert the full engine state
(active masks, activity intervals, real vs speculative bounds, postsolve
records, counters, queues)."""

import math

import numpy as np
import pytest
import scipy.sparse as sp

import relp_tpu  # noqa: F401
from relp_tpu.model.elements import (
    ConstraintRelation,
    LinearProgramType,
    Objective,
    RangedConstraintRelation,
)
from relp_tpu.model.general_form import GeneralForm, Variable
from relp_tpu.presolve.engine import Presolver, SlackValue

INF = float("inf")


def rel(kind, width=None):
    if kind == "==":
        return RangedConstraintRelation.equal()
    if kind == "<=":
        return RangedConstraintRelation.less()
    if kind == ">=":
        return RangedConstraintRelation.greater()
    return RangedConstraintRelation.range(width)


def build(A, kinds, b, variables, objective=Objective.MINIMIZE, widths=None):
    widths = widths or {}
    return GeneralForm(
        objective=objective,
        A=sp.csc_matrix(np.asarray(A, dtype=float)),
        constraint_types=[rel(k, widths.get(i)) for i, k in enumerate(kinds)],
        b=np.asarray(b, dtype=float),
        variables=[Variable(**v) for v in variables],
    )


def V(name, cost=0.0, lower=0.0, upper=INF):
    return dict(name=name, cost=cost, lower=lower, upper=upper)


# ---- rule 1: fixed variable substitution ----------------------------------


def test_fixed_variable_substitution_state():
    # x0 fixed at 2; row0: x0 + x1 <= 10 → interval shifts to (-inf, 8]
    g = build([[1, 1]], ["<="], [10], [V("x0", cost=3.0, lower=2.0, upper=2.0), V("x1")])
    p = Presolver(g)
    p.rule_fixed_variable(0)
    assert not p.active_col[0] and p.active_col[1]
    assert p.U[0] == 8.0 and p.L[0] == -INF
    assert p.fixed_cost == 6.0
    assert g.removed_variables["x0"] == 2.0
    assert p.result.nr_variables_removed == 1
    # the row lost a nonzero → its counter decremented, re-queued for rules
    assert p.row_nnz[0] == 1
    assert p.q_rows and p.q_activity


def test_fixed_variable_updates_shift_magnitude():
    g = build([[4, 1]], ["=="], [9], [V("x0", lower=2.0, upper=2.0), V("x1")])
    p = Presolver(g)
    p.rule_fixed_variable(0)
    assert p.L[0] == p.U[0] == 1.0
    assert p.shift_mag[0] == 8.0  # |4·2| — scales later residue tolerance


# ---- rule 2: singleton / empty rows ---------------------------------------


def test_singleton_row_imposes_real_bound():
    # row0: 2·x0 <= 6 → REAL upper bound 3 (row removed ⇒ bound must land
    # even when the improvement is below the speculative-promotion gate)
    g = build([[2, 0], [1, 1]], ["<=", "=="], [6, 5], [V("x0"), V("x1")])
    p = Presolver(g)
    p.rule_row(0)
    assert not p.active_row[0] and p.active_row[1]
    assert p.ub[0] == 3.0 and p.act_ub[0] == 3.0
    assert p.result.nr_constraints_removed == 1
    assert p.result.nr_bounds_tightened == 1


def test_singleton_row_tiny_merge_still_lands():
    # existing ub 3.0000001; derived 3.0 — below MEANINGFUL, but the row is
    # gone, so the real bound must still merge (round-1 behavior lost this)
    g = build([[1, 0], [1, 1]], ["<=", "=="], [3, 5],
              [V("x0", upper=3.0000001), V("x1")])
    p = Presolver(g)
    p.rule_row(0)
    assert p.ub[0] == 3.0


def test_singleton_equality_row_fixes_variable():
    g = build([[5, 0], [1, 1]], ["==", "=="], [10, 5], [V("x0"), V("x1")])
    p = Presolver(g)
    p.rule_row(0)
    assert p.lb[0] == p.ub[0] == 2.0
    assert p.act_lb[0] == p.act_ub[0] == 2.0
    assert p.q_fixed  # queued for substitution


def test_singleton_equality_outside_bounds_infeasible():
    g = build([[5, 0], [1, 1]], ["==", "=="], [10, 5],
              [V("x0", upper=1.0), V("x1")])
    p = Presolver(g)
    p.rule_row(0)
    assert p.result.status is LinearProgramType.INFEASIBLE


def test_empty_row_feasible_and_infeasible():
    g = build([[0, 1]], ["<="], [4], [V("x0"), V("x1")])
    p = Presolver(g)
    # row isn't empty (x1) — emptiness comes from deactivating x1 first
    p.active_col[1] = False
    p.row_nnz[0] = 0
    p.rule_row(0)
    assert not p.active_row[0]  # 0 <= 4 holds

    g2 = build([[0, 1]], [">="], [4], [V("x0"), V("x1")])
    p2 = Presolver(g2)
    p2.active_col[1] = False
    p2.row_nnz[0] = 0
    p2.rule_row(0)
    assert p2.result.status is LinearProgramType.INFEASIBLE  # 0 >= 4 fails


# ---- rule 3: empty columns and implicit slacks ----------------------------


def test_empty_column_minimize_to_lower():
    g = build([[0, 1]], ["=="], [4], [V("x0", cost=2.0, lower=1.0, upper=9.0), V("x1")])
    p = Presolver(g)
    p.active_col[0] = True
    p.col_nnz[0] = 0
    p.rule_col(0)
    assert g.removed_variables["x0"] == 1.0
    assert p.fixed_cost == 2.0
    assert not p.active_col[0]


def test_empty_column_unbounded():
    g = build([[0, 1]], ["=="], [4], [V("x0", cost=-1.0), V("x1")])
    p = Presolver(g)
    p.col_nnz[0] = 0
    p.rule_col(0)
    assert p.result.status is LinearProgramType.UNBOUNDED


def test_slack_elimination_interval_fold():
    # row0: x1 + s ∈ [L,U]=(-inf, 10], s ∈ [0, 4] costless singleton
    # → fold: row interval becomes [-inf, 10] - [0,4] = (-inf, 10]
    #   ... with coef 1: [L - 4, U - 0] = (-inf, 10]; wait L=-inf stays
    g = build([[1, 1]], ["<="], [10], [V("s", upper=4.0), V("x1")])
    p = Presolver(g)
    p.rule_col(0)
    assert not p.active_col[0] and p.active_row[0]
    assert p.L[0] == -INF and p.U[0] == 10.0
    rec = g.removed_variables["s"]
    assert isinstance(rec, SlackValue)
    assert rec.coefficient == 1.0 and rec.lower == 0.0 and rec.upper == 4.0
    assert rec.terms == [("x1", 1.0)]


def test_slack_elimination_boxed_range():
    # equality row with boxed slack: x1 + 2s == 8, s ∈ [0,3] →
    # interval [8,8] - 2·[0,3] = [2, 8] (a range constraint now)
    g = build([[2, 1]], ["=="], [8], [V("s", upper=3.0), V("x1")])
    p = Presolver(g)
    p.rule_col(0)
    assert (p.L[0], p.U[0]) == (2.0, 8.0)


def test_slack_elimination_uses_activity_bounds():
    # s's activity bounds were tightened (speculatively) below its real
    # bounds — the fold must use the tighter implied interval
    g = build([[1, 1]], ["<="], [10], [V("s", upper=100.0), V("x1")])
    p = Presolver(g)
    p.act_ub[0] = 4.0  # as if propagation derived s <= 4 (unpromoted)
    p.rule_col(0)
    rec = g.removed_variables["s"]
    assert rec.upper == 4.0


def test_free_slack_removes_row():
    g = build([[1, 1]], ["<="], [10], [V("s", lower=-INF, upper=INF), V("x1")])
    p = Presolver(g)
    p.rule_col(0)
    assert not p.active_row[0] and not p.active_col[0]


# ---- rule 4: activity-based domain propagation ----------------------------


def test_redundant_row_removed():
    # x0,x1 ∈ [0,1]; x0 + x1 <= 5 is redundant (max activity 2)
    g = build([[1, 1]], ["<="], [5], [V("x0", upper=1.0), V("x1", upper=1.0)])
    p = Presolver(g)
    p.rule_activity(0)
    assert not p.active_row[0]
    assert p.result.nr_constraints_removed == 1


def test_forcing_row_fixes_all_variables():
    # x0 + x1 >= 2 with x ∈ [0,1]²: max activity == L ⇒ both forced to 1
    g = build([[1, 1]], [">="], [2], [V("x0", upper=1.0), V("x1", upper=1.0)])
    p = Presolver(g)
    p.rule_activity(0)
    assert not p.active_row[0]
    assert p.lb[0] == p.ub[0] == 1.0 and p.lb[1] == p.ub[1] == 1.0


def test_activity_infeasible():
    g = build([[1, 1]], [">="], [3], [V("x0", upper=1.0), V("x1", upper=1.0)])
    p = Presolver(g)
    p.rule_activity(0)
    assert p.result.status is LinearProgramType.INFEASIBLE


def test_residual_tightening_speculative_promotion():
    # x0 + x1 <= 10, x1 >= 0 ⇒ implied x0 <= 10: variable was free above
    # (no finite ub) → promoted to a REAL bound; a second, small
    # improvement stays speculative.
    g = build([[1, 1]], ["<="], [10], [V("x0"), V("x1")])
    p = Presolver(g)
    p.rule_activity(0)
    assert p.ub[0] == 10.0 and p.act_ub[0] == 10.0  # promoted (was +inf)
    # now derive a tiny improvement: act records it, real keeps 10
    p._tighten(0, upper=10.0 - 1e-8)
    assert p.act_ub[0] == pytest.approx(10.0 - 1e-8)
    assert p.ub[0] == 10.0


def test_one_missing_bound_derivation():
    # x0 free below, x1 ∈ [0,2]: x0 + x1 >= 1 gives x0 >= 1 - 2 = -1
    g = build([[1, 1]], [">="], [1], [V("x0", lower=-INF), V("x1", upper=2.0)])
    p = Presolver(g)
    p.rule_activity(0)
    assert p.lb[0] == -1.0  # promoted: side was infinite
    assert p.act_lb[0] == -1.0


def test_budget_exhaustion_is_signaled():
    g = build([[1, 1]], ["<="], [10], [V("x0", upper=1.0), V("x1", upper=1.0)])
    p = Presolver(g)
    res = p.run(max_ops=1)  # not enough to drain the queues
    assert res.budget_exhausted
    g2 = build([[1, 1]], ["<="], [10], [V("x0", upper=1.0), V("x1", upper=1.0)])
    res2 = Presolver(g2).run()
    assert not res2.budget_exhausted
