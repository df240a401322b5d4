"""Round-2 regression tests: ADVICE findings + VERDICT correctness items.

Covers:
- MPS writer MI/UP roundtrip (ADVICE: bare MI relaxed (-inf,0] to (-inf,inf))
- MPS writer emits empty columns (ADVICE: BOUNDS referenced unknown column)
- batched solve duals in original row units (ADVICE: missing unscale/sign)
- n==0 maximize trivial objective sign (ADVICE: fixed_cost sign flip)
- per-variable fuzzy Solution comparison (reference solution.rs:47-78)
- dual simplex carries artificial signs (VERDICT weak #3: redundant-row
  bases with sign-(-1) artificials were refactorized with the wrong B)
- partial solution reconstruction (reference general_form/mod.rs:728-771)
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.sparse as sp

from relp_tpu.io.mps_parse import parse_free
from relp_tpu.io.mps_convert import mps_to_general_form
from relp_tpu.io.mps_write import write_mps
from relp_tpu.model.elements import (
    Objective,
    RangedConstraintRelation,
    ConstraintRelation,
)
from relp_tpu.model.general_form import GeneralForm, LinearCombination, Variable
from relp_tpu.model.solution import Solution

INF = float("inf")


def _gf(objective, A, rels, b, variables, **kw):
    return GeneralForm(
        objective, sp.csc_matrix(np.asarray(A, dtype=float)), rels,
        np.asarray(b, dtype=float), variables, **kw
    )


def _roundtrip(general: GeneralForm) -> GeneralForm:
    text = write_mps(general)
    return mps_to_general_form(parse_free(text))


class TestWriterFixes:
    def test_mi_with_zero_upper_roundtrips(self):
        # bounds (-inf, 0]: the writer must emit UP 0 explicitly because the
        # reader keeps the upper at +inf for bare MI
        g = _gf(
            Objective.MINIMIZE,
            [[1.0]],
            [RangedConstraintRelation(ConstraintRelation.GREATER)],
            [-5.0],
            [Variable("X", cost=1.0, lower=-INF, upper=0.0)],
        )
        g2 = _roundtrip(g)
        v = g2.variables[0]
        assert v.lower == -INF
        assert v.upper == 0.0

    def test_mi_with_negative_upper_roundtrips(self):
        g = _gf(
            Objective.MINIMIZE,
            [[1.0]],
            [RangedConstraintRelation(ConstraintRelation.GREATER)],
            [-5.0],
            [Variable("X", cost=1.0, lower=-INF, upper=-2.0)],
        )
        v = _roundtrip(g).variables[0]
        assert v.lower == -INF
        assert v.upper == -2.0

    def test_empty_column_with_bounds_reparses(self):
        # Y has zero cost and no matrix entries, but carries bounds: it must
        # appear in COLUMNS or the BOUNDS line fails with "Column not known"
        g = _gf(
            Objective.MINIMIZE,
            [[1.0, 0.0]],
            [RangedConstraintRelation(ConstraintRelation.GREATER)],
            [1.0],
            [
                Variable("X", cost=1.0, lower=0.0),
                Variable("Y", cost=0.0, lower=1.0, upper=3.0),
            ],
        )
        g2 = _roundtrip(g)
        names = [v.name for v in g2.variables]
        assert "Y" in names
        y = g2.variables[names.index("Y")]
        assert (y.lower, y.upper) == (1.0, 3.0)


def test_trivial_n0_maximize_objective_sign():
    from relp_tpu.simplex.driver import solve_general_form
    from relp_tpu.utils.config import SolverConfig

    # presolve fixes both variables; the full solution must report the
    # objective in the ORIGINAL (maximize) sense: 2*1 + 3*1 = 5
    g = _gf(
        Objective.MAXIMIZE,
        [[1.0, 0.0], [0.0, 1.0]],
        [
            RangedConstraintRelation(ConstraintRelation.EQUAL),
            RangedConstraintRelation(ConstraintRelation.EQUAL),
        ],
        [1.0, 1.0],
        [Variable("X", cost=2.0, lower=0.0), Variable("Y", cost=3.0, lower=0.0)],
    )
    res = solve_general_form(g, SolverConfig())
    assert res.solution is not None
    assert res.solution.objective_value == pytest.approx(5.0)


def test_batched_duals_in_original_units():
    from relp_tpu.io import import_lp
    from relp_tpu.simplex.driver import (
        solve_general_form,
        solve_general_forms_batched,
    )
    from relp_tpu.utils.config import SolverConfig

    base = "/root/reference/tests/netlib/problem_files"
    cfg = SolverConfig()
    single = solve_general_form(import_lp(f"{base}/AFIRO.SIF"), cfg)
    batched = solve_general_forms_batched([import_lp(f"{base}/AFIRO.SIF")], cfg)[0]
    assert batched.simplex is not None and single.simplex is not None
    d_single = np.sort(single.simplex.duals)
    d_batch = np.sort(batched.simplex.duals)
    # same problem, same optimal objective: dual values must agree in
    # ORIGINAL row units (degenerate duals may permute, hence the sort)
    assert batched.solution.objective_value == pytest.approx(
        single.solution.objective_value, rel=1e-8
    )
    np.testing.assert_allclose(d_batch, d_single, rtol=1e-6, atol=1e-6)


class TestSolutionComparison:
    def test_small_problems_compare_objective_only(self):
        a = Solution(1.0, [("x", 0.0), ("y", 1.0)])
        b = Solution(1.0, [("x", 5.0), ("y", -4.0)])
        assert a.is_probably_equal_to(b)

    def test_name_sets_must_match(self):
        a = Solution(1.0, [("x", 0.0)])
        b = Solution(1.0, [("z", 0.0)])
        assert not a.is_probably_equal_to(b)

    def test_large_problems_compare_values(self):
        names = [f"v{i}" for i in range(12)]
        a = Solution(1.0, [(n, float(i)) for i, n in enumerate(names)])
        same = Solution(1.0, [(n, float(i)) for i, n in enumerate(names)])
        assert a.is_probably_equal_to(same)
        # all values different -> not probably equal despite equal objective
        diff = Solution(1.0, [(n, float(i) + 7.5) for i, n in enumerate(names)])
        assert not a.is_probably_equal_to(diff)
        # half the values equal: at the default min_equal=0.5 boundary (>)
        half = Solution(
            1.0,
            [(n, float(i) if i < 7 else float(i) + 9.0) for i, n in enumerate(names)],
        )
        assert a.is_probably_equal_to(half)


def test_dual_simplex_carries_artificial_signs():
    """Reoptimize from a primal basis containing a sign-(-1) artificial.

    Rows: x1 + x2 == 1 and -x1 - x2 == -1 (redundant).  The cold start
    residual of row 2 is negative, so its artificial column is -e_2; the
    rank-deficient optimal basis keeps that artificial basic at level 0.
    A dual re-solve that rebuilds B with +e_2 on that slot computes a wrong
    basic solution."""
    from relp_tpu.simplex import status as st
    from relp_tpu.simplex.core import solve_core
    from relp_tpu.simplex.reoptimize import reoptimize_with_bounds
    from relp_tpu.utils.config import SolverConfig

    cfg = SolverConfig(mixed_pricing=False)
    A = np.array([[1.0, 1.0], [-1.0, -1.0]])
    b = np.array([1.0, -1.0])
    c = np.array([1.0, 2.0])
    lb = np.zeros(2)
    ub = np.full(2, 10.0)

    prior = solve_core(A, b, c, lb, ub, cfg=cfg, max_iter=100)
    assert int(prior.status) == st.OPTIMAL
    assert float(prior.obj) == pytest.approx(1.0)
    basis = np.asarray(prior.basis)
    art_sign = np.asarray(prior.art_sign)
    # the scenario requires an artificial in the basis with sign -1
    art_slots = basis >= 2
    assert art_slots.any()
    assert (art_sign[basis[art_slots] - 2] == -1.0).any()

    # tighten x2's lower bound: prior basis stays dual feasible
    new_lb = np.array([0.0, 0.25])
    out = reoptimize_with_bounds(A, b, c, new_lb, ub, prior, config=cfg)
    assert int(out.status) == st.OPTIMAL
    assert float(out.obj) == pytest.approx(0.75 + 0.5, rel=1e-9)
    x = np.asarray(out.x)
    np.testing.assert_allclose(x, [0.75, 0.25], atol=1e-9)
    # the artificial signs must round-trip through the re-solve so a further
    # chunked continuation refactorizes the true B (not +e_i on row 2)
    np.testing.assert_array_equal(np.asarray(out.art_sign), art_sign)


class TestPartialReconstruction:
    def test_resolves_chains_mid_presolve(self):
        # active variable z remains; removed u depends only on removed w,
        # which is solved -> both resolve to constants; removed t depends on
        # the active z -> stays symbolic
        g = _gf(
            Objective.MINIMIZE,
            [[1.0]],
            [RangedConstraintRelation(ConstraintRelation.GREATER)],
            [1.0],
            [Variable("z", cost=1.0, lower=0.0)],
        )
        g.removed_variables["w"] = 2.0
        g.removed_variables["u"] = LinearCombination(1.0, [("w", 3.0)])
        g.removed_variables["t"] = LinearCombination(0.0, [("z", 1.0)])
        changed = g.resolve_removed_where_possible()
        assert changed == ["u"]
        assert g.removed_variables["u"] == pytest.approx(7.0)
        assert isinstance(g.removed_variables["t"], LinearCombination)
        # not fully presolved: no complete solution yet
        assert g.compute_solution_where_possible() is None

    def test_full_solution_when_no_active_vars(self):
        g = _gf(
            Objective.MINIMIZE,
            np.zeros((0, 0)),
            [],
            [],
            [],
            fixed_cost=4.5,
        )
        g.removed_variables["a"] = 1.5
        g.removed_variables["b"] = LinearCombination(1.0, [("a", 2.0)])
        sol = g.compute_solution_where_possible()
        assert sol is not None
        assert sol.value_of("b") == pytest.approx(4.0)
        assert sol.objective_value == pytest.approx(4.5)
