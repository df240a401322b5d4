"""MPS writer roundtrip tests: GeneralForm → text → GeneralForm must
preserve the model, and a written corpus problem must solve to the same
objective."""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
from relp_tpu.io import import_lp
from relp_tpu.io.mps_convert import mps_to_general_form
from relp_tpu.io.mps_parse import parse_free
from relp_tpu.io.mps_write import write_mps
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.simplex.driver import solve_general_form
from relp_tpu.utils.config import SolverConfig
from tests.conftest import reference_problem

INF = float("inf")


def roundtrip(gf):
    return mps_to_general_form(parse_free(write_mps(gf)))


def assert_models_equal(a, b):
    assert a.objective == b.objective
    assert a.nr_constraints == b.nr_constraints
    assert a.nr_variables == b.nr_variables
    np.testing.assert_allclose(a.A.toarray(), b.A.toarray(), rtol=1e-15)
    np.testing.assert_allclose(a.b, b.b, rtol=1e-15)
    assert a.fixed_cost == pytest.approx(b.fixed_cost)
    for va, vb in zip(a.variables, b.variables):
        assert va.name == vb.name
        assert va.cost == pytest.approx(vb.cost)
        assert va.lower == vb.lower or (np.isinf(va.lower) and np.isinf(vb.lower))
        assert va.upper == vb.upper or (np.isinf(va.upper) and np.isinf(vb.upper))
    for ra, rb in zip(a.constraint_types, b.constraint_types):
        assert ra.kind == rb.kind
        assert (ra.range_width is None) == (rb.range_width is None)
        if ra.range_width is not None:
            assert ra.range_width == pytest.approx(rb.range_width)


@pytest.mark.parametrize("suite,name", [
    ("burkardt", "afiro.mps"),
    ("burkardt", "testprob.mps"),
    ("cook", "small_example.mps"),
    ("netlib", "BOEING2.SIF"),   # exercises RANGES
])
def test_roundtrip_preserves_model(suite, name):
    gf = import_lp(reference_problem(suite, name))
    gf2 = roundtrip(gf)
    assert_models_equal(gf, gf2)


def test_roundtrip_preserves_optimum():
    gf = import_lp(reference_problem("burkardt", "afiro.mps"))
    res1 = solve_general_form(gf, SolverConfig())
    gf_rt = roundtrip(import_lp(reference_problem("burkardt", "afiro.mps")))
    res2 = solve_general_form(gf_rt, SolverConfig())
    assert res1.kind is res2.kind is LinearProgramType.FINITE_OPTIMUM
    assert res2.solution.objective_value == pytest.approx(
        res1.solution.objective_value, abs=1e-9
    )


def test_roundtrip_preserves_integrality():
    """INTORG/INTEND markers must survive write→parse so an exported MIP
    stays a MIP (advisor-adjacent writer hole)."""
    from relp_tpu.model.elements import (
        Objective, RangedConstraintRelation, VariableType,
    )
    from relp_tpu.model.general_form import GeneralForm, Variable
    import scipy.sparse as sp

    gf = GeneralForm(
        objective=Objective.MINIMIZE,
        A=sp.csc_matrix(np.array([[1.0, 1.0, 1.0, 1.0]])),
        constraint_types=[RangedConstraintRelation.greater()],
        b=np.array([2.0]),
        variables=[
            Variable("c0", cost=1.0, lower=0.0, upper=INF),
            Variable("i0", cost=2.0, lower=0.0, upper=10.0,
                     variable_type=VariableType.INTEGER),
            Variable("i1", cost=3.0, lower=0.0, upper=1.0,
                     variable_type=VariableType.INTEGER),
            Variable("c1", cost=0.5, lower=0.0, upper=5.0),
        ],
        row_names=["R1"],
    )
    gf2 = roundtrip(gf)
    assert_models_equal(gf, gf2)
    assert [v.variable_type for v in gf2.variables] == [
        v.variable_type for v in gf.variables
    ]


def test_roundtrip_negative_and_free_bounds():
    from relp_tpu.model.elements import Objective, RangedConstraintRelation
    from relp_tpu.model.general_form import GeneralForm, Variable
    import scipy.sparse as sp

    gf = GeneralForm(
        objective=Objective.MAXIMIZE,
        A=sp.csc_matrix(np.array([[1.0, -2.0, 3.0]])),
        constraint_types=[RangedConstraintRelation.range(5.0)],
        b=np.array([10.0]),
        variables=[
            Variable("free", cost=1.0, lower=-INF, upper=INF),
            Variable("neg", cost=-2.0, lower=-INF, upper=7.0),
            Variable("fixed", cost=0.5, lower=3.0, upper=3.0),
        ],
        fixed_cost=2.5,
        row_names=["R1"],
    )
    assert_models_equal(gf, roundtrip(gf))
