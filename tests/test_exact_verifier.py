"""Exact-arithmetic verification of device solutions (SURVEY §2.1 TPU plan:
float64 solve + CPU-side exact certification)."""

from fractions import Fraction

import pytest

import relp_tpu  # noqa: F401
from relp_tpu.api import solve
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.numerics.exact import ExactVerifier
from tests.conftest import reference_problem


@pytest.mark.parametrize("suite,name", [
    ("burkardt", "afiro.mps"),
    ("burkardt", "testprob.mps"),
    ("netlib", "SC50B.SIF"),
])
def test_exact_residuals_small(suite, name):
    path = reference_problem(suite, name)
    res = solve(path)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    check = ExactVerifier(path).check(res.solution.as_dict())
    assert check.ok(tol=1e-6), (
        float(check.max_row_violation),
        float(check.max_bound_violation),
    )
    # exact objective of the float solution matches the reported one
    assert float(check.objective) == pytest.approx(
        res.solution.objective_value, abs=1e-6 * (1 + abs(res.solution.objective_value))
    )


def test_exact_objective_testprob_is_54():
    path = reference_problem("burkardt", "testprob.mps")
    res = solve(path)
    check = ExactVerifier(path).check(res.solution.as_dict())
    # testprob's optimum is integral; the float solution should be exact
    assert check.objective == Fraction(54)


@pytest.mark.parametrize("suite,name", [
    ("burkardt", "afiro.mps"),
    ("burkardt", "adlittle.mps"),
    ("netlib", "SC50B.SIF"),
])
def test_exact_optimality_certificate(suite, name):
    """Round-2 verdict item 5: the returned basis is certified OPTIMAL in
    exact rational arithmetic (zero-tolerance primal bounds + reduced-cost
    signs) — the guarantee the reference gets from rational arithmetic by
    construction (tests/burkardt/test.rs:50)."""
    from relp_tpu.numerics.exact import certify_optimal_basis

    res = solve(reference_problem(suite, name))
    cert = certify_optimal_basis(res.cf, res.simplex)
    assert cert.basis_nonsingular
    assert cert.max_primal_violation == 0
    assert cert.max_dual_violation == 0
    assert cert.ok()
    # the exact objective of the certified basis matches the float result
    assert float(cert.objective) == pytest.approx(
        res.solution.objective_value,
        abs=1e-9 * (1 + abs(res.solution.objective_value)),
    )
