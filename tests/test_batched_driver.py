"""Batched end-to-end solves (BASELINE config: afiro + share2b + sc50a)."""

import pytest

import relp_tpu  # noqa: F401
from relp_tpu.io import import_lp
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.simplex.driver import solve_general_forms_batched
from relp_tpu.utils.config import SolverConfig
from tests.conftest import reference_problem

EXPECTED = [
    ("AFIRO.SIF", -4.6475314286e2, 1e-3),
    ("SHARE2B.SIF", -4.157322407e02, 1e-3),
    ("SC50A.SIF", -6.457507706e01, 1e-5),
]


def test_batched_netlib_trio():
    generals = [import_lp(reference_problem("netlib", n)) for n, _, _ in EXPECTED]
    results = solve_general_forms_batched(generals, SolverConfig())
    for (name, expected, tol), res in zip(EXPECTED, results):
        assert res.kind is LinearProgramType.FINITE_OPTIMUM, name
        assert res.solution.objective_value == pytest.approx(expected, abs=tol), name
