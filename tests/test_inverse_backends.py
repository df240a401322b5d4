"""Selectable inverse-maintenance backends (utils/config.py `inverse`):
the reference parameterizes its engine the same way — Carry<F,
BasisInverseRows> vs Carry<F, LUDecomposition> (inverse_maintenance/carry/,
chosen at the call site, src/bin/main.rs:52).  Both backends must agree on
every objective; the eta (block product-form) backend is the large-m path.
"""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
from relp_tpu.api import solve
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.utils.config import SolverConfig
from tests.conftest import reference_problem

CASES = [
    ("ADLITTLE", 2.254949632e05, 1e-3 * 2.3e5),
    ("SHARE2B", -4.157322407e02, 1e-3),
    ("LOTFI", -25.26470606188, 1e-5),
    ("BORE3D", 1.3730803942084927e3, 1e-2),
]


@pytest.mark.netlib
@pytest.mark.parametrize("name,expected,tol", CASES)
def test_eta_backend_matches_reference_objectives(name, expected, tol):
    cfg = SolverConfig(inverse="eta")
    res = solve(reference_problem("netlib", f"{name}.SIF"), config=cfg)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(expected, abs=tol)


@pytest.mark.netlib
def test_eta_backend_with_ell_matrix():
    """The large-m configuration: ELL device matrix + block product-form."""
    cfg = SolverConfig(inverse="eta", matrix_format="ell", eta_block=8)
    res = solve(reference_problem("netlib", "SC105.SIF"), config=cfg)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(-5.220206121e01, abs=1e-3)


def test_eta_block_boundary():
    """A solve whose pivot count crosses several fold boundaries with a tiny
    eta block, forcing fold + refactor interleaving."""
    cfg = SolverConfig(inverse="eta", eta_block=2, refactor_period=5)
    res = solve(reference_problem("netlib", "AFIRO.SIF"), config=cfg)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(-464.75314, abs=1e-3)


# ---- partial pricing (block-cyclic; SURVEY §7 pivot-rule mapping) ----------


@pytest.mark.netlib
@pytest.mark.parametrize("blocks", [2, 4])
def test_partial_pricing_matches(blocks):
    cfg = SolverConfig(price_blocks=blocks)
    res = solve(reference_problem("netlib", "SHARE1B.SIF"), config=cfg)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(
        -7.658931857918568e4, abs=1e-3 * 77
    )


@pytest.mark.netlib
def test_partial_pricing_with_ell_and_eta():
    cfg = SolverConfig(price_blocks=4, matrix_format="ell", inverse="eta")
    res = solve(reference_problem("netlib", "ADLITTLE.SIF"), config=cfg)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(2.254949632e05, rel=1e-3)


# ---- anti-degeneracy bound perturbation ------------------------------------


@pytest.mark.netlib
def test_perturbation_matches_reference():
    """Perturbed solve + true-bound warm cleanup must land on the same
    objective (SHARE1B is mildly degenerate)."""
    res = solve(
        reference_problem("netlib", "SHARE1B.SIF"),
        config=SolverConfig(perturb=1e-7),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(
        -7.658931857918568e4, abs=1e-3 * 77
    )


@pytest.mark.slow
@pytest.mark.netlib
def test_perturbation_unsticks_degen3():
    """DEGEN3 exceeds a 15-minute CPU budget unperturbed; with perturb=1e-7
    it solves to the HiGHS optimum (-987.294) in ~3 minutes (round-2 log)."""
    res = solve(
        reference_problem("netlib", "DEGEN3.SIF"),
        config=SolverConfig(perturb=1e-7),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(-987.294, abs=1e-3)
