"""Interior-point engine (relp_tpu/simplex/primal_dual.py): Mehrotra
predictor-corrector must reach simplex-grade objectives on Netlib, feed
the shared crossover an interior point it can polish to an exact vertex,
and fall back to simplex cleanly when it cannot certify.

The reference reserves this module (`src/algorithm/primal_dual/mod.rs:1-3`);
these tests pin the made-real behavior.
"""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.utils.config import SolverConfig
from tests.conftest import reference_problem


@pytest.mark.netlib
@pytest.mark.parametrize(
    "name,expected",
    [
        ("AFIRO", -464.753142857),
        ("SC50B", -70.0),
        ("ADLITTLE", 2.2549496316e5),
        ("ISRAEL", -8.966448218e5),
        ("SHARE1B", -7.6589318579e4),
        ("BRANDY", 1.5185098965e3),
        # objective-row constant excluded (same convention as the simplex
        # suite, tests/test_netlib_extended.py)
        ("E226", -11.638929066),
    ],
)
def test_ipm_netlib_objectives(name, expected):
    from relp_tpu.api import solve

    res = solve(
        reference_problem("netlib", f"{name}.SIF"),
        config=SolverConfig(algorithm="ipm"),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(
        expected, rel=1e-6, abs=1e-5
    )


def test_ipm_crossover_vertex_certified():
    """The IPM point fed through the shared crossover must produce a basis
    the exact rational verifier certifies."""
    from relp_tpu.api import solve
    from relp_tpu.numerics.exact import certify_optimal_basis

    path = reference_problem("netlib", "ADLITTLE.SIF")
    res = solve(path, config=SolverConfig(algorithm="ipm"))
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.simplex is not None and res.simplex.basis is not None
    cert = certify_optimal_basis(res.cf, res.simplex)
    assert cert.ok()


def test_ipm_no_crossover_returns_interior_point():
    """pdlp_crossover=False returns the interior point as-is: feasible to
    first-order tolerance, but no vertex basis for ranging."""
    from relp_tpu.api import solve

    res = solve(
        reference_problem("netlib", "SC50B.SIF"),
        config=SolverConfig(algorithm="ipm", pdlp_crossover=False),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(-70.0, rel=1e-6)


def test_ipm_falls_back_on_budget():
    """One Mehrotra iteration cannot certify: the driver must fall back to
    the simplex path and still return the right answer."""
    from relp_tpu.api import solve

    res = solve(
        reference_problem("burkardt", "afiro.mps"),
        config=SolverConfig(algorithm="ipm", ipm_max_iter=1),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(
        -464.753142857, rel=1e-8
    )


def test_ipm_duals_match_simplex():
    """IPM y (crossover-polished) must agree with the simplex duals on a
    nondegenerate instance, in ORIGINAL row units."""
    from relp_tpu.api import solve

    path = reference_problem("netlib", "SC50B.SIF")
    ip = solve(path, config=SolverConfig(algorithm="ipm"))
    sx = solve(path, config=SolverConfig())
    assert ip.simplex.duals == pytest.approx(
        sx.simplex.duals, rel=1e-6, abs=1e-7
    )


def test_ipm_free_and_ranged_bounds():
    """Bound-class coverage: BOUNDS section with FR/MI/UP entries routes
    through the masked (hl, hu) complementarity pairs."""
    from relp_tpu.api import solve

    path = reference_problem("netlib", "BOEING2.SIF")
    res = solve(path, config=SolverConfig(algorithm="ipm"))
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(
        -3.1501872802e2, rel=1e-6
    )


@pytest.mark.parametrize("ladder", ["mixed", "f64"])
def test_ipm_ladder_config(ladder, monkeypatch):
    """config.ipm_ladder selects the Cholesky precision ladder explicitly
    (mixed = f32→f64 even on CPU, exercising the escalation + relative
    refinement gate; f64 = single rung).  Both must solve to the same
    objective."""
    from relp_tpu.api import solve

    monkeypatch.setenv("RELP_TPU_IPM_CHUNK", "8")
    res = solve(
        reference_problem("netlib", "SHARE1B.SIF"),
        config=SolverConfig(
            algorithm="ipm", ipm_ladder=ladder, pdlp_crossover=False
        ),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(
        -7.6589318579e4, rel=1e-6
    )


@pytest.mark.slow
def test_ipm_greenbea_f64_ladder():
    """GREENBEA regression (VERDICT r4 weak #4): on the f64-only ladder
    the Mehrotra engine must accept an interior point (no simplex
    fallback) — the mixed ladder's f32 escape phase decentres the
    iterate (ROUND5.md, runs/r5s2_greenbea_cpu_ipm.log).  The accepted
    point's objective carries ~1e-3 relative slop (|obj|=7.3e7 with
    duals ~1e5 amplify the scaled-space KKT), which is why the bench
    keeps GREENBEA on the primal simplex — this test pins the
    no-stall behavior, not vertex accuracy."""
    from relp_tpu.api import solve

    res = solve(
        reference_problem("netlib", "GREENBEA.SIF"),
        config=SolverConfig(
            algorithm="ipm", ipm_ladder="f64", pdlp_crossover=False
        ),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    # interior point accepted, not the 11k-pivot simplex fallback
    assert res.simplex.iterations < 200
    assert res.solution.objective_value == pytest.approx(
        -7.2555248129846e7, rel=2e-3
    )
