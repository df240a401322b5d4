"""Host sparse-LU dual simplex (simplex/lu_host.py) — the reference's
Markowitz-LU counterpart (lower_upper/mod.rs:35-391) for the XL tier.

Routed by the driver when m_pad > config.refactor_external_m (forced tiny
here so small Netlib instances exercise the path on CPU)."""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
from relp_tpu.api import solve
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.utils.config import SolverConfig
from tests.conftest import reference_problem

CASES = [
    ("SHARE1B", -76589.31857918046, 1e-9),
    ("SC205", -52.202061211707246, 1e-9),
    ("BOEING2", -315.01872801520287, 1e-9),
    ("BORE3D", 1373.0803942084927, 1e-9),
]


@pytest.mark.parametrize("name,expected,rel", CASES)
def test_dual_lu_route_matches_reference_objectives(name, expected, rel):
    res = solve(
        reference_problem("netlib", f"{name}.SIF"),
        SolverConfig(algorithm="dual", refactor_external_m=32, xl_engine="lu"),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(expected, rel=rel)


def test_dual_lu_infeasible_detection():
    # x >= 2, x <= 1 after rows: 1*x >= 2 and 1*x <= 1 — primal infeasible
    import scipy.sparse as sp

    from relp_tpu.simplex import status as st
    from relp_tpu.simplex.lu_host import solve_dual_lu

    A = sp.csc_matrix(np.array([[1.0], [1.0]]))
    b = np.array([2.0, 1.0])
    # equalities with slacks folded as bounds is the cf form; emulate with
    # two equality rows sharing x — inconsistent b makes it infeasible
    basis0 = np.array([1, 2])  # artificials
    vstat0 = np.array([st.NB_LOWER, st.BASIC, st.BASIC], np.int32)
    out = solve_dual_lu(
        A, b, np.array([1.0]), np.array([0.0]), np.array([10.0]),
        basis0, vstat0, np.ones(2), SolverConfig(), 1000, n_pad=1,
    )
    assert int(out.status) == st.INFEASIBLE


def test_xl_crossover_via_external_primal():
    """PDLP + crossover through the externally refactorized device primal
    (xl_engine="primal" forces the primal_xl_* path — the round-3 verdict
    item 4 that removed the in-loop row cap): an exact vertex comes back."""
    res = solve(
        reference_problem("netlib", "ADLITTLE.SIF"),
        SolverConfig(
            algorithm="pdlp", pdlp_crossover=True, xl_engine="primal",
        ),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.simplex.basis is not None  # exact vertex, not a PDLP point
    assert res.solution.objective_value == pytest.approx(
        225494.96316238036, rel=1e-9
    )


def test_xl_warm_start_basis_route():
    """Basis-file warm start through the externally refactorized primal
    (the engine that serves basis warm starts above the in-loop ceiling):
    the vendored unicamp model/basis pair."""
    from relp_tpu.io import import_lp
    from relp_tpu.io.basis_file import import_basis
    from relp_tpu.simplex.driver import solve_general_form

    problem = reference_problem("unicamp", "model_data_1.mps")
    basis = import_basis(reference_problem("unicamp", "basis_data_1.mps"))
    res = solve_general_form(
        import_lp(problem),
        SolverConfig(presolve=False, xl_engine="primal"),
        initial_basis=basis,
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(123 / 38, rel=1e-9)


@pytest.mark.netlib
@pytest.mark.parametrize(
    "name,expected",
    [
        ("ADLITTLE", 2.2549496316e5),
        ("SHARE1B", -7.6589318579e4),
        ("BRANDY", 1.5185098965e3),
    ],
)
def test_external_primal_cold_netlib(name, expected):
    """Cold two-phase solves through primal_xl_* (external
    refactorization): phase transition, repair routing and chunked
    re-entry must reproduce the in-loop core's results."""
    res = solve(
        reference_problem("netlib", f"{name}.SIF"),
        SolverConfig(xl_engine="primal"),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(
        expected, rel=1e-6, abs=1e-5
    )


def test_xl_engine_lu_forces_host_dual_at_any_size():
    """config.xl_engine="lu" (CLI --xl-engine lu) routes --algorithm dual
    through the host sparse-LU engine regardless of the XL row threshold
    (FIT2P-class instances run 20x faster there than on the device
    primal); no refactor_external_m override needed."""
    res = solve(
        reference_problem("netlib", "SHARE1B.SIF"),
        SolverConfig(algorithm="dual", xl_engine="lu"),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(
        -76589.31857918046, rel=1e-9
    )
