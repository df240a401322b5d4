"""MPS basis-file warm starts (vendored unicamp basis_data_1 pairs with
model_data_1)."""

import pytest

import relp_tpu  # noqa: F401
from relp_tpu.io import import_lp
from relp_tpu.io.basis_file import BasisStatus, import_basis, parse_basis
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.simplex.driver import solve_general_form
from relp_tpu.utils.config import SolverConfig
from tests.conftest import reference_problem


def test_parse_basis_file():
    basis = import_basis(reference_problem("unicamp", "basis_data_1.mps"))
    assert basis.column_status["COL04"] is BasisStatus.BASIC
    assert basis.column_status["COL01"] is BasisStatus.AT_LOWER
    assert basis.column_status["ROW01"] is BasisStatus.BASIC  # row logical
    assert basis.row_status["ROW03"] is BasisStatus.AT_LOWER  # from XL


def test_parse_basis_kinds():
    basis = parse_basis(
        "NAME test\n XU C1 R1\n XL C2 R2\n UL C3\n LL C4\n BS C5\nENDATA\n"
    )
    assert basis.column_status["C1"] is BasisStatus.BASIC
    assert basis.row_status["R1"] is BasisStatus.AT_UPPER
    assert basis.column_status["C2"] is BasisStatus.BASIC
    assert basis.row_status["R2"] is BasisStatus.AT_LOWER
    assert basis.column_status["C3"] is BasisStatus.AT_UPPER
    assert basis.column_status["C4"] is BasisStatus.AT_LOWER
    assert basis.column_status["C5"] is BasisStatus.BASIC


def test_warm_start_from_basis_file():
    problem = reference_problem("unicamp", "model_data_1.mps")
    basis = import_basis(reference_problem("unicamp", "basis_data_1.mps"))
    cfg = SolverConfig(presolve=False)

    cold = solve_general_form(import_lp(problem), cfg)
    warm = solve_general_form(import_lp(problem), cfg, initial_basis=basis)

    assert warm.kind is LinearProgramType.FINITE_OPTIMUM
    assert warm.solution.objective_value == pytest.approx(
        cold.solution.objective_value, abs=1e-8
    )
    # the provided basis is (near-)optimal: far fewer iterations than cold
    assert warm.simplex.iterations <= cold.simplex.iterations
