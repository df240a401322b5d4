"""Extended Netlib cross-validation: solve instances the reference does NOT
assert and compare objectives against scipy's HiGHS on the *same* lowered
problem (validates parser + converter + presolve + simplex jointly on much
broader data than the reference's 22 netlib tests)."""

import os

import numpy as np
import pytest
from scipy.optimize import linprog

import relp_tpu  # noqa: F401
from relp_tpu.io import import_lp
from relp_tpu.model.computational_form import build_computational_form
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.simplex.driver import solve_general_form
from relp_tpu.utils.config import SolverConfig
from tests.conftest import REFERENCE_DATA

# small/medium instances beyond the reference's asserted set
EXTENDED = [
    "BEACONFD", "BRANDY", "E226", "ISRAEL", "AGG", "AGG2", "AGG3",
    "BANDM", "SCORPION", "SCTAP1", "SCFXM1", "STAIR", "GROW7",
    "CAPRI", "SEBA", "SHELL", "SCSD1", "SCSD6", "STANDATA", "FORPLAN",
]


def highs_objective(path):
    gf = import_lp(path)
    cf = build_computational_form(gf, scale=False)
    res = linprog(
        cf.c,
        A_eq=cf.A,
        b_eq=cf.b,
        bounds=list(zip(cf.lb, cf.ub)),
        method="highs",
    )
    if res.status == 0:
        obj = float(cf._orig_cost @ (res.x[: cf.n_structural])) + cf.fixed_cost
        return "optimal", obj
    return {2: "infeasible", 3: "unbounded"}.get(res.status, "other"), None


@pytest.mark.netlib
@pytest.mark.parametrize("name", EXTENDED)
def test_matches_highs(name):
    path = os.path.join(REFERENCE_DATA, "netlib", "problem_files", f"{name}.SIF")
    if not os.path.exists(path):
        pytest.skip(f"{name} not vendored")
    ref_kind, ref_obj = highs_objective(path)
    res = solve_general_form(import_lp(path), SolverConfig())
    if ref_kind == "optimal":
        assert res.kind is LinearProgramType.FINITE_OPTIMUM, (name, res.kind)
        got = res.solution.objective_value
        assert got == pytest.approx(ref_obj, abs=1e-5 * (1 + abs(ref_obj))), name
    elif ref_kind == "infeasible":
        assert res.kind is LinearProgramType.INFEASIBLE, name
    elif ref_kind == "unbounded":
        assert res.kind is LinearProgramType.UNBOUNDED, name
