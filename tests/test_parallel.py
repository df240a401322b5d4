"""Sharded / batched solve tests on the virtual 8-device CPU mesh
(SURVEY §2.8 — the new distributed layer; no reference counterpart)."""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
import jax

from relp_tpu.parallel.batched import solve_batched
from relp_tpu.parallel.mesh import make_solver_mesh
from relp_tpu.parallel.sharded import solve_sharded
from relp_tpu.simplex import status as st
from relp_tpu.simplex.core import solve_core
from relp_tpu.utils.config import SolverConfig

CFG = SolverConfig()


def problem(m, n, seed):
    rng = np.random.default_rng(seed)
    A = np.where(rng.random((m, n)) < 0.3, rng.standard_normal((m, n)), 0.0)
    A[np.arange(m), rng.integers(0, n, m)] = 1.0
    b = A @ rng.random(n)
    c = rng.standard_normal(n)
    return A, b, c, np.zeros(n), np.full(n, 10.0)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_solver_mesh(batch=2, cols=4)


def test_sharded_matches_single_device(mesh):
    A, b, c, lb, ub = problem(16, 64, seed=3)
    ref = solve_core(A, b, c, lb, ub, cfg=CFG, max_iter=500)
    out = solve_sharded(mesh, A, b, c, lb, ub, cfg=CFG, max_iter=500)
    assert int(out.status) == st.OPTIMAL == int(ref.status)
    assert float(out.obj) == pytest.approx(float(ref.obj), abs=1e-9)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-9)


def test_batched_matches_individual(mesh):
    probs = [problem(16, 64, seed=10 + i) for i in range(4)]
    stacked = [np.stack(arrs) for arrs in zip(*probs)]
    outs = solve_batched(*stacked, cfg=CFG, max_iter=500, mesh=mesh)
    for i, (A, b, c, lb, ub) in enumerate(probs):
        ref = solve_core(A, b, c, lb, ub, cfg=CFG, max_iter=500)
        assert int(outs.status[i]) == int(ref.status)
        if int(ref.status) == st.OPTIMAL:
            assert float(outs.obj[i]) == pytest.approx(float(ref.obj), abs=1e-8)


def test_batched_no_mesh():
    probs = [problem(8, 32, seed=20 + i) for i in range(3)]
    stacked = [np.stack(arrs) for arrs in zip(*probs)]
    outs = solve_batched(*stacked, cfg=CFG, max_iter=300)
    assert outs.status.shape == (3,)


def test_batched_chunked_continuation():
    probs = [problem(8, 32, seed=30 + i) for i in range(3)]
    stacked = [np.stack(arrs) for arrs in zip(*probs)]
    cfg = SolverConfig(device_chunk_iters=3)
    outs = solve_batched(*stacked, cfg=cfg, max_iter=500)
    ref = solve_batched(*stacked, cfg=SolverConfig(), max_iter=500)
    np.testing.assert_array_equal(np.asarray(outs.status), np.asarray(ref.status))
    for i in range(3):
        if int(ref.status[i]) == st.OPTIMAL:
            assert float(outs.obj[i]) == pytest.approx(float(ref.obj[i]), abs=1e-8)


@pytest.mark.netlib
def test_mesh_cols_product_path():
    """config.mesh_cols routes the FULL driver (presolve → lower → device
    solve) through the column-sharded placement — the sharding-as-a-product
    -feature item from the round-1 verdict.  Objectives must match the
    single-device solve exactly at reference tolerances."""
    from relp_tpu.api import solve
    from relp_tpu.model.elements import LinearProgramType
    from tests.conftest import reference_problem

    path = reference_problem("netlib", "SC105.SIF")
    res1 = solve(path, config=SolverConfig(mesh_cols=1))
    res4 = solve(path, config=SolverConfig(mesh_cols=4))
    assert res4.kind is LinearProgramType.FINITE_OPTIMUM
    assert res4.solution.objective_value == pytest.approx(
        res1.solution.objective_value, abs=1e-6
    )


@pytest.mark.netlib
def test_mesh_cols_with_ell():
    from relp_tpu.api import solve
    from relp_tpu.model.elements import LinearProgramType
    from tests.conftest import reference_problem

    res = solve(
        reference_problem("netlib", "SC105.SIF"),
        config=SolverConfig(mesh_cols=2, matrix_format="ell"),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(-5.220206121e01, abs=1e-3)


def test_mesh_cols_pdlp_path():
    """config.mesh_cols also routes the FIRST-ORDER engine through the
    column-sharded placement (driver _run_pdlp use_mesh): ELL leaves over
    'cols', per-iteration all-gather of x for A·x, psum'd KKT reductions."""
    from relp_tpu.api import solve
    from relp_tpu.model.elements import LinearProgramType
    from tests.conftest import reference_problem

    path = reference_problem("netlib", "SC50B.SIF")
    res = solve(
        path,
        config=SolverConfig(
            algorithm="pdlp", mesh_cols=4, pdlp_crossover=False
        ),
    )
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.solution.objective_value == pytest.approx(-70.0, rel=1e-6)
