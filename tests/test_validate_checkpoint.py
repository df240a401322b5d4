"""Tests for the BFS invariant checker and basis checkpoint/resume."""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
from relp_tpu.simplex import status as st
from relp_tpu.simplex.checkpoint import BasisCheckpoint
from relp_tpu.simplex.core import solve_core
from relp_tpu.simplex.validate import check_state
from relp_tpu.utils.config import SolverConfig

CFG = SolverConfig()


def problem(m=16, n=48, seed=7):
    rng = np.random.default_rng(seed)
    A = np.where(rng.random((m, n)) < 0.4, rng.standard_normal((m, n)), 0.0)
    A[np.arange(m), rng.integers(0, n, m)] = 1.0
    b = A @ rng.random(n)
    c = rng.standard_normal(n)
    return A, b, c, np.zeros(n), np.full(n, 10.0)


def test_final_state_passes_invariants():
    A, b, c, lb, ub = problem()
    out = solve_core(A, b, c, lb, ub, cfg=CFG, max_iter=500)
    assert int(out.status) == st.OPTIMAL
    # reconstruct Binv/xB exactly as the engine's refactor does
    m, n = A.shape
    basis = np.asarray(out.basis)
    is_art = basis >= n
    B = np.where(
        is_art[None, :],
        (np.arange(m)[:, None] == np.clip(basis - n, 0, m - 1)[None, :]).astype(float),
        A[:, np.clip(basis, 0, n - 1)],
    )
    Binv = np.linalg.inv(B)
    vstat = np.asarray(out.vstat)
    x = np.asarray(out.x)
    xB = x[np.clip(basis, 0, n - 1)] * (~is_art)
    chk = check_state(
        A, b, c, lb, ub, basis, vstat, xB, Binv, np.ones(m)
    )
    assert chk.ok(1e-7), chk


def test_checkpoint_roundtrip(tmp_path):
    A, b, c, lb, ub = problem(seed=8)
    out = solve_core(A, b, c, lb, ub, cfg=CFG, max_iter=500)
    assert int(out.status) == st.OPTIMAL
    ck = BasisCheckpoint.from_solve_output(out, n_padded=A.shape[1])
    path = tmp_path / "basis.npz"
    ck.save(path)
    loaded = BasisCheckpoint.load(path)
    np.testing.assert_array_equal(loaded.basis, ck.basis)

    # resume warm: should re-verify optimality in very few iterations
    basis0, vstat0 = loaded.warm_start_args()
    out2 = solve_core(
        A, b, c, lb, ub, cfg=CFG, max_iter=500, basis0=basis0, vstat0=vstat0
    )
    assert int(out2.status) == st.OPTIMAL
    assert float(out2.obj) == pytest.approx(float(out.obj), abs=1e-9)
    assert int(out2.it) <= 3
