"""BASELINE config 5: lazy column generation over a 10k-column pool with
masked pricing — the engine prices the full HBM-resident pool in one fused
matvec; 'inactive' virtual columns are excluded by the static can_enter
mask (lb = ub = 0)."""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.providers.base import ColumnPool
from relp_tpu.simplex import status as st
from relp_tpu.simplex.core import solve_core
from relp_tpu.utils.config import SolverConfig

INF = float("inf")


def build_pool(m=64, n_pool=10_000, active_every=7, seed=3):
    """A covering-style LP over a large virtual pool; only every k-th
    column is active."""
    rng = np.random.default_rng(seed)
    A = np.where(rng.random((m, n_pool)) < 0.05, rng.random((m, n_pool)), 0.0)
    A[np.arange(m), rng.integers(0, n_pool, m)] = 1.0
    active = np.zeros(n_pool, dtype=bool)
    active[::active_every] = True
    b = A[:, active] @ rng.random(int(active.sum()))  # feasible w.r.t. active set
    c = rng.random(n_pool) + 0.1
    return ColumnPool(
        A=A, b=b, c=c,
        lb=np.zeros(n_pool), ub=np.full(n_pool, INF),
        names=[f"v{j}" for j in range(n_pool)],
        active=active,
    )


def _pad_solve(pool, cfg):
    A, b, c, lb, ub = pool.masked_arrays()
    m, n = A.shape
    mp = ((m + 63) // 64) * 64
    npad = ((n + 511) // 512) * 512
    Ap = np.zeros((mp, npad)); Ap[:m, :n] = A
    bp = np.zeros(mp); bp[:m] = b
    cp = np.zeros(npad); cp[:n] = c
    lbp = np.zeros(npad); ubp = np.zeros(npad)
    lbp[:n] = lb; ubp[:n] = ub
    return solve_core(Ap, bp, cp, lbp, ubp, cfg=cfg, max_iter=5000), n


def test_masked_pool_pricing_10k():
    pool = build_pool()
    out, n = _pad_solve(pool, SolverConfig(scale=False))
    assert int(out.status) == st.OPTIMAL
    x = np.asarray(out.x)[: pool.nr_columns]
    # inactive virtual columns never enter
    assert np.all(x[~pool.active] == 0.0)
    assert float(out.obj) > 0


def test_activating_columns_only_improves():
    pool = build_pool()
    out1, _ = _pad_solve(pool, SolverConfig(scale=False))
    # activate everything: optimum can only improve (minimization)
    pool2 = build_pool()
    pool2.active = np.ones(pool2.nr_columns, dtype=bool)
    out2, _ = _pad_solve(pool2, SolverConfig(scale=False))
    assert int(out2.status) == st.OPTIMAL
    assert float(out2.obj) <= float(out1.obj) + 1e-9
