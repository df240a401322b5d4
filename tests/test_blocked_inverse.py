"""Blocked Gauss-Jordan inverse — the XL-scale refactorization seed.

XLA's f32 LuDecomposition custom call overflows the 16 MB scoped VMEM
limit for m_pad ≳ 15k (first hit on STOCFOR3, m_pad=17408), so above
``_LU_VMEM_MAX_M`` the Newton seed comes from a matmul-only blocked
Gauss-Jordan and the (unexecutable-at-scale) scalar GJ fallback is
replaced by a singular-basis signal.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import relp_tpu.ops.linalg as linalg


def _simplex_like_basis(rng, m):
    """Sparse equilibrated basis like the engine actually refactorizes."""
    B = rng.standard_normal((m, m)) * (rng.random((m, m)) < 0.02)
    return B + np.diag(1.0 + rng.random(m))


@pytest.mark.parametrize("m,block", [(512, 128), (1024, 256), (2048, 512)])
def test_blocked_gj_inverse_seed_quality(m, block):
    rng = np.random.default_rng(7)
    B = _simplex_like_basis(rng, m)
    X = np.asarray(linalg.blocked_gj_inverse(jnp.asarray(B), block=block))
    resid = np.max(np.abs(np.eye(m) - B @ X))
    # seed quality: one Newton step from full f64 precision
    assert resid < 1e-6, resid


def test_newton_refined_uses_blocked_seed_above_threshold(monkeypatch):
    monkeypatch.setattr(linalg, "_LU_VMEM_MAX_M", 512)
    rng = np.random.default_rng(3)
    B = _simplex_like_basis(rng, 1024)
    X, resid = linalg.newton_refined_inverse(jnp.asarray(B))
    assert float(resid) < 1e-11
    err = np.max(np.abs(np.eye(1024) - B @ np.asarray(X)))
    assert err < 1e-9


def test_robust_inverse_flags_singular_at_scale(monkeypatch):
    monkeypatch.setattr(linalg, "_LU_VMEM_MAX_M", 512)
    rng = np.random.default_rng(5)
    B = _simplex_like_basis(rng, 1024)
    B[:, 3] = B[:, 17]  # exactly dependent columns
    _X, min_piv = linalg.robust_inverse(jnp.asarray(B))
    # no scalar-GJ fallback at scale: singularity must surface as pivot 0
    assert float(min_piv) == 0.0


def test_robust_inverse_healthy_at_scale(monkeypatch):
    monkeypatch.setattr(linalg, "_LU_VMEM_MAX_M", 512)
    rng = np.random.default_rng(9)
    B = _simplex_like_basis(rng, 1024)
    X, min_piv = linalg.robust_inverse(jnp.asarray(B))
    assert np.isinf(float(min_piv))
    err = np.max(np.abs(np.eye(1024) - B @ np.asarray(X)))
    assert err < 1e-9
