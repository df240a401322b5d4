"""Panelized f64 kernels (ops/linalg.py): the XL-scale HBM-bounded forms
must agree exactly in semantics with the direct dense ops.  The panel
threshold is monkeypatched small so the panelled code path runs at unit
sizes (the real trigger is STOCFOR3-class m_pad ≈ 17k)."""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
import jax.numpy as jnp

from relp_tpu.ops import linalg


@pytest.fixture
def small_panels(monkeypatch):
    monkeypatch.setattr(linalg, "_PANEL_MAX_OUT", 1024)


def test_panel_matmul_matches_dense(small_panels):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((96, 64))
    B = rng.standard_normal((64, 96))
    got = np.asarray(linalg.panel_matmul(jnp.asarray(A), jnp.asarray(B)))
    # blocked contraction reorders the sum vs numpy — allow a few ulps
    np.testing.assert_allclose(got, A @ B, rtol=1e-11)


def test_panel_submatmul_matches_dense(small_panels):
    rng = np.random.default_rng(1)
    M = rng.standard_normal((96, 96))
    F = rng.standard_normal((96, 32))
    R = rng.standard_normal((32, 96))
    got = np.asarray(
        linalg.panel_submatmul(jnp.asarray(M), jnp.asarray(F), jnp.asarray(R))
    )
    np.testing.assert_allclose(got, M - F @ R, rtol=1e-11)


def test_panel_matvec_matches_dense(small_panels):
    rng = np.random.default_rng(2)
    M = rng.standard_normal((96, 80))
    v = rng.standard_normal(80)
    got = np.asarray(linalg.panel_matvec(jnp.asarray(M), jnp.asarray(v)))
    np.testing.assert_allclose(got, M @ v, rtol=1e-12)


def test_panel_vecmat_matches_dense(small_panels):
    rng = np.random.default_rng(3)
    M = rng.standard_normal((80, 96))
    v = rng.standard_normal(80)
    got = np.asarray(linalg.panel_vecmat(jnp.asarray(v), jnp.asarray(M)))
    np.testing.assert_allclose(got, v @ M, rtol=1e-12)


def test_panel_width_exact_divisor():
    for n_out, m in [(34816, 17408), (17408, 17408), (4096, 8192), (96, 96)]:
        p = linalg._panel_width(n_out, m)
        assert n_out % p == 0
        assert p * m <= max(linalg._PANEL_MAX_OUT, m)


def test_blocked_gj_inverse_matches_numpy(small_panels):
    B = np.random.default_rng(4).standard_normal((64, 64)) + 64 * np.eye(64)
    X = np.asarray(linalg.blocked_gj_inverse(jnp.asarray(B), block=16))
    np.testing.assert_allclose(X, np.linalg.inv(B), rtol=1e-8)


def test_inverse_residual_probe_path(small_panels):
    # above the (patched) threshold the residual uses probe matvecs
    B = np.random.default_rng(5).standard_normal((64, 64)) + 64 * np.eye(64)
    X = np.linalg.inv(B)
    r = float(linalg.inverse_residual(jnp.asarray(B), jnp.asarray(X)))
    assert r < 1e-12
    r_bad = float(
        linalg.inverse_residual(jnp.asarray(B), jnp.asarray(X * 1.001))
    )
    assert r_bad > 1e-4
