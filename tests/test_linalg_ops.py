"""Unit tests for the basis-inverse kernels (counterpart of the reference's
in-module inverse-maintenance tests, e.g. lower_upper/mod.rs:770-868 and
basis_inverse_rows.rs tests, with float tolerances instead of rationals)."""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
import jax.numpy as jnp

from relp_tpu.ops.linalg import (
    gauss_jordan_inverse,
    newton_refined_inverse,
    rank_one_basis_update,
    robust_inverse,
)


def random_spd_ish(m, seed=0):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((m, m))
    return B + m * np.eye(m)  # well-conditioned


def test_gauss_jordan_inverse_matches_numpy():
    B = random_spd_ish(24)
    inv, min_piv = gauss_jordan_inverse(jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(B), rtol=1e-10)
    assert float(min_piv) > 1.0


def test_gauss_jordan_flags_singular():
    B = np.eye(8)
    B[3, 3] = 0.0
    B[3, 4] = 0.0
    _, min_piv = gauss_jordan_inverse(jnp.asarray(B))
    assert float(min_piv) < 1e-12


def test_newton_refined_inverse_accuracy():
    B = random_spd_ish(64, seed=1)
    X, resid = newton_refined_inverse(jnp.asarray(B))
    assert float(resid) < 1e-11
    np.testing.assert_allclose(np.asarray(X), np.linalg.inv(B), rtol=1e-9)


def test_robust_inverse_fallback_on_singular():
    B = np.eye(8)
    B[2, 2] = 0.0
    inv, min_piv = robust_inverse(jnp.asarray(B))
    # falls back to GJ, which reports the (near-)zero pivot
    assert float(min_piv) < 1e-12


def test_rank_one_update_matches_recomputed_inverse():
    m = 16
    B = random_spd_ish(m, seed=2)
    Binv = np.linalg.inv(B)
    a_new = np.arange(1.0, m + 1.0)
    r = 5
    u = Binv @ a_new
    updated = rank_one_basis_update(jnp.asarray(Binv), jnp.asarray(u), r)
    B2 = B.copy()
    B2[:, r] = a_new
    np.testing.assert_allclose(np.asarray(updated), np.linalg.inv(B2), rtol=1e-8)
