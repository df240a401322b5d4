"""Pallas brick-SpMV / fused-pricing kernels (ops/pallas_kernels.py) must
reproduce the XLA brick contraction exactly (f32) — validated in
interpreter mode on the CPU backend; TPU wall-clock is raced by
tools/bench_pallas.py with recorded receipts."""

import numpy as np
import pytest
import scipy.sparse as sp

import relp_tpu  # noqa: F401


def _random_operator(m_pad=256, n_pad=512, density=0.02, seed=7):
    rng = np.random.default_rng(seed)
    A = sp.random(
        m_pad, n_pad, density=density, random_state=rng, format="csc",
        dtype=np.float64,
    )
    return A


def test_brick_spmv_pallas_matches_xla():
    from relp_tpu.ops.bricks import bricks_from_csc
    from relp_tpu.ops.pallas_kernels import brick_spmv_pallas

    A = _random_operator()
    B = bricks_from_csc(A, A.shape[0], A.shape[1])
    rng = np.random.default_rng(3)
    x = rng.standard_normal(A.shape[1])

    y_ref = np.asarray(A @ x)
    data32 = np.asarray(B.rdata, np.float32)
    y_pl = np.asarray(
        brick_spmv_pallas(
            data32, np.asarray(B.ridx, np.int32),
            np.asarray(x, np.float32), interpret=True,
        )
    )
    assert y_pl == pytest.approx(y_ref, rel=2e-5, abs=2e-5)


def test_brick_pricing_pallas_matches_xla():
    from relp_tpu.ops.bricks import bricks_from_csc
    from relp_tpu.ops.pallas_kernels import brick_pricing_pallas

    A = _random_operator(seed=11)
    B = bricks_from_csc(A, A.shape[0], A.shape[1])
    rng = np.random.default_rng(5)
    pi = rng.standard_normal(A.shape[0])
    c = rng.standard_normal(A.shape[1])

    d_ref = c - np.asarray(A.T @ pi)
    d_pl = np.asarray(
        brick_pricing_pallas(
            np.asarray(B.cdata, np.float32), np.asarray(B.cidx, np.int32),
            np.asarray(pi, np.float32), np.asarray(c, np.float32),
            interpret=True,
        )
    )
    assert d_pl == pytest.approx(d_ref, rel=2e-5, abs=2e-5)
