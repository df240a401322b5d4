"""Race the Pallas brick kernels against the XLA lowerings on real
operators (VERDICT r3 item 5 — record the numbers either way).

Builds the exact flat-brick operator the PDLP driver would build for an
instance (Ruiz-scaled, RCM-permuted, 128-padded) and times, on the
current backend:

  - y = A·x      : XLA flat-brick f32, XLA grouped-brick f32, Pallas f32
  - d = c − πᵀA  : XLA ELL rmatvec32 (the simplex core's pricing path),
                   XLA flat-brick f32, Pallas fused f32

Usage:  python tools/bench_pallas.py [DFL001 STOCFOR3 ...]
Writes runs/pallas_bench_<inst>_<backend>.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp

import relp_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def _build(inst):
    from relp_tpu.io import import_lp
    from relp_tpu.model.computational_form import build_computational_form
    from relp_tpu.presolve.engine import presolve
    from relp_tpu.simplex.driver import _bucket, _round_up
    from relp_tpu.ops.bricks import bandwidth_perm, bricks_from_csc
    from relp_tpu.ops.amatrix import ell_from_csc

    path = f"/root/reference/tests/netlib/problem_files/{inst}.SIF"
    gf = import_lp(path)
    presolve(gf)
    cf = build_computational_form(gf, scale=True)
    m_pad = max(_round_up(_bucket(cf.m, 1024), 128), 128)
    n_pad = max(_round_up(_bucket(cf.n, 256), 128), 128)
    csc = sp.csc_matrix(cf.A)
    rp, cp = bandwidth_perm(csc)
    coo = csc[rp][:, cp].tocoo()
    csc_p = sp.csc_matrix((coo.data, (coo.row, coo.col)), shape=(m_pad, n_pad))
    bricks = bricks_from_csc(csc_p, m_pad, n_pad)
    counts = np.diff(csc_p.indptr)
    k_pad = _bucket(max(int(counts.max()), 1), 8)
    rcounts = np.diff(csc_p.tocsr().indptr)
    kr_pad = _bucket(max(int(rcounts.max()), 1), 8)
    ell = ell_from_csc(csc_p, m_pad, n_pad, k_pad, kr_pad=kr_pad)
    return cf, csc_p, bricks, ell, m_pad, n_pad


def _time(fn, *args, iters=50):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    insts = sys.argv[1:] or ["DFL001"]
    backend = jax.default_backend()
    from relp_tpu.ops.bricks import grouped_bricks_from_csc
    from relp_tpu.ops.pallas_kernels import (
        brick_pricing_pallas, brick_spmv_pallas,
    )

    for inst in insts:
        cf, csc_p, B, ell, m_pad, n_pad = _build(inst)
        gB = grouped_bricks_from_csc(csc_p, m_pad, n_pad)
        rng = np.random.default_rng(0)
        x = jax.device_put(jnp.asarray(rng.standard_normal(n_pad), jnp.float32))
        pi = jax.device_put(jnp.asarray(rng.standard_normal(m_pad), jnp.float32))
        c32 = jax.device_put(jnp.asarray(rng.standard_normal(n_pad), jnp.float32))
        rdata = jax.device_put(jnp.asarray(B.rdata, jnp.float32))
        ridx = jax.device_put(jnp.asarray(B.ridx, jnp.int32))
        cdata = jax.device_put(jnp.asarray(B.cdata, jnp.float32))
        cidx = jax.device_put(jnp.asarray(B.cidx, jnp.int32))
        B32 = jax.device_put(jax.tree.map(
            lambda l: l.astype(jnp.float32)
            if l.dtype == jnp.float64 else l, B,
        ))
        gB32 = jax.device_put(jax.tree.map(
            lambda l: l.astype(jnp.float32)
            if l.dtype == jnp.float64 else l, gB,
        ))
        ell32 = jax.device_put(ell.with_f32())

        res = {
            "inst": inst, "backend": backend, "m_pad": m_pad, "n_pad": n_pad,
            "nnz": int(csc_p.nnz),
            "brick_slots": int(np.prod(B.ridx.shape)),
            "brick_mb_f32": float(np.asarray(B.rdata).nbytes / 2 / 1e6),
        }

        mv_flat = jax.jit(lambda M, v: M.matvec(v))
        mv_grp = jax.jit(lambda M, v: M.matvec(v))
        t, y_ref = _time(mv_flat, B32, x)
        res["spmv_xla_flat_us"] = t * 1e6
        t, y_g = _time(mv_grp, gB32, x)
        res["spmv_xla_grouped_us"] = t * 1e6
        try:
            t, y_pl = _time(brick_spmv_pallas, rdata, ridx, x)
            res["spmv_pallas_us"] = t * 1e6
            res["spmv_pallas_maxerr"] = float(
                np.max(np.abs(np.asarray(y_pl) - np.asarray(y_ref)))
            )
        except Exception as e:
            res["spmv_pallas_error"] = f"{type(e).__name__}: {str(e)[:300]}"

        pr_ell = jax.jit(lambda M, p, cc: cc - M.rmatvec32(p))
        pr_brick = jax.jit(lambda M, p, cc: cc - M.rmatvec(p))
        t, d_ell = _time(pr_ell, ell32, pi, c32)
        res["pricing_xla_ell_us"] = t * 1e6
        t, d_brick = _time(pr_brick, B32, pi, c32)
        res["pricing_xla_brick_us"] = t * 1e6
        try:
            t, d_pl = _time(brick_pricing_pallas, cdata, cidx, pi, c32)
            res["pricing_pallas_us"] = t * 1e6
            res["pricing_pallas_maxerr"] = float(
                np.max(np.abs(np.asarray(d_pl) - np.asarray(d_brick)))
            )
        except Exception as e:
            res["pricing_pallas_error"] = f"{type(e).__name__}: {str(e)[:300]}"

        out = f"runs/pallas_bench_{inst}_{backend}.json"
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
