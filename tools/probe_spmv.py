"""Microbenchmark the PDHG per-iteration primitives on the device.

Times, inside ONE jitted fori_loop each (so host dispatch is excluded):
  - rmatvec   (A^T y: column-major ELL gather+sum, f64 and f32)
  - matvec    (A x: row-major ELL gather+sum, f64 and f32)
  - matvec via the column-major scatter-add (the pre-row-twin form)
  - the vector-only part of a PDHG step (clip, axpy, dots)
  - the full PDHG step body (fom/pdhg.py step semantics)

Usage:  python tools/probe_spmv.py [SIF path] [iters]
Keep the TPU free while this runs (CLAUDE.md: one TPU process at a time).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from relp_tpu.io import import_lp
from relp_tpu.model.computational_form import build_computational_form
from relp_tpu.presolve.engine import presolve
from relp_tpu.simplex.driver import _bucket, _device_matrix
from relp_tpu.utils.config import SolverConfig


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/tests/netlib/problem_files/DFL001.SIF"
    )
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    gf = import_lp(path)
    presolve(gf)
    cf = build_computational_form(gf)
    cfg = SolverConfig(matrix_format="ell")
    m_pad = _bucket(cf.m, 256)
    n_pad = _bucket(cf.n + 0, 256)
    A = _device_matrix(cf, m_pad, n_pad, cfg)
    print(f"m={cf.m} n={cf.n} m_pad={m_pad} n_pad={n_pad} "
          f"K={A.data.shape[1]} Kr={A.rdata.shape[1]} nnz={cf.A.nnz}",
          flush=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n_pad,), jnp.float64)
    y = jax.random.uniform(key, (m_pad,), jnp.float64)
    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    A32 = A.with_f32()
    rdata32 = A.rdata.astype(jnp.float32)
    lb = jnp.zeros(n_pad, jnp.float64)
    ub = jnp.full(n_pad, 1e6, jnp.float64)
    c = jax.random.uniform(key, (n_pad,), jnp.float64)
    b = jax.random.uniform(key, (m_pad,), jnp.float64)

    def bench(name, fn, *args):
        f = jax.jit(fn)
        r = jax.block_until_ready(f(*args))  # compile
        t0 = time.time()
        r = jax.block_until_ready(f(*args))
        dt = time.time() - t0
        per = dt / iters * 1e6
        print(f"{name:28s} {dt:8.3f}s  {per:10.1f} us/iter", flush=True)
        return r

    def loop(body):
        def fn(v):
            return lax.fori_loop(
                0, iters, lambda i, v: body(v) + 0.0 * i, v
            )
        return fn

    # rmatvec f64: sum over K of pi[rows]*data
    bench("rmatvec f64 (gather)", loop(
        lambda v: jnp.sum(jnp.take(y, A.rows) * A.data, axis=1) * 1e-6
        + v), x)
    bench("rmatvec f32 (gather)", loop(
        lambda v: jnp.sum(jnp.take(y32, A32.rows) * A32.data32, axis=1)
        * jnp.float32(1e-6) + v), x32)
    # matvec f64 row-major gather
    bench("matvec f64 (row gather)", loop(
        lambda v: jnp.sum(A.rdata * jnp.take(x, A.rcols), axis=1) * 1e-6
        + v), y)
    bench("matvec f32 (row gather)", loop(
        lambda v: jnp.sum(rdata32 * jnp.take(x32, A.rcols), axis=1)
        * jnp.float32(1e-6) + v), y32)
    # matvec f64 column-major scatter-add
    bench("matvec f64 (scatter)", loop(
        lambda v: jnp.zeros(m_pad, jnp.float64).at[A.rows].add(
            A.data * x[: n_pad, None]) * 1e-6 + v), y)
    # vector-only step ops
    def vec_step(v):
        x1 = jnp.clip(v - 1e-7 * (c - v), lb, ub)
        dx = x1 - v
        mv = dx @ dx
        return x1 * (1.0 + 1e-9 * mv)
    bench("vector ops (n) only", loop(vec_step), x)

    # full PDHG-like step
    def full_step(carry):
        xx, yy, ax = carry
        x1 = jnp.clip(
            xx - 1e-7 * (c - jnp.sum(jnp.take(yy, A.rows) * A.data, axis=1)),
            lb, ub)
        ax1 = jnp.sum(A.rdata * jnp.take(x1, A.rcols), axis=1)
        y1 = yy + 1e-7 * (b - (2.0 * ax1 - ax))
        dx = x1 - xx
        dy = y1 - yy
        chi = jnp.abs(dy @ (ax1 - ax))
        move = dx @ dx + dy @ dy
        ok = move > chi
        return (jnp.where(ok, x1, xx), jnp.where(ok, y1, yy),
                jnp.where(ok, ax1, ax))

    def full_loop(carry):
        return lax.fori_loop(
            0, iters, lambda i, cc: full_step(cc), carry)
    f = jax.jit(full_loop)
    r = jax.block_until_ready(f((x, y, jnp.zeros(m_pad, jnp.float64))))
    t0 = time.time()
    r = jax.block_until_ready(f((x, y, jnp.zeros(m_pad, jnp.float64))))
    dt = time.time() - t0
    print(f"{'full PDHG step':28s} {dt:8.3f}s  {dt/iters*1e6:10.1f} us/iter",
          flush=True)


if __name__ == "__main__":
    main()
