"""Bisect the PDHG full-step fusion pathology on the device.

probe_spmv.py showed parts (2 SpMVs + vector ops) cost ~400 us but the
combined step costs ~26 ms — 60x.  This times progressively larger
subsets of the step body inside one jitted fori_loop each, plus dot
variants (f64 `@` vs jnp.sum(a*b) vs f32), to locate the cliff.

Usage:  python tools/probe_step_bisect.py [SIF path] [iters]
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
    n_pad = _bucket(cf.n, 256)
    A = _device_matrix(cf, m_pad, n_pad, cfg)
    print(f"m_pad={m_pad} n_pad={n_pad} K={A.data.shape[1]} "
          f"Kr={A.rdata.shape[1]}", flush=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n_pad,), jnp.float64)
    y = jax.random.uniform(key, (m_pad,), jnp.float64)
    lb = jnp.zeros(n_pad, jnp.float64)
    ub = jnp.full(n_pad, 1e6, jnp.float64)
    c = jax.random.uniform(key, (n_pad,), jnp.float64)
    b = jax.random.uniform(key, (m_pad,), jnp.float64)

    def bench(name, loop_fn, init):
        f = jax.jit(loop_fn)
        jax.block_until_ready(f(init))
        t0 = time.time()
        jax.block_until_ready(f(init))
        dt = time.time() - t0
        print(f"{name:36s} {dt:8.3f}s  {dt/iters*1e6:10.1f} us/iter",
              flush=True)

    def loop(body):
        return lambda init: lax.fori_loop(
            0, iters, lambda i, cc: body(cc), init)

    # v1: rmatvec + clip (carry x)
    def v1(xx):
        return jnp.clip(
            xx - 1e-7 * (c - jnp.sum(jnp.take(y, A.rows) * A.data, axis=1)),
            lb, ub)
    bench("v1 rmatvec+clip", loop(v1), x)

    # v2: + matvec + y update (carry x, y, ax)
    def v2(carry):
        xx, yy, ax = carry
        x1 = jnp.clip(
            xx - 1e-7 * (c - jnp.sum(jnp.take(yy, A.rows) * A.data, axis=1)),
            lb, ub)
        ax1 = jnp.sum(A.rdata * jnp.take(x1, A.rcols), axis=1)
        y1 = yy + 1e-7 * (b - (2.0 * ax1 - ax))
        return x1, y1, ax1
    bench("v2 +matvec+yupd", loop(v2), (x, y, jnp.zeros_like(y)))

    # v3: + one dot (chi), used only via a scalar multiply (no select)
    def v3(carry):
        xx, yy, ax = carry
        x1 = jnp.clip(
            xx - 1e-7 * (c - jnp.sum(jnp.take(yy, A.rows) * A.data, axis=1)),
            lb, ub)
        ax1 = jnp.sum(A.rdata * jnp.take(x1, A.rcols), axis=1)
        y1 = yy + 1e-7 * (b - (2.0 * ax1 - ax))
        chi = (y1 - yy) @ (ax1 - ax)
        return x1, y1 + 0.0 * chi, ax1
    bench("v3 +chi dot (@)", loop(v3), (x, y, jnp.zeros_like(y)))

    # v3s: same but dot via jnp.sum(a*b)
    def v3s(carry):
        xx, yy, ax = carry
        x1 = jnp.clip(
            xx - 1e-7 * (c - jnp.sum(jnp.take(yy, A.rows) * A.data, axis=1)),
            lb, ub)
        ax1 = jnp.sum(A.rdata * jnp.take(x1, A.rcols), axis=1)
        y1 = yy + 1e-7 * (b - (2.0 * ax1 - ax))
        chi = jnp.sum((y1 - yy) * (ax1 - ax))
        return x1, y1 + 0.0 * chi, ax1
    bench("v3s +chi dot (sum*)", loop(v3s), (x, y, jnp.zeros_like(y)))

    # v4: + all three dots, still no select
    def v4(carry):
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
        return x1 + 0.0 * move, y1 + 0.0 * chi, ax1
    bench("v4 +3 dots (@)", loop(v4), (x, y, jnp.zeros_like(y)))

    # v5: full step with selects, dots via @
    def v5(carry):
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
    bench("v5 full (select, @)", loop(v5), (x, y, jnp.zeros_like(y)))

    # v5s: full step, dots via jnp.sum(a*b)
    def v5s(carry):
        xx, yy, ax = carry
        x1 = jnp.clip(
            xx - 1e-7 * (c - jnp.sum(jnp.take(yy, A.rows) * A.data, axis=1)),
            lb, ub)
        ax1 = jnp.sum(A.rdata * jnp.take(x1, A.rcols), axis=1)
        y1 = yy + 1e-7 * (b - (2.0 * ax1 - ax))
        dx = x1 - xx
        dy = y1 - yy
        chi = jnp.abs(jnp.sum(dy * (ax1 - ax)))
        move = jnp.sum(dx * dx) + jnp.sum(dy * dy)
        ok = move > chi
        return (jnp.where(ok, x1, xx), jnp.where(ok, y1, yy),
                jnp.where(ok, ax1, ax))
    bench("v5s full (select, sum*)", loop(v5s), (x, y, jnp.zeros_like(y)))


if __name__ == "__main__":
    main()
