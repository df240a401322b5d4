"""Verify the amatrix gather-operand pin: full PDHG-like step through the
EllMatrix methods should now run at ~SpMV speed, not 26 ms/iter.

Usage:  python tools/probe_pin_fix.py [SIF path] [iters]
"""
import sys
import time

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

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n_pad,), jnp.float64)
    y = jax.random.uniform(key, (m_pad,), jnp.float64)
    lb = jnp.zeros(n_pad, jnp.float64)
    ub = jnp.full(n_pad, 1e6, jnp.float64)
    c = jax.random.uniform(key, (n_pad,), jnp.float64)
    b = jax.random.uniform(key, (m_pad,), jnp.float64)

    def full_step(carry):
        xx, yy, ax = carry
        x1 = jnp.clip(xx - 1e-7 * (c - A.rmatvec(yy)), lb, ub)
        ax1 = A.matvec(x1)
        y1 = yy + 1e-7 * (b - (2.0 * ax1 - ax))
        dx = x1 - xx
        dy = y1 - yy
        chi = jnp.abs(dy @ (ax1 - ax))
        move = dx @ dx + dy @ dy
        ok = move > chi
        return (jnp.where(ok, x1, xx), jnp.where(ok, y1, yy),
                jnp.where(ok, ax1, ax))

    f = jax.jit(lambda cc: lax.fori_loop(
        0, iters, lambda i, c_: full_step(c_), cc))
    init = (x, y, jnp.zeros(m_pad, jnp.float64))
    jax.block_until_ready(f(init))
    t0 = time.time()
    jax.block_until_ready(f(init))
    dt = time.time() - t0
    print(f"full PDHG step (pinned amatrix)  {dt:8.3f}s  "
          f"{dt/iters*1e6:10.1f} us/iter", flush=True)


if __name__ == "__main__":
    main()
