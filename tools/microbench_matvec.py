"""Compare f64 matvec formulations on TPU (dot vs broadcast-multiply+sum).

f64 matmul is emulated (~3 GFLOP/s observed) while elementwise f64 ops are
several times cheaper per flop — if mul+sum wins, the FTRAN in the simplex
core should switch formulation.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

import relp_tpu  # noqa: F401


def chain(f, x0, iters=500):
    @jax.jit
    def run(x):
        def body(x, _):
            return f(x), None
        y, _ = lax.scan(body, x, None, length=iters)
        return y
    jax.block_until_ready(run(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    return (time.perf_counter() - t0) / iters * 1e6


def main():
    for m in (512, 1024, 2048):
        key = jax.random.PRNGKey(0)
        B = jax.random.normal(key, (m, m), jnp.float64)
        v = jax.random.normal(key, (m,), jnp.float64)
        t_dot = chain(lambda x: (B @ x) * 1e-3, v)
        t_sum = chain(lambda x: jnp.sum(B * x[None, :], axis=1) * 1e-3, v)
        print(f"m={m}: dot {t_dot:8.2f}us   mul+sum {t_sum:8.2f}us", flush=True)


if __name__ == "__main__":
    main()
