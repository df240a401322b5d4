import sys, os; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import relp_tpu  # sets x64
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
rng = np.random.default_rng(0)
for m in (512,):
    A = rng.standard_normal((m, 2*m))
    K = A @ A.T + 1e-6*np.eye(m)
    K64 = jnp.asarray(K, jnp.float64)
    try:
        t0=time.time()
        L = jax.block_until_ready(jnp.linalg.cholesky(K64))
        t1=time.time()
        r = np.asarray(L @ L.T - K64)
        print(f"m={m} f64 cholesky ok, rel_err={np.abs(r).max()/np.abs(K).max():.2e}, wall={t1-t0:.1f}s")
    except Exception as e:
        print(f"m={m} f64 cholesky FAILED: {type(e).__name__} {str(e)[:200]}")
    try:
        from jax.scipy.linalg import cho_solve
        rhs = jnp.asarray(rng.standard_normal(m), jnp.float64)
        t0=time.time()
        x = jax.block_until_ready(cho_solve((jnp.linalg.cholesky(K64), True), rhs))
        t1=time.time()
        resid = np.max(np.abs(K @ np.asarray(x) - np.asarray(rhs)))/np.max(np.abs(rhs))
        print(f"m={m} f64 cho_solve ok, rel_resid={resid:.2e}, wall={t1-t0:.1f}s")
    except Exception as e:
        print(f"m={m} f64 cho_solve FAILED: {type(e).__name__} {str(e)[:200]}")
