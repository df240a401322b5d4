import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import relp_tpu
import jax, jax.numpy as jnp
from jax.scipy.linalg import cho_solve

print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
rng = np.random.default_rng(0)
for m, n in ((2048, 8192), (6144, 13824)):
    A = rng.standard_normal((m, n)) / np.sqrt(n)
    K = A @ A.T + 1e-8*np.eye(m)
    rhs = rng.standard_normal(m)
    for dt in (jnp.float32, jnp.float64):
        Kd = jax.device_put(jnp.asarray(K, dt))
        rd = jax.device_put(jnp.asarray(rhs, dt))
        f = jax.jit(lambda K, r: cho_solve((jnp.linalg.cholesky(K), True), r))
        t0=time.time(); x = jax.block_until_ready(f(Kd, rd)); t1=time.time()
        t2=time.time(); x = jax.block_until_ready(f(Kd, rd)); t3=time.time()
        resid = np.max(np.abs(K @ np.asarray(x, np.float64) - rhs))
        print(f"m={m} {np.dtype(dt).name}: compile+run={t1-t0:.1f}s run={t3-t2:.2f}s resid={resid:.2e}", flush=True)
    # GEMM timing: K formation in f64 vs f32-HIGHEST
    Ad64 = jax.device_put(jnp.asarray(A, jnp.float64))
    Ad32 = jax.device_put(jnp.asarray(A, jnp.float32))
    g64 = jax.jit(lambda B: jnp.matmul(B, B.T))
    g32 = jax.jit(lambda B: jnp.matmul(B, B.T, precision=jax.lax.Precision.HIGHEST))
    for name, g, Ad in (("gemm_f64", g64, Ad64), ("gemm_f32H", g32, Ad32)):
        jax.block_until_ready(g(Ad))
        t0=time.time(); jax.block_until_ready(g(Ad)); t1=time.time()
        print(f"m={m} {name}: run={t1-t0:.2f}s", flush=True)
