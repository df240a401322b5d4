import time, numpy as np, relp_tpu, jax, jax.numpy as jnp
from jax import lax
m = 1024
key = jax.random.PRNGKey(0)
Binv = jax.random.normal(key, (m, m), jnp.float64)
v = jax.random.normal(key, (m,), jnp.float64)

def chain(f, x0, iters=1000):
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

print(f"matvec f64 dot:        {chain(lambda x: (Binv @ x)*1e-3, v):8.2f}us", flush=True)
print(f"matvec f64 mul+sum:    {chain(lambda x: jnp.sum(Binv * x[None,:], axis=1)*1e-3, v):8.2f}us", flush=True)
print(f"matvec f64 einsum:     {chain(lambda x: jnp.einsum('ij,j->i', Binv, x, preferred_element_type=jnp.float64)*1e-3, v):8.2f}us", flush=True)
# df64 emulation: split Binv into two f32 (hi, lo), 3 f32 matvecs
Bhi = Binv.astype(jnp.float32)
Blo = (Binv - Bhi.astype(jnp.float64)).astype(jnp.float32)
def df64(x):
    xhi = x.astype(jnp.float32)
    xlo = (x - xhi.astype(jnp.float64)).astype(jnp.float32)
    y = (Bhi @ xhi).astype(jnp.float64) + (Bhi @ xlo).astype(jnp.float64) + (Blo @ xhi).astype(jnp.float64)
    return y*1e-3
print(f"matvec df64 3xf32:     {chain(df64, v):8.2f}us", flush=True)
