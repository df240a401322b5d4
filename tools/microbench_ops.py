import time, numpy as np, relp_tpu, jax, jax.numpy as jnp
from jax import lax

m, n = 1024, 2048
key = jax.random.PRNGKey(0)
A64 = jax.random.normal(key, (m, n), jnp.float64)
A32 = A64.astype(jnp.float32)
Binv = jax.random.normal(key, (m, m), jnp.float64)
pi64 = jax.random.normal(key, (m,), jnp.float64)
v64 = jax.random.normal(key, (m,), jnp.float64)
d64 = jax.random.normal(key, (n,), jnp.float64)

def chain(f, x0, iters=1000):
    @jax.jit
    def run(x):
        def body(x, _):
            return f(x), None
        y, _ = lax.scan(body, x, None, length=iters)
        return y
    jax.block_until_ready(run(x0))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    return (time.perf_counter() - t0) / iters * 1e6  # us/op

print("us per op at m=%d n=%d:" % (m, n), flush=True)
print(f"  pricing f64 (pi@A):      {chain(lambda x: (x @ A64)[:m]*1e-3, pi64):8.2f}", flush=True)
print(f"  pricing f32 (pi@A32):    {chain(lambda x: (x.astype(jnp.float32) @ A32)[:m].astype(jnp.float64)*1e-3, pi64):8.2f}", flush=True)
print(f"  FTRAN f64 (Binv@v):      {chain(lambda x: (Binv @ x)*1e-3, v64):8.2f}", flush=True)
print(f"  matvec f64 (v@Binv):     {chain(lambda x: (x @ Binv)*1e-3, v64):8.2f}", flush=True)
print(f"  rank1 f64 (outer+sub):   {chain(lambda x: ((Binv - x[:,None]*(x[None,:]*1e-6))[0,:])*1e-3, v64):8.2f}", flush=True)
print(f"  argmax n:                {chain(lambda x: x.at[0].set(jnp.argmax(x).astype(jnp.float64)*1e-9), d64):8.2f}", flush=True)
print(f"  col gather A[:,q]:       {chain(lambda x: jnp.take(A64, (x[0]*0).astype(jnp.int32)+5, axis=1)+x*1e-9, v64):8.2f}", flush=True)
print(f"  elementwise chain (5 where on n):    {chain(lambda x: jnp.where(x>0, x*0.5, jnp.where(x<-1, x+1, x))*1.0001, d64):8.2f}", flush=True)
# scalar select / tiny op dispatch cost
print(f"  tiny scalar op:          {chain(lambda x: x.at[0].add(1e-12), v64):8.2f}", flush=True)
