"""Measure TPU gather-layout throughput for SpMV design.

probe_step_bisect.py showed a dependent element-gather SpMV costs ~13 ms
(~14 ns per gathered element — serialized), while earlier "fast" numbers
were loop-invariant gathers LICM'd out of the loop.  This probe times
candidate layouts with a REAL loop-carried dependence (the gathered
aggregate feeds the next source vector at 1e-300 scale):

  a) element gather f64   idx[6144,256] from v[12288]   (current matvec)
  b) element gather f32
  c) row gather f64       take(v.reshape(96,128), idx[49152], axis=0)
  d) row gather f32
  e) one-hot matmul gather f32     onehot[49152,96] @ table[96,128]
  f) one-hot 2-limb exact f64      two f32 matmuls (hi/lo split)
  g) brick contraction f64 (VPU)   data[768,64,8,128] * gathered, sum
  h) brick contraction f32 (MXU-ish einsum)

Usage:  python tools/probe_gather_layouts.py [iters]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import relp_tpu  # noqa: F401  (platform config)

N = 12288
M = 6144
K = 256
NB = N // 128        # 96 column blocks
T = M // 8           # 768 row tiles
B = 64               # bricks per row tile


def bench(name, loop_fn, init, iters):
    f = jax.jit(loop_fn)
    jax.block_until_ready(f(init))
    t0 = time.time()
    jax.block_until_ready(f(init))
    dt = time.time() - t0
    print(f"{name:36s} {dt:8.3f}s  {dt/iters*1e6:10.1f} us/iter",
          flush=True)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.uniform(size=N))
    idx_el = jnp.asarray(rng.integers(0, N, size=(M, K)), jnp.int32)
    idx_row = jnp.asarray(rng.integers(0, NB, size=(T * B,)), jnp.int32)
    data = jnp.asarray(rng.uniform(size=(T, B, 8, 128)))
    data32 = data.astype(jnp.float32)
    onehot = jax.nn.one_hot(idx_row, NB, dtype=jnp.float32)  # [T*B, NB]

    def loop(body):
        return lambda v: lax.fori_loop(0, iters, lambda i, vv: body(vv), v)

    # a) element gather f64
    def a(v):
        g = jnp.sum(jnp.take(v, idx_el), axis=1)          # [M]
        return v + 1e-300 * jnp.sum(g)
    bench("a elem gather f64 (1.57M el)", loop(a), v0, iters)

    # b) element gather f32
    def bdy(v):
        g = jnp.sum(jnp.take(v, idx_el), axis=1)
        return v + jnp.float32(1e-30) * jnp.sum(g)
    bench("b elem gather f32", loop(bdy), v0.astype(jnp.float32), iters)

    # c) row gather f64 (49152 rows of 128 lanes)
    def c(v):
        tab = v.reshape(NB, 128)
        g = jnp.take(tab, idx_row, axis=0)                # [T*B, 128]
        return v + 1e-300 * jnp.sum(g)
    bench("c row gather f64 (49k x 128)", loop(c), v0, iters)

    def d(v):
        tab = v.reshape(NB, 128)
        g = jnp.take(tab, idx_row, axis=0)
        return v + jnp.float32(1e-30) * jnp.sum(g)
    bench("d row gather f32", loop(d), v0.astype(jnp.float32), iters)

    # e) one-hot matmul gather f32
    def e(v):
        tab = v.reshape(NB, 128)
        g = onehot @ tab                                   # [T*B, 128]
        return v + jnp.float32(1e-30) * jnp.sum(g)
    bench("e one-hot matmul f32", loop(e), v0.astype(jnp.float32), iters)

    # f) one-hot 2-limb exact f64 gather
    def f(v):
        tab = v.reshape(NB, 128)
        hi = tab.astype(jnp.float32)
        lo = (tab - hi.astype(jnp.float64)).astype(jnp.float32)
        g = (onehot @ hi).astype(jnp.float64) + (onehot @ lo)
        return v + 1e-300 * jnp.sum(g)
    bench("f one-hot 2-limb f64", loop(f), v0, iters)

    # g) brick contraction f64 on VPU (gathered rows from c)
    def g64(v):
        tab = v.reshape(NB, 128)
        gth = jnp.take(tab, idx_row, axis=0).reshape(T, B, 1, 128)
        y = jnp.sum(data * gth, axis=(1, 3))               # [T, 8]
        return v + 1e-300 * jnp.sum(y)
    bench("g brick mul+sum f64 (400MB)", loop(g64), v0, iters)

    # h) brick contraction f32
    def h32(v):
        tab = v.reshape(NB, 128)
        gth = jnp.take(tab, idx_row, axis=0).reshape(T, B, 1, 128)
        y = jnp.sum(data32 * gth, axis=(1, 3))
        return v + jnp.float32(1e-30) * jnp.sum(y)
    bench("h brick mul+sum f32 (200MB)", loop(h32), v0.astype(jnp.float32),
          iters)


if __name__ == "__main__":
    main()
