"""Probe Pallas/Mosaic support on this TPU: f32 kernel, f64 kernel, and a
fused pricing-style kernel prototype (d = c - pi@A with block grid)."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import relp_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: OK {np.asarray(out).ravel()[:2]}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


def f32_kernel():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((8, 128), jnp.float32)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def f64_kernel():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((8, 128), jnp.float64)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def pricing_kernel():
    m, n, bn = 128, 1024, 256

    def k(pi_ref, A_ref, c_ref, o_ref):
        o_ref[:] = c_ref[:] - (pi_ref[:] @ A_ref[:])

    pi = jnp.ones((1, m), jnp.float32)
    A = jnp.ones((m, n), jnp.float32)
    c = jnp.ones((1, n), jnp.float32)
    grid = (n // bn,)
    return pl.pallas_call(
        k,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
    )(pi, A, c)


probe("pallas f32 elementwise", f32_kernel)
probe("pallas f64 elementwise", f64_kernel)
probe("pallas f32 pricing grid", pricing_kernel)
