"""Pallas TPU kernels for the brick-SpMV hot path (VERDICT r3 item 5).

SURVEY §7 planned Pallas kernels for the SpMV/FTRAN/BTRAN hot loops
(reference hot path: ``src/.../carry/lower_upper/mod.rs:157-230``).  This
module provides a hand-scheduled alternative to the XLA lowering of the
flat-brick SpMV (``ops/bricks.py::BrickMatrix``) so the two can be raced
honestly on the real operators — ``tools/bench_pallas.py`` records the
numbers either way (a negative result is a result: XLA's gather-of-rows
lowering may already sit at HBM bandwidth).

Kernel shape: the brick layout stores nonzeros as dense (8, 128) bricks
``data[T, B, 8, 128]`` with column-block ids ``idx[T, B]``.  One grid
program handles ``R_PER`` row-tiles: the x table (n/128 × 128, a few
hundred KB) sits whole in VMEM, slot loops run as ``fori_loop`` over the
B slots with per-slot 128-lane VMEM row reads (the layout's whole point
is that every gather is a full-lane row), and the (R_PER·8) partial sums
leave as one 128-lane output row.  f32 only — the f64 exactness path
stays on the XLA contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_PER = 16  # row-tiles per program: 16 tiles × 8 rows = one 128-lane output


def _spmv_kernel(idx_ref, x_ref, data_ref, o_ref):
    """One program: rows [i·R_PER·8, (i+1)·R_PER·8) of y = A·x.

    ``idx_ref`` is scalar-prefetched (SMEM) — the column-block id of every
    slot; ``x_ref`` is the full x table [NB, 128] in VMEM; ``data_ref`` is
    this program's brick block [R_PER, B, 8, 128] in VMEM.
    """
    i = pl.program_id(0)
    bsl = data_ref.shape[1]

    def tile_body(t, acc):
        def slot_body(b, acc_t):
            blk = idx_ref[i * R_PER + t, b]
            xrow = x_ref[blk, :]                      # 128-lane VMEM read
            brick = data_ref[t, b, :, :]              # [8, 128]
            return acc_t + jnp.sum(
                brick * xrow[None, :], axis=1, keepdims=True
            )

        acc_t = jax.lax.fori_loop(
            0, bsl, slot_body, jnp.zeros((8, 1), jnp.float32)
        )
        return acc.at[t, :].set(acc_t[:, 0])

    acc = jax.lax.fori_loop(
        0, R_PER, tile_body, jnp.zeros((R_PER, 8), jnp.float32)
    )
    o_ref[0, :] = acc.reshape(R_PER * 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def brick_spmv_pallas(data, idx, x, interpret: bool = False):
    """y = A·x over the flat brick layout (f32).

    ``data``: f32[T, B, 8, 128], ``idx``: i32[T, B], ``x``: f32[n]
    (n = NB·128).  T must divide by ``R_PER``.  Returns f32[T·8].
    """
    T, B = idx.shape
    n = x.shape[0]
    grid = (T // R_PER,)
    out = pl.pallas_call(
        _spmv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x table, whole
                pl.BlockSpec(
                    (R_PER, B, 8, 128),
                    lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, R_PER * 8), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((T // R_PER, R_PER * 8), jnp.float32),
        interpret=interpret,
    )(idx, x.reshape(n // 128, 128), data)
    return out.reshape(T * 8)


def _pricing_kernel(idx_ref, pi_ref, c_ref, data_ref, o_ref):
    """Fused pricing block: d = c − πᵀA over the TRANSPOSED brick layout
    (column tiles of 8 × row blocks of 128), one program = R_PER·8
    columns.  Same loop structure as the SpMV; the subtraction from c
    fuses in-kernel so d never round-trips through HBM separately."""
    i = pl.program_id(0)
    bsl = data_ref.shape[1]

    def tile_body(t, acc):
        def slot_body(b, acc_t):
            blk = idx_ref[i * R_PER + t, b]
            prow = pi_ref[blk, :]
            brick = data_ref[t, b, :, :]
            return acc_t + jnp.sum(
                brick * prow[None, :], axis=1, keepdims=True
            )

        acc_t = jax.lax.fori_loop(
            0, bsl, slot_body, jnp.zeros((8, 1), jnp.float32)
        )
        return acc.at[t, :].set(acc_t[:, 0])

    acc = jax.lax.fori_loop(
        0, R_PER, tile_body, jnp.zeros((R_PER, 8), jnp.float32)
    )
    o_ref[0, :] = c_ref[0, :] - acc.reshape(R_PER * 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def brick_pricing_pallas(cdata, cidx, pi, c, interpret: bool = False):
    """d = c − πᵀA fused over the transposed brick layout (f32).

    ``cdata``: f32[Tc, B, 8, 128] (column tiles × row blocks),
    ``cidx``: i32[Tc, B], ``pi``: f32[m], ``c``: f32[n] with n = Tc·8.
    """
    Tc, B = cidx.shape
    m = pi.shape[0]
    grid = (Tc // R_PER,)
    out = pl.pallas_call(
        _pricing_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # pi table, whole
                pl.BlockSpec(
                    (1, R_PER * 8), lambda i, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (R_PER, B, 8, 128),
                    lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, R_PER * 8), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((Tc // R_PER, R_PER * 8), jnp.float32),
        interpret=interpret,
    )(cidx, pi.reshape(m // 128, 128), c.reshape(Tc // R_PER, R_PER * 8), cdata)
    return out.reshape(Tc * 8)
