"""Column-sharded simplex solve (the pricing-parallel path).

The hot loop of the reference is the full pricing scan
(pivot_rule.rs:113-123: per-iteration O(n) sparse dots against −π).  Here
pricing is already one fused matvec in :func:`relp_tpu.simplex.core.solve_core`;
this module runs that same program with the column pool **sharded over the
'cols' mesh axis**: each device prices its local block of ``A`` and XLA/GSPMD
inserts the cross-chip argmax/gather collectives automatically (the
scaling-book recipe: pick a mesh, annotate shardings, let XLA place
collectives).  The basis inverse, right-hand side and row-indexed state stay
replicated (m ≪ n for Netlib-like LPs — SURVEY §2.8 "basis inverse
placement").
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from relp_tpu.simplex.core import solve_core
from relp_tpu.utils.config import SolverConfig


def shard_inputs(mesh: Mesh, A, b, c, lb, ub):
    """Place the problem arrays: A/c/lb/ub column-sharded, b replicated.

    ``A`` may be a raw dense array (columns = axis 1), an
    :class:`~relp_tpu.ops.amatrix.EllMatrix` (columns = axis 0 of its
    data/rows leaves — each device holds its column block's nonzeros), or a
    :class:`~relp_tpu.ops.amatrix.HybridMatrix` (ELL part column-sharded;
    the small dense spill block and its index maps replicated)."""
    from relp_tpu.ops.amatrix import EllMatrix, HybridMatrix

    vec_sharding = NamedSharding(mesh, P("cols"))
    rep = NamedSharding(mesh, P())
    if isinstance(A, HybridMatrix):
        ell = shard_inputs(mesh, A.ell, b, c, lb, ub)[0]
        A = HybridMatrix(
            ell,
            jax.device_put(np.asarray(A.D), rep),
            jax.device_put(np.asarray(A.spill_idx), rep),
            jax.device_put(np.asarray(A.spill_pos), vec_sharding),
            None if A.D32 is None else jax.device_put(np.asarray(A.D32), rep),
        )
        b = jax.device_put(np.asarray(b, np.float64), rep)
        c = jax.device_put(np.asarray(c, np.float64), vec_sharding)
        lb = jax.device_put(np.asarray(lb, np.float64), vec_sharding)
        ub = jax.device_put(np.asarray(ub, np.float64), vec_sharding)
        return A, b, c, lb, ub
    if isinstance(A, EllMatrix):
        ell_sharding = NamedSharding(mesh, P("cols", None))
        A = EllMatrix(
            jax.device_put(np.asarray(A.data), ell_sharding),
            jax.device_put(np.asarray(A.rows), ell_sharding),
            A.m,
            None
            if A.data32 is None
            else jax.device_put(np.asarray(A.data32), ell_sharding),
            # row-major twin: replicated (m x Kr ~ nnz, small); the x
            # gather then all-gathers the column-sharded operand
            None if A.rdata is None else jax.device_put(np.asarray(A.rdata), rep),
            None if A.rcols is None else jax.device_put(np.asarray(A.rcols), rep),
        )
    else:
        col_sharding = NamedSharding(mesh, P(None, "cols"))
        A = jax.device_put(np.asarray(A, np.float64), col_sharding)
    b = jax.device_put(np.asarray(b, np.float64), rep)
    c = jax.device_put(np.asarray(c, np.float64), vec_sharding)
    lb = jax.device_put(np.asarray(lb, np.float64), vec_sharding)
    ub = jax.device_put(np.asarray(ub, np.float64), vec_sharding)
    return A, b, c, lb, ub


def maybe_shard(mesh_cols: int, n_pad: int, A, b, c, lb, ub):
    """Resolve a ``config.mesh_cols`` request into a device placement.

    Returns ``(A, b, c, lb, ub, sharded)`` — the single sharding recipe
    used by both the simplex and the first-order driver paths.  Skips
    (``sharded=False``, with a log line) when the padded column count is
    not divisible by the device count or not enough devices exist.
    """
    from relp_tpu.parallel.mesh import make_solver_mesh
    from relp_tpu.utils.metrics import logger

    k_dev = mesh_cols if mesh_cols > 0 else len(jax.devices())
    if k_dev in (0, 1):
        return A, b, c, lb, ub, False
    if n_pad % k_dev != 0 or k_dev > len(jax.devices()):
        logger.warning(
            "mesh_cols=%d skipped: n_pad=%d %% %d != 0 or only %d devices",
            mesh_cols, n_pad, k_dev, len(jax.devices()),
        )
        return A, b, c, lb, ub, False
    mesh = make_solver_mesh(batch=1, cols=k_dev, devices=jax.devices()[:k_dev])
    return (*shard_inputs(mesh, A, b, c, lb, ub), True)


def solve_sharded(mesh: Mesh, A, b, c, lb, ub, cfg: SolverConfig, max_iter: int):
    """Run the standard solve core with column-sharded inputs.

    The device count along 'cols' must divide the (padded) column count.
    """
    n = A.shape[1] if hasattr(A, "m") else np.asarray(A).shape[1]
    n_shards = mesh.shape["cols"]
    if n % n_shards != 0:
        raise ValueError(f"column count {n} not divisible by 'cols' axis size {n_shards}")
    A, b, c, lb, ub = shard_inputs(mesh, A, b, c, lb, ub)
    # input shardings propagate through the jitted while_loop via GSPMD;
    # no mesh context needed
    return solve_core(A, b, c, lb, ub, cfg=cfg, max_iter=max_iter)
