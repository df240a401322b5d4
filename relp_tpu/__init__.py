"""relp_tpu — a TPU-native linear programming framework.

A from-scratch rebuild of the capabilities of RELP (vandenheuvel/rust-lp,
reference mounted at /root/reference) designed TPU-first:

- the revised simplex method runs as a single jitted ``lax.while_loop`` on
  device (pricing = one fused matvec over the column pool, FTRAN = matvec
  against a maintained dense basis inverse, basis update = rank-1
  product-form update that maps onto the MXU),
- exact rational arithmetic (reference ``src/data/number_types/``) is replaced
  by float64 with tolerance-based pivoting, periodic refactorization and an
  optional CPU-side exact verifier (``relp_tpu.numerics``),
- lazy column generation (reference ``MatrixProvider``,
  ``src/algorithm/two_phase/matrix_provider/mod.rs:37-136``) becomes masked
  pricing over a column pool resident in HBM,
- scaling is via ``jax.sharding`` meshes: column blocks sharded for pricing,
  scenario batches vmapped/sharded for throughput (``relp_tpu.parallel``).

Layout:
    model/      problem representations (GeneralForm, elements, Solution)
    io/         MPS/SIF parsing (free + fixed format) and conversion
    presolve/   presolving rules + postsolve reconstruction
    providers/  column-oracle layer (standard-form builder, filters)
    models/     LP model families (networks: shortest path, max flow, ...)
    simplex/    the two-phase revised simplex engine (device code)
    ops/        device kernels: linalg/refactorization, matrix layouts
                (dense/ELL/hybrid/bricks), panel matvecs
    parallel/   device meshes, sharded pricing, batched solves
    utils/      config, logging, timers
"""

import os

import jax

# The solver carries f64 state (reference uses exact rationals; see
# SURVEY.md §2.1 "TPU plan"). Must be set before any JAX computation.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the solve core is one large while_loop whose
# first compile is expensive; shape-bucketed padding plus this cache makes
# repeat solves start instantly.
_cache_dir = os.environ.get("RELP_TPU_CACHE", os.path.expanduser("~/.cache/relp_tpu_xla"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - older jax without the option
    pass

# Platform override (e.g. RELP_TPU_PLATFORM=cpu for host-only debugging).
# Some environments pin `jax_platforms` ahead of the JAX_PLATFORMS env var,
# so expose an explicit knob that always wins.
_platform = os.environ.get("RELP_TPU_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)

from relp_tpu.model.elements import (  # noqa: E402
    ConstraintRelation,
    LinearProgramType,
    Objective,
    RangedConstraintRelation,
    VariableType,
)
from relp_tpu.model.solution import Solution  # noqa: E402
from relp_tpu.utils.config import SolverConfig  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "ConstraintRelation",
    "LinearProgramType",
    "Objective",
    "RangedConstraintRelation",
    "Solution",
    "SolverConfig",
    "VariableType",
    "__version__",
]
