"""Reoptimization: re-solve a modified problem from a previous basis.

The branch-and-bound / scenario-update pattern: after solving an LP, change
variable bounds (the optimal basis stays *dual* feasible because costs are
untouched) and re-solve with the dual simplex in a handful of iterations;
falls back to a warm primal solve if the dual method fails, and to a cold
primal solve as the last resort.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from relp_tpu.simplex import status as st
from relp_tpu.simplex.core import SolveOutput, solve_core
from relp_tpu.simplex.dual import solve_core_dual
from relp_tpu.utils.config import DEFAULT_CONFIG, SolverConfig


def reoptimize_with_bounds(
    A,
    b,
    c,
    new_lb,
    new_ub,
    prior: SolveOutput,
    config: SolverConfig = DEFAULT_CONFIG,
    max_iter: Optional[int] = None,
) -> SolveOutput:
    """Re-solve ``min c@x, A@x=b, new_lb<=x<=new_ub`` starting from the
    basis of ``prior`` (a SolveOutput for the same padded shapes)."""
    m, n = np.asarray(A).shape
    if max_iter is None:
        max_iter = config.resolve_max_iter(m, n)
    basis0 = np.asarray(prior.basis, np.int32)
    vstat0 = np.asarray(prior.vstat, np.int32)[:n]
    # nonbasic statuses must remain consistent with the new bounds
    vstat0 = _repair_statuses(vstat0, new_lb, new_ub)

    art_sign0 = np.asarray(prior.art_sign, np.float64)

    out = solve_core_dual(
        A, b, c, new_lb, new_ub, basis0, vstat0, cfg=config, max_iter=max_iter,
        art_sign0=art_sign0,
    )
    if int(out.status) == st.OPTIMAL:
        return out
    # dual failed (e.g. start was not dual feasible): warm primal
    out = solve_core(
        A, b, c, new_lb, new_ub, cfg=config, max_iter=max_iter,
        basis0=basis0, vstat0=vstat0, art_sign0=art_sign0,
    )
    if int(out.status) in (st.OPTIMAL, st.UNBOUNDED, st.INFEASIBLE):
        return out
    # cold fallback
    return solve_core(A, b, c, new_lb, new_ub, cfg=config, max_iter=max_iter)


def _repair_statuses(vstat, lb, ub):
    vstat = vstat.copy()
    nb_lower = vstat == st.NB_LOWER
    nb_upper = vstat == st.NB_UPPER
    fixed = lb == ub
    vstat = np.where(fixed & (vstat != st.BASIC), st.NB_FIXED, vstat)
    vstat = np.where(nb_lower & ~np.isfinite(lb), st.NB_UPPER, vstat)
    vstat = np.where(
        (vstat == st.NB_UPPER) & ~np.isfinite(ub),
        np.where(np.isfinite(lb), st.NB_LOWER, st.NB_FREE),
        vstat,
    )
    return vstat.astype(np.int32)
