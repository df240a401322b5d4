"""LP-based branch-and-bound for mixed-integer programs.

The reference defines the per-variable feasibility hook for this
(``matrix_provider/variable.rs:14-41``) but leaves branch-and-bound itself
on the unchecked roadmap (README.md "Integer variables through a
branch-and-bound algorithm").  This module goes the rest of the way, and in
the TPU-native idiom: every node re-solve is a *warm* device solve — the
dual simplex from the parent's basis (bounds changed, costs untouched ⇒
parent basis stays dual feasible), which is exactly the workload
:func:`relp_tpu.simplex.reoptimize.reoptimize_with_bounds` provides — so a
tree search runs as a stream of short, chunk-bounded device calls against
one resident problem (single padded shape ⇒ single compiled program).

Search: best-first on the LP bound; branching variable: most fractional.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from relp_tpu.model.elements import LinearProgramType, Objective, VariableType
from relp_tpu.model.general_form import GeneralForm
from relp_tpu.providers.variable import FeasibilityLogic
from relp_tpu.simplex import status as st
from relp_tpu.simplex.core import solve_core
from relp_tpu.simplex.reoptimize import reoptimize_with_bounds
from relp_tpu.utils.config import DEFAULT_CONFIG, SolverConfig

INF = float("inf")


@dataclass
class MipResult:
    kind: LinearProgramType
    objective: Optional[float] = None
    values: Optional[dict] = None           # name -> value (integral snapped)
    nodes: int = 0
    lp_iterations: int = 0
    best_bound: Optional[float] = None      # proven bound on the optimum

    @property
    def is_optimal(self) -> bool:
        return self.kind is LinearProgramType.FINITE_OPTIMUM


def solve_mip(
    general: GeneralForm,
    config: SolverConfig = DEFAULT_CONFIG,
    max_nodes: int = 2000,
    int_tol: float = 1e-6,
    gap_tol: float = 1e-9,
) -> MipResult:
    """Branch-and-bound on the INTEGER-typed variables of ``general``.

    Scaling is disabled (equilibration would destroy integrality of the
    branching bounds) and presolve is skipped (its continuous reductions —
    slack folds, midpoint fixings — are not valid for integer columns).
    """
    import dataclasses as _dc

    from relp_tpu.model.computational_form import build_computational_form
    from relp_tpu.simplex.driver import _bucket, _round_up

    config = _dc.replace(config, scale=False, presolve=False)

    logic = [
        FeasibilityLogic(v.variable_type, int_tol) for v in general.variables
    ]
    integer_mask_struct = np.array(
        [v.variable_type is VariableType.INTEGER for v in general.variables]
    )

    cf = build_computational_form(general, scale=False)
    m, n = cf.m, cf.n
    if m == 0 or n == 0 or not integer_mask_struct.any():
        # pure LP (or trivial): delegate
        from relp_tpu.simplex.driver import solve_general_form

        res = solve_general_form(general, config)
        values = (
            {k: v for k, v in res.solution.solution_values} if res.solution else None
        )
        return MipResult(
            kind=res.kind,
            objective=res.solution.objective_value if res.solution else None,
            values=values,
            nodes=1,
        )

    if config.bucket_shapes:
        m_pad = _bucket(m, config.row_align * 8)
        n_pad = _bucket(n, config.col_align * 2)
    else:
        m_pad = _round_up(m, config.row_align)
        n_pad = _round_up(n, config.col_align)
    import scipy.sparse as sp

    A = np.zeros((m_pad, n_pad))
    A[:m, :n] = sp.csc_matrix(cf.A).toarray()
    b = np.zeros(m_pad)
    b[:m] = cf.b
    c = np.zeros(n_pad)
    c[:n] = cf.c
    lb0 = np.zeros(n_pad)
    ub0 = np.zeros(n_pad)
    lb0[:n] = cf.lb
    ub0[:n] = cf.ub

    integer_mask = np.zeros(n_pad, bool)
    integer_mask[: len(integer_mask_struct)] = integer_mask_struct

    sense = -1.0 if cf.maximize else 1.0  # internal obj is minimization
    max_iter = config.resolve_max_iter(m_pad, n_pad)

    root = solve_core(A, b, c, lb0, ub0, cfg=config, max_iter=max_iter)
    lp_iters = int(root.it)
    nodes = 1
    if int(root.status) == st.INFEASIBLE:
        return MipResult(kind=LinearProgramType.INFEASIBLE, nodes=nodes)
    if int(root.status) == st.UNBOUNDED:
        return MipResult(kind=LinearProgramType.UNBOUNDED, nodes=nodes)
    if int(root.status) != st.OPTIMAL:
        return MipResult(kind=LinearProgramType.INFEASIBLE, nodes=nodes)

    best_obj = INF  # internal (minimization) objective
    best_x: Optional[np.ndarray] = None

    # best-first heap: (lp bound, tiebreak, lb, ub, prior SolveOutput)
    tick = 0
    heap: List[Tuple[float, int, np.ndarray, np.ndarray, object]] = []

    def fractional(x):
        xi = x[:n][integer_mask[:n]]
        idxs = np.flatnonzero(integer_mask[:n])
        fr = np.abs(xi - np.round(xi))
        bad = fr > int_tol * (1 + np.abs(xi))
        return idxs[bad], fr[bad]

    def push(bound, lb, ub, prior):
        nonlocal tick
        tick += 1
        heapq.heappush(heap, (bound, tick, lb, ub, prior))

    push(float(root.obj), lb0, ub0, root)

    while heap and nodes < max_nodes:
        bound, _, lb_nd, ub_nd, prior = heapq.heappop(heap)
        if bound >= best_obj - gap_tol:
            continue  # pruned by bound
        x = np.asarray(prior.x)
        bad, fr = fractional(x)
        if len(bad) == 0:
            if float(prior.obj) < best_obj:
                best_obj = float(prior.obj)
                best_x = x.copy()
            continue
        # branch on the most fractional variable
        j = int(bad[np.argmax(np.minimum(fr, 1 - fr))])
        v = x[j]
        for lo_add, hi_add in (
            (None, math.floor(v)),  # x_j <= floor(v)
            (math.ceil(v), None),   # x_j >= ceil(v)
        ):
            lb2, ub2 = lb_nd.copy(), ub_nd.copy()
            if hi_add is not None:
                ub2[j] = min(ub2[j], hi_add)
            if lo_add is not None:
                lb2[j] = max(lb2[j], lo_add)
            if lb2[j] > ub2[j]:
                continue
            out = reoptimize_with_bounds(
                A, b, c, lb2, ub2, prior, config=config, max_iter=max_iter
            )
            nodes += 1
            lp_iters += int(out.it)
            if int(out.status) != st.OPTIMAL:
                continue  # infeasible child (or numerical: drop the node)
            child_bound = float(out.obj)
            if child_bound >= best_obj - gap_tol:
                continue
            xc = np.asarray(out.x)
            bad_c, _ = fractional(xc)
            if len(bad_c) == 0:
                if child_bound < best_obj:
                    best_obj = child_bound
                    best_x = xc.copy()
            else:
                push(child_bound, lb2, ub2, out)

    if best_x is None:
        return MipResult(
            kind=LinearProgramType.INFEASIBLE, nodes=nodes, lp_iterations=lp_iters
        )

    # remaining open bound (for gap reporting)
    open_bound = min([h[0] for h in heap], default=best_obj)
    values = {}
    for jj, var in enumerate(general.variables):
        vv = float(best_x[jj])
        values[var.name] = logic[jj].closest_feasible(vv) if logic[jj].is_feasible(
            vv
        ) else vv
    # objective in the problem's own sense, from integral-snapped values
    orig_cost = np.array([v.cost for v in general.variables])
    obj = float(
        orig_cost @ np.array([values[v.name] for v in general.variables])
    ) + cf.fixed_cost
    # proven bound on the optimum, reported in the problem's own sense
    internal_bound = min(best_obj, open_bound)
    bound_orig = (
        -internal_bound if cf.maximize else internal_bound
    ) + cf.fixed_cost
    return MipResult(
        kind=LinearProgramType.FINITE_OPTIMUM,
        objective=obj,
        values=values,
        nodes=nodes,
        lp_iterations=lp_iters,
        best_bound=bound_orig,
    )
