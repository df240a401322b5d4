"""Bounded-variable dual simplex (device core).

Goes BEYOND the reference, whose roadmap leaves "Dual algorithm" unchecked
(README.md:15-28): given a *dual-feasible* basis (e.g. the optimal basis of
a related problem whose bounds were since tightened — branch-and-bound's
re-solve pattern), iterate on primal feasibility while maintaining dual
feasibility.  Same TPU shape as the primal core: one ``lax.while_loop``,
straight-line selects, dense maintained inverse with rank-1 updates and
periodic refactorization; the dual update reuses the identity
``π' = π + (d_q/u_r)·B⁻¹[r,:]``.

Per iteration:
  1. leaving row r: largest bound violation of xB (OPTIMAL when none),
  2. pivot row α = B⁻¹[r]·A, entering q by the dual ratio test
     min |d_j/α_j| over sign-compatible nonbasic columns (primal
     INFEASIBLE when none — the dual is unbounded),
  3. pivot: FTRAN u = B⁻¹a_q, update xB/B⁻¹/π/statuses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from relp_tpu.ops.linalg import gauss_jordan_inverse, robust_inverse
from relp_tpu.simplex import status as st
from relp_tpu.simplex.core import SolveOutput, _nonbasic_values
from relp_tpu.utils.config import SolverConfig

INF = jnp.inf


@functools.partial(jax.jit, static_argnames=("cfg",))
def solve_core_dual(
    A, b, c, lb, ub, basis0, vstat0, cfg: SolverConfig, max_iter: int,
    art_sign0=None,
) -> SolveOutput:
    """Dual simplex from a dual-feasible warm basis (padded arrays as in
    ``solve_core``).  If the start is not dual feasible the method may stop
    at a dual-infeasible point — callers should fall back to the primal
    core on a NUMERICAL/ITERATION_LIMIT outcome.

    ``art_sign0`` carries the artificial column signs of a prior primal
    solve (``SolveOutput.art_sign``): the primal engine's artificial columns
    are *signed* ±e_i, and a basis containing a sign-−1 artificial (e.g. on
    a redundant row) must be refactorized with that sign or B is wrong on
    those rows.
    """
    m, n = A.shape
    f = A.dtype
    art_sign = (
        jnp.ones(m, f) if art_sign0 is None else art_sign0.astype(f)
    )

    lb_tot = jnp.concatenate([lb, jnp.zeros(m, f)])
    ub_tot = jnp.concatenate([ub, jnp.zeros(m, f)])

    from typing import NamedTuple

    class DState(NamedTuple):
        basis: jax.Array
        vstat: jax.Array
        xB: jax.Array
        Binv: jax.Array
        pi: jax.Array
        status: jax.Array
        it: jax.Array
        since_refactor: jax.Array
        repairs: jax.Array

    vstat_full = jnp.concatenate(
        [vstat0.astype(jnp.int32), jnp.full(m, st.NB_LOWER, jnp.int32)]
    )
    state0 = DState(
        basis=basis0.astype(jnp.int32),
        vstat=vstat_full,
        xB=jnp.zeros(m, f),
        Binv=jnp.eye(m, dtype=f),
        pi=jnp.zeros(m, f),
        status=jnp.int32(st.RUNNING),
        it=jnp.int32(0),
        since_refactor=jnp.int32(cfg.refactor_period),  # refactor first
        repairs=jnp.int32(0),
    )

    def refactor(s: DState) -> DState:
        is_art = s.basis >= n
        struct_cols = jnp.take(A, jnp.clip(s.basis, 0, n - 1), axis=1)
        k = jnp.clip(s.basis - n, 0, m - 1)
        art_cols = (jnp.arange(m)[:, None] == k[None, :]) * art_sign[k][None, :]
        B = jnp.where(is_art[None, :], art_cols, struct_cols)
        if cfg.newton_refactor:
            Binv, min_piv = robust_inverse(B)
        else:
            Binv, min_piv = gauss_jordan_inverse(B)
        nb = _nonbasic_values(s.vstat, lb_tot, ub_tot)
        nb = jnp.where(s.vstat == st.BASIC, 0.0, nb)
        r = b - A @ nb[:n]
        xB = Binv @ r
        cB = jnp.where(is_art, 0.0, jnp.take(c, jnp.clip(s.basis, 0, n - 1)))
        pi = cB @ Binv
        singular = min_piv < cfg.singular_tol
        return s._replace(
            Binv=Binv,
            xB=xB,
            pi=pi,
            since_refactor=jnp.int32(0),
            status=jnp.where(singular, st.NUMERICAL, s.status).astype(jnp.int32),
        )

    def body(s: DState) -> DState:
        s = lax.cond(s.since_refactor >= cfg.refactor_period, refactor, lambda s: s, s)
        broken = ~jnp.isfinite(jnp.sum(s.xB) + jnp.sum(s.pi))
        fresh = s.since_refactor == 0

        k = s.basis
        lbk = jnp.take(lb_tot, k)
        ubk = jnp.take(ub_tot, k)
        below = lbk - s.xB
        above = s.xB - ubk
        viol = jnp.maximum(jnp.maximum(below, above), 0.0)
        r = jnp.argmax(viol).astype(jnp.int32)
        primal_feasible = viol[r] <= cfg.eps_feas

        # pivot row and reduced costs
        rho = s.Binv[r]
        alpha = rho @ A
        d = c - s.pi @ A
        vs = s.vstat[:n]

        leaving_below = below[r] > above[r]  # xB_r under its lower bound
        # sign-compatible entering candidates keep dual feasibility:
        #   below-lower: at-lower with α<0, at-upper with α>0, free either
        # (mirrored when above-upper; fold by flipping α's sign)
        alpha_eff = jnp.where(leaving_below, alpha, -alpha)
        at_l = (vs == st.NB_LOWER) | (vs == st.NB_FREE)
        at_u = (vs == st.NB_UPPER) | (vs == st.NB_FREE)
        cand = ((at_l & (alpha_eff < -cfg.eps_pivot)) | (at_u & (alpha_eff > cfg.eps_pivot)))
        cand = cand & (lb < ub) & (vs != st.BASIC)
        ratio = jnp.where(cand, jnp.abs(d) / jnp.maximum(jnp.abs(alpha), 1e-300), INF)
        q = jnp.argmin(ratio).astype(jnp.int32)
        has_entering = jnp.isfinite(ratio[q])

        # pivot quantities
        a_q = jnp.take(A, q, axis=1)
        u = s.Binv @ a_q
        p = u[r]
        p_safe = jnp.where(jnp.abs(p) > 1e-300, p, 1.0)
        bound_r = jnp.where(leaving_below, lbk[r], ubk[r])
        theta_p = (s.xB[r] - bound_r) / p_safe
        start_val = jnp.where(
            vs[q] == st.NB_UPPER, ub[q], jnp.where(vs[q] == st.NB_LOWER, lb[q], 0.0)
        )

        do_pivot = (~primal_feasible) & has_entering & (~broken)
        xB_new = s.xB - theta_p * u
        xB_new = xB_new.at[r].set(start_val + theta_p)
        w_row = s.Binv[r] / p_safe
        Binv_new = (s.Binv - u[:, None] * w_row[None, :]).at[r].set(w_row)
        pi_new = s.pi + (d[q] / p_safe) * s.Binv[r]

        kr = k[r]
        leave_stat = jnp.where(leaving_below, st.NB_LOWER, st.NB_UPPER)
        leave_stat = jnp.where(
            jnp.take(lb_tot, kr) == jnp.take(ub_tot, kr), st.NB_FIXED, leave_stat
        )
        vstat_new = (
            s.vstat.at[kr].set(leave_stat.astype(jnp.int32)).at[q].set(st.BASIC)
        )

        status_new = jnp.where(
            primal_feasible & fresh & ~broken,
            st.OPTIMAL,
            jnp.where(
                (~primal_feasible) & (~has_entering) & fresh & ~broken,
                st.INFEASIBLE,
                s.status,
            ),
        )
        wants_terminal = primal_feasible | ((~primal_feasible) & (~has_entering))
        force_refac = (wants_terminal & ~fresh) | broken

        return DState(
            basis=jnp.where(do_pivot, s.basis.at[r].set(q), s.basis),
            vstat=jnp.where(do_pivot, vstat_new, s.vstat),
            xB=jnp.where(do_pivot, xB_new, s.xB),
            Binv=jnp.where(do_pivot, Binv_new, s.Binv),
            pi=jnp.where(do_pivot, pi_new, s.pi),
            status=status_new.astype(jnp.int32),
            it=s.it + 1,
            since_refactor=jnp.where(
                force_refac,
                cfg.refactor_period,
                s.since_refactor + do_pivot.astype(jnp.int32),
            ).astype(jnp.int32),
            repairs=s.repairs,
        )

    def cond(s: DState):
        return (s.status == st.RUNNING) & (s.it < max_iter)

    final = lax.while_loop(cond, body, state0)
    final = final._replace(
        status=jnp.where(
            final.status == st.RUNNING, st.ITERATION_LIMIT, final.status
        ).astype(jnp.int32)
    )
    final = refactor(final)

    nb = _nonbasic_values(final.vstat, lb_tot, ub_tot)
    nb = jnp.where(final.vstat == st.BASIC, 0.0, nb)
    x_pad = jnp.zeros(n + 1, f).at[:n].set(nb[:n])
    target = jnp.where(final.basis < n, final.basis, n)
    x_pad = x_pad.at[target].set(jnp.where(final.basis < n, final.xB, 0.0))
    x = x_pad[:n]

    art_inf = jnp.sum(jnp.where(final.basis >= n, jnp.abs(final.xB), 0.0))
    return SolveOutput(
        x=x,
        status=final.status,
        it=final.it,
        phase=jnp.int32(2),
        basis=final.basis,
        vstat=final.vstat,
        art_inf=art_inf,
        pi=final.pi,
        obj=c @ x,
        art_sign=art_sign,
    )
