"""Jitted basic-feasible-solution invariant checker.

Counterpart of the reference's ``is_in_basic_feasible_solution_state``
debug assertion, executed every iteration in debug builds
(tableau/mod.rs:253-289: B·B⁻¹ regenerates eᵢ column-by-column, reduced
costs vanish on the basis, b ≥ 0).  Here it is a jitted function callable
from tests or periodically from monitoring code — the float-world analogue
asserts residual norms under tolerances instead of exact equality.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from relp_tpu.simplex import status as st


class StateCheck(NamedTuple):
    inverse_residual: jax.Array   # max |B @ Binv - I|
    bound_violation: jax.Array    # max violation of basic variable bounds
    basis_reduced_cost: jax.Array # max |reduced cost| over basic columns
    row_residual: jax.Array       # max |A x - b|

    def ok(self, tol: float = 1e-6) -> bool:
        return bool(
            (self.inverse_residual < tol)
            & (self.bound_violation < tol)
            & (self.basis_reduced_cost < tol)
            & (self.row_residual < tol)
        )


@jax.jit
def check_state(A, b, c, lb, ub, basis, vstat, xB, Binv, art_sign) -> StateCheck:
    from relp_tpu.ops.amatrix import as_amatrix

    A = as_amatrix(A)
    m, n = A.shape
    is_art = basis >= n
    struct_cols = A.cols_matrix(jnp.clip(basis, 0, n - 1))
    k = jnp.clip(basis - n, 0, m - 1)
    art_cols = (jnp.arange(m)[:, None] == k[None, :]) * art_sign[k][None, :]
    B = jnp.where(is_art[None, :], art_cols, struct_cols)

    inverse_residual = jnp.max(jnp.abs(B @ Binv - jnp.eye(m, dtype=A.dtype)))

    lb_tot = jnp.concatenate([lb, jnp.zeros(m, A.dtype)])
    ub_tot = jnp.concatenate([ub, jnp.full(m, jnp.inf, A.dtype)])
    lbk = jnp.take(lb_tot, basis)
    ubk = jnp.take(ub_tot, basis)
    bound_violation = jnp.max(
        jnp.maximum(jnp.maximum(lbk - xB, xB - ubk), 0.0)
    )

    cB = jnp.where(is_art, 0.0, jnp.take(c, jnp.clip(basis, 0, n - 1)))
    pi = cB @ Binv
    d = c - A.rmatvec(pi)
    basic_mask = vstat[:n] == st.BASIC
    basis_reduced_cost = jnp.max(jnp.where(basic_mask, jnp.abs(d), 0.0))

    at_lower = (vstat[:n] == st.NB_LOWER) | (vstat[:n] == st.NB_FIXED)
    at_upper = vstat[:n] == st.NB_UPPER
    x = jnp.where(at_lower, lb, jnp.where(at_upper, ub, 0.0))
    x = jnp.where(basic_mask, 0.0, x)
    x_pad = jnp.zeros(n + 1, A.dtype).at[:n].set(x)
    target = jnp.where(basis < n, basis, n)
    x_pad = x_pad.at[target].set(jnp.where(basis < n, xB, 0.0))
    # basic artificials (phase 1 / redundant rows) contribute ±xB on their row
    art_contrib = jnp.zeros(m, A.dtype).at[k].add(
        jnp.where(is_art, jnp.take(art_sign, k) * xB, 0.0)
    )
    row_residual = jnp.max(jnp.abs(A.matvec(x_pad[:n]) + art_contrib - b))

    return StateCheck(inverse_residual, bound_violation, basis_reduced_cost, row_residual)
