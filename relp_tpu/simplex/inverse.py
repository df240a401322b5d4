"""Inverse-maintenance backends and the design rationale.

Counterpart of the reference's ``InverseMaintener`` abstraction and its two
backends (``inverse_maintenance/carry/``):

- ``BasisInverseRows`` (explicit sparse B⁻¹, product-form updates,
  basis_inverse_rows.rs:20-155)  →  the engine's default: a *dense* explicit
  B⁻¹ updated by one rank-1 outer product per pivot
  (:func:`relp_tpu.ops.linalg.rank_one_basis_update`).  On TPU this is the
  right default: FTRAN/BTRAN become single matvecs (one fused device op)
  instead of sparse triangular solves.

- ``LUDecomposition`` + eta files + Forrest-Tomlin-style spike updates
  (lower_upper/mod.rs:35-391)  →  intentionally *not* mirrored in the hot
  loop.  An eta/PFI scheme trades the O(m²) rank-1 update for O(K·m) work
  applied as K *sequential* rank-1 steps per FTRAN; the TPU iteration is
  latency-bound, so K sequential dependent steps cost more wall-clock than
  one fused O(m²) update on the VPU/MXU.  The LU idea survives where it
  pays: *refactorization* uses an f32 XLA LU seed refined by Newton-Schulz
  matmuls (:func:`relp_tpu.ops.linalg.robust_inverse`), generalizing the
  reference's refactor-after-10-updates policy (lower_upper/mod.rs:199-202).

The :class:`EtaStack` below implements the reference's eta-file algebra
(eta_file.rs:14-134) as a jittable scan for completeness and tests — usable
for BTRAN-style transposed application as well — but the production engine
keeps the dense explicit inverse.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class EtaStack(NamedTuple):
    """A bounded stack of product-form eta updates  E_k = I − (u_k − e_{r_k}) e_{r_k}ᵀ / u_k[r_k].

    ``us[k]`` is the FTRAN vector of pivot k, ``rs[k]`` the leaving row,
    ``count`` how many entries are live.  Applying the stack to a vector
    reproduces what the dense engine folds into B⁻¹ eagerly.
    """

    us: jax.Array     # (K, m)
    rs: jax.Array     # (K,) i32
    count: jax.Array  # i32

    @staticmethod
    def empty(capacity: int, m: int, dtype=jnp.float64) -> "EtaStack":
        return EtaStack(
            us=jnp.zeros((capacity, m), dtype),
            rs=jnp.zeros(capacity, jnp.int32),
            count=jnp.int32(0),
        )

    def push(self, u: jax.Array, r) -> "EtaStack":
        return EtaStack(
            us=self.us.at[self.count].set(u),
            rs=self.rs.at[self.count].set(r),
            count=self.count + 1,
        )

    def apply(self, v: jax.Array) -> jax.Array:
        """E_{count} … E_1 v  (forward/FTRAN application)."""

        def body(i, v):
            u = self.us[i]
            r = self.rs[i]
            p = u[r]
            p = jnp.where(jnp.abs(p) > 0, p, 1.0)
            vr = v[r] / p
            v = v - u * vr
            v = v.at[r].set(vr)
            return v

        return lax.fori_loop(0, self.count, body, v)

    def apply_transposed(self, v: jax.Array) -> jax.Array:
        """vᵀ E_{count} … E_1  applied right-to-left (BTRAN application).

        With E = I − (u − e_r) e_rᵀ / p (p = u_r), only component r of vᵀE
        changes:  (vᵀE)_r = v_r − (v·u − v_r) / p.
        """

        def body(k, v):
            i = self.count - 1 - k
            u = self.us[i]
            r = self.rs[i]
            p = u[r]
            p = jnp.where(jnp.abs(p) > 0, p, 1.0)
            new_r = v[r] - (jnp.dot(v, u) - v[r]) / p
            return v.at[r].set(new_r)

        return lax.fori_loop(0, self.count, body, v)
