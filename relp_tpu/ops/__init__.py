"""Device kernels: refactorization, basis updates, pricing primitives."""

from relp_tpu.ops.linalg import gauss_jordan_inverse

__all__ = ["gauss_jordan_inverse"]
