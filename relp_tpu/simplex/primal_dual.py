"""Primal-dual (interior-point style) method — placeholder.

The reference reserves an (empty) module for this future algorithm
(``src/algorithm/primal_dual/mod.rs:1-3``); mirrored here.  Note an IPM is
a natural fit for TPU (normal-equation solves are dense matmuls); a strong
candidate for a future round.
"""

raise_not_implemented = NotImplementedError(
    "primal-dual method not implemented (placeholder, as in the reference)"
)
