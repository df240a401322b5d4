"""Basis checkpoint / resume.

The reference has no checkpointing, but reifies everything warm-start needs:
a basis plus an ``InverseMaintener`` rebuildable via ``IM::from_basis``
(carry/mod.rs:428-463; SURVEY §5 "checkpoint/resume").  Here a checkpoint is
exactly that state — (basis indices, variable statuses, iteration count) —
a few kilobytes saved as ``.npz``; the basis inverse is refactorized on
load by the warm-start path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Union

import numpy as np


@dataclass
class BasisCheckpoint:
    basis: np.ndarray   # i32[m_padded] (may reference artificial columns)
    vstat: np.ndarray   # i32[n_padded + m_padded]
    n_padded: int
    iterations: int = 0

    def save(self, path: Union[str, os.PathLike]) -> None:
        np.savez_compressed(
            path,
            basis=self.basis.astype(np.int32),
            vstat=self.vstat.astype(np.int32),
            n_padded=np.int64(self.n_padded),
            iterations=np.int64(self.iterations),
        )

    @staticmethod
    def load(path: Union[str, os.PathLike]) -> "BasisCheckpoint":
        with np.load(path) as z:
            return BasisCheckpoint(
                basis=z["basis"],
                vstat=z["vstat"],
                n_padded=int(z["n_padded"]),
                iterations=int(z["iterations"]),
            )

    @staticmethod
    def from_solve_output(out, n_padded: int) -> "BasisCheckpoint":
        return BasisCheckpoint(
            basis=np.asarray(out.basis),
            vstat=np.asarray(out.vstat),
            n_padded=n_padded,
            iterations=int(out.it),
        )

    def warm_start_args(self):
        """(basis0, vstat0) for ``solve_core`` on the same padded shapes."""
        return self.basis.astype(np.int32), self.vstat[: self.n_padded].astype(np.int32)
