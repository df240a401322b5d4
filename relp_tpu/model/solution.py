"""Named solution container.

Counterpart of reference ``src/data/linear_program/solution.rs:15-21`` with the
fuzzy comparator ``is_probably_equal_to`` (solution.rs:47-78) used for
degenerate alternative optima in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple


@dataclass
class Solution:
    objective_value: float
    solution_values: List[Tuple[str, float]] = field(default_factory=list)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.solution_values)

    def value_of(self, name: str) -> float:
        for n, v in self.solution_values:
            if n == name:
                return v
        raise KeyError(name)

    def is_probably_equal_to(self, other: "Solution", tol: float = 1e-6) -> bool:
        """Fuzzy equality: objectives match within ``tol`` (relative), variable
        values may differ (degenerate problems have multiple optimal bases)."""
        a, b = self.objective_value, other.objective_value
        scale = max(1.0, abs(a), abs(b))
        return abs(a - b) <= tol * scale

    def __repr__(self) -> str:  # compact, solver-log friendly
        head = ", ".join(f"{n}={v:.6g}" for n, v in self.solution_values[:8])
        more = "" if len(self.solution_values) <= 8 else f", … ({len(self.solution_values)} vars)"
        return f"Solution(obj={self.objective_value:.10g}; {head}{more})"
