"""The two-phase bounded-variable revised simplex engine (device code).

Counterpart of reference ``src/algorithm/`` (SURVEY §2.6).
"""

from relp_tpu.simplex.driver import (
    GeneralFormResult,
    SimplexResult,
    solve_computational_form,
    solve_general_form,
)

__all__ = [
    "GeneralFormResult",
    "SimplexResult",
    "solve_computational_form",
    "solve_general_form",
]
