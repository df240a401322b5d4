"""Top-level convenience API.

``solve(path)`` is the one-call equivalent of the reference CLI pipeline
(src/bin/main.rs:24-64): import → GeneralForm → presolve/standardize →
two-phase simplex on device → full named solution.
"""

from __future__ import annotations

import os
from typing import Union

from relp_tpu.io import import_lp
from relp_tpu.simplex.driver import GeneralFormResult, solve_general_form
from relp_tpu.utils.config import DEFAULT_CONFIG, SolverConfig


def solve(path: Union[str, os.PathLike], config: SolverConfig = DEFAULT_CONFIG) -> GeneralFormResult:
    general = import_lp(path)
    return solve_general_form(general, config)


def ranging_of(result: GeneralFormResult):
    """Sensitivity ranging for a finished :func:`solve` result.

    Returns :class:`relp_tpu.analysis.RangingResult` (cost and rhs
    intervals over which the optimal basis stays valid, with reduced
    costs and dual slopes).  Raises ValueError when the result carries no
    vertex basis (presolved away, non-optimal, or a first-order solve
    without crossover).

    Note: like the CLI, ranging is relative to the PRESOLVED model the
    device solved — presolve may have substituted fixed variables into b
    and tightened bounds, so rhs values/ranges can differ from the
    original file.  Solve with ``SolverConfig(presolve=False)`` to range
    the model exactly as written.
    """
    from relp_tpu.analysis import ranging

    if result.cf is None or result.simplex is None:
        raise ValueError("result carries no device solve to range over")
    return ranging(result.cf, result.simplex, row_names=result.row_names)
