"""Per-iteration metric stream + periodic invariant hook (SURVEY §5's
"structured per-iteration metric stream" — the reference has no
observability at all; its nearest analogue is the every-debug-iteration
invariant assertion, tableau/mod.rs:253-289)."""

import numpy as np
import pytest

import relp_tpu  # noqa: F401
from relp_tpu.api import solve
from relp_tpu.model.elements import LinearProgramType
from relp_tpu.utils.config import SolverConfig
from tests.conftest import reference_problem


def _solve_traced(**kw):
    cfg = SolverConfig(trace_iters=True, check_every_n=5, **kw)
    return solve(reference_problem("netlib", "SHARE2B.SIF"), config=cfg)


def test_trace_stream_and_aggregates():
    res = _solve_traced()
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    sx = res.simplex
    tr = sx.trace
    assert tr is not None and tr.shape[1] == 8
    assert len(tr) == sx.iterations
    m = sx.metrics
    # pivots + flips + no-op iterations account for every iteration
    assert 0 < m.pivots <= sx.iterations
    assert m.pivots + m.bound_flips <= sx.iterations
    # phase column starts at 1 and ends at 2
    assert tr[0, 0] == 1.0 and tr[-1, 0] == 2.0
    # events bit 4 (fresh inverse) fires at least at each refactorization
    assert m.refresh_iters >= 1
    # the periodic check ran and found no meaningful violation
    assert 0.0 <= m.check_violation < 1e-5


def test_trace_off_by_default():
    res = solve(reference_problem("netlib", "SHARE2B.SIF"))
    assert res.simplex.trace is None
    assert res.simplex.check_violation == 0.0


def test_check_hook_with_eta_backend():
    res = _solve_traced(inverse="eta", eta_block=4)
    assert res.kind is LinearProgramType.FINITE_OPTIMUM
    assert res.simplex.check_violation < 1e-5
