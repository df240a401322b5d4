"""Differential test: native C++ scanner vs the pure-Python parser over the
full problem corpora.  The Python parser is the semantic source of truth."""

import glob
import os
import time

import pytest

import relp_tpu  # noqa: F401
from relp_tpu.io import native
from relp_tpu.io.mps_parse import parse_fixed, parse_free
from tests.conftest import REFERENCE_DATA

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native scanner not built"
)


def corpus_files():
    out = []
    for suite in ("burkardt", "netlib", "unicamp", "miplib", "cook"):
        pat = os.path.join(REFERENCE_DATA, suite, "problem_files", "*")
        out.extend(sorted(glob.glob(pat)))
    return [p for p in out if p.lower().endswith((".mps", ".sif"))]


def assert_same(py, nat, path):
    assert nat.name == py.name, path
    assert nat.objective == py.objective
    assert nat.objective_constant == py.objective_constant
    assert [r.name for r in nat.rows] == [r.name for r in py.rows], path
    assert [r.constraint_type for r in nat.rows] == [r.constraint_type for r in py.rows]
    assert [c.name for c in nat.columns] == [c.name for c in py.columns], path
    assert [c.variable_type for c in nat.columns] == [c.variable_type for c in py.columns]
    for cn, cp in zip(nat.columns, py.columns):
        assert cn.values == cp.values, (path, cn.name)
    assert nat.cost_values == py.cost_values, path
    assert [g.values for g in nat.rhss] == [g.values for g in py.rhss], path
    assert [g.name for g in nat.rhss] == [g.name for g in py.rhss], path
    assert [g.values for g in nat.ranges] == [g.values for g in py.ranges], path
    assert [g.values for g in nat.bounds] == [g.values for g in py.bounds], path


def test_differential_over_corpora():
    files = corpus_files()
    assert len(files) > 100  # netlib alone has ~104
    checked = 0
    for path in files:
        fixed = path.lower().endswith(".sif")
        text = open(path).read()
        try:
            py = parse_fixed(text) if fixed else parse_free(text)
        except Exception:
            # files the Python parser rejects: the native one must reject too
            with pytest.raises(Exception):
                native.parse_file_native(path, fixed)
            continue
        nat = native.parse_file_native(path, fixed)
        assert_same(py, nat, path)
        checked += 1
    assert checked > 100


def test_native_is_faster_on_big_file():
    path = os.path.join(REFERENCE_DATA, "netlib", "problem_files", "STOCFOR3.SIF")
    if not os.path.exists(path):
        pytest.skip("STOCFOR3 not available")
    text = open(path).read()
    # best-of-3 each way: a single-shot comparison is flaky under host
    # load (observed once with a TPU solve running concurrently)
    t_py = min(
        _timed(lambda: parse_fixed(text)) for _ in range(3)
    )
    t_nat = min(
        _timed(lambda: native.parse_file_native(path, True)) for _ in range(3)
    )
    assert t_nat < t_py, (t_nat, t_py)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0
