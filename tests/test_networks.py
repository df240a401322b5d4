"""Network formulation tests (counterpart of reference network module tests
in shortest_path.rs / max_flow.rs)."""

import pytest

import relp_tpu  # noqa: F401
from relp_tpu.models.networks import solve_max_flow, solve_shortest_path


def test_shortest_path_simple():
    # 0 -> 1 (1), 1 -> 2 (2), 0 -> 2 (5): shortest 0->2 = 3
    arcs = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0)]
    assert solve_shortest_path(3, arcs, 0, 2) == pytest.approx(3.0)


def test_shortest_path_diamond():
    arcs = [
        (0, 1, 1.0), (0, 2, 4.0), (1, 2, 1.0),
        (1, 3, 6.0), (2, 3, 2.0),
    ]
    # 0-1-2-3 = 1+1+2 = 4
    assert solve_shortest_path(4, arcs, 0, 3) == pytest.approx(4.0)


def test_shortest_path_unreachable():
    arcs = [(0, 1, 1.0), (2, 3, 1.0)]
    assert solve_shortest_path(4, arcs, 0, 3) is None


def test_max_flow_classic():
    # classic CLRS-style network, max flow 23
    arcs = [
        (0, 1, 16.0), (0, 2, 13.0), (1, 2, 10.0), (2, 1, 4.0),
        (1, 3, 12.0), (3, 2, 9.0), (2, 4, 14.0), (4, 3, 7.0),
        (3, 5, 20.0), (4, 5, 4.0),
    ]
    assert solve_max_flow(6, arcs, 0, 5) == pytest.approx(23.0)


def test_max_flow_bottleneck():
    arcs = [(0, 1, 5.0), (1, 2, 3.0), (2, 3, 7.0)]
    assert solve_max_flow(4, arcs, 0, 3) == pytest.approx(3.0)
