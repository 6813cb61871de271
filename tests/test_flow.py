"""EdmondsKarp max-flow vs in-test Ford–Fulkerson on goldens + random
graphs; min-cut source-set invariants."""

from __future__ import annotations

import random
from collections import deque

import pytest

from networkit_spark import Graph
from networkit_spark.operators.flow import EdmondsKarp


def _ref_maxflow(n_nodes, arcs, s, t):
    """Plain BFS Ford–Fulkerson on a residual dict (textbook)."""
    r = {}
    for u, v, c in arcs:
        r[(u, v)] = r.get((u, v), 0.0) + c
        r.setdefault((v, u), 0.0)
    total = 0.0
    while True:
        pred = {s: s}
        gain = {s: float("inf")}
        dq = deque([s])
        while dq and t not in pred:
            u = dq.popleft()
            for (a, b), res in r.items():
                if a == u and res > 1e-12 and b not in pred:
                    pred[b] = u
                    gain[b] = min(gain[u], res)
                    dq.append(b)
        if t not in pred:
            return total
        g = gain[t]
        total += g
        v = t
        while v != s:
            u = pred[v]
            r[(u, v)] -= g
            r[(v, u)] += g
            v = u


def _graph(spark, rows, directed):
    return Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=directed,
        weighted=True,
    )


def test_directed_diamond(spark):
    rows = [(0, 1, 3.0), (0, 2, 2.0), (1, 3, 2.0), (2, 3, 3.0)]
    ek = EdmondsKarp(_graph(spark, rows, True), 0, 3).run()
    assert ek.get_max_flow() == pytest.approx(4.0)
    # flow conservation: into sink == value
    flows = {(r["u"], r["v"]): r["flow"] for r in ek.get_flow().collect()}
    assert flows[(1, 3)] + flows[(2, 3)] == pytest.approx(4.0)


def test_undirected_triangle(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    ek = EdmondsKarp(_graph(spark, rows, False), 0, 2).run()
    assert ek.get_max_flow() == pytest.approx(2.0)


def test_source_set_is_min_cut_side(spark):
    # bottleneck edge (1,2): cut separates {0,1} from {2,3}
    rows = [(0, 1, 5.0), (1, 2, 1.0), (2, 3, 5.0)]
    ek = EdmondsKarp(_graph(spark, rows, True), 0, 3).run()
    assert ek.get_max_flow() == pytest.approx(1.0)
    assert ek.get_source_set() == [0, 1]


def test_random_directed_vs_fordfulkerson(spark):
    rng = random.Random(13)
    n = 10
    for trial in range(2):
        arcs = sorted(
            {
                (a, b)
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(28)
                )
                if a != b
            }
        )
        rows = [(u, v, float(rng.randint(1, 5))) for u, v in arcs]
        exp = _ref_maxflow(n, rows, 0, n - 1)
        ek = EdmondsKarp(_graph(spark, rows, True), 0, n - 1).run()
        assert ek.get_max_flow() == pytest.approx(exp), f"trial {trial}"


def test_validation(spark):
    g = _graph(spark, [(0, 1, 1.0)], True)
    with pytest.raises(ValueError):
        EdmondsKarp(g, 0, 0)
