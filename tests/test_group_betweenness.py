"""ApproxGroupBetweenness — structural invariants + deterministic
cases (the algorithm is sampled, so tests pin the seed and assert
properties the sampling cannot break; reference semantics:
``cpp/centrality/ApproxGroupBetweenness.cpp:37-141``)."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators.group import ApproxGroupBetweenness

from tests.conftest import spark  # noqa: F401


def _graph(spark, pairs, directed=False):
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    return Graph(edges, directed=directed)


def test_star_center_wins(spark):
    # every leaf-to-leaf shortest path's single interior node is the
    # center — any non-degenerate sample set must elect it first
    pairs = [(0, i) for i in range(1, 8)]
    g = _graph(spark, pairs)
    agb = ApproxGroupBetweenness(g, group_size=1, epsilon=0.5, seed=3).run()
    assert agb.group_max_betweenness() == [0]


def test_two_hubs(spark):
    # two stars joined hub-to-hub: with k=2 both hubs must be picked
    pairs = (
        [(0, i) for i in range(2, 7)]
        + [(1, i) for i in range(7, 12)]
        + [(0, 1)]
    )
    g = _graph(spark, pairs)
    agb = ApproxGroupBetweenness(g, group_size=2, epsilon=0.4, seed=5).run()
    assert sorted(agb.group_max_betweenness()) == [0, 1]


def test_deterministic_and_valid(spark):
    pairs = [(i, (i * 3 + 1) % 13) for i in range(13)] + [
        (i, i + 1) for i in range(12)
    ]
    pairs = [p for p in pairs if p[0] != p[1]]
    g = _graph(spark, pairs)
    a = ApproxGroupBetweenness(g, group_size=3, epsilon=0.5, seed=11).run()
    b = ApproxGroupBetweenness(g, group_size=3, epsilon=0.5, seed=11).run()
    got = a.group_max_betweenness()
    assert got == b.group_max_betweenness()
    assert len(got) == 3 and len(set(got)) == 3
    ids = {r["id"] for r in g.vertices.collect()}
    assert set(got) <= ids


def test_validation(spark):
    g = _graph(spark, [(0, 1), (1, 2)])
    with pytest.raises(ValueError):
        ApproxGroupBetweenness(_graph(spark, [(0, 1)], directed=True), 1)
    with pytest.raises(ValueError):
        ApproxGroupBetweenness(g, group_size=1, epsilon=0.0)
    with pytest.raises(ValueError):
        ApproxGroupBetweenness(g, group_size=0).run()
    with pytest.raises(ValueError):
        ApproxGroupBetweenness(g, group_size=3).run()
