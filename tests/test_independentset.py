"""Luby maximal independent set — invariants + determinism + goldens
(``cpp/independentset/Luby.cpp``, ``IndependentSetFinder.cpp:17-30``)."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators.independentset import (
    Luby,
    is_independent_set,
    is_maximal,
)


def _members(g, seed=0):
    algo = Luby(g, seed=seed).run()
    return algo, {r["id"] for r in algo.members().collect()}


def test_luby_triangle(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)], directed=False)
    algo, mis = _members(g)
    assert len(mis) == 1  # a triangle's MIS is any single vertex
    assert is_independent_set(g, algo.members())
    assert is_maximal(g, algo.members())


def test_luby_star(spark):
    # star: MIS is either {hub} or all leaves
    g = Graph.from_edge_list(
        spark, [(0, i) for i in range(1, 6)], directed=False
    )
    algo, mis = _members(g)
    assert mis == {0} or mis == {1, 2, 3, 4, 5}
    assert is_independent_set(g, algo.members())
    assert is_maximal(g, algo.members())


def test_luby_path_invariants(spark):
    g = Graph.from_edge_list(
        spark, [(i, i + 1) for i in range(9)], directed=False
    )
    algo, mis = _members(g)
    assert is_independent_set(g, algo.members())
    assert is_maximal(g, algo.members())
    # a path of 10 nodes has MIS size between 4 (smallest maximal: e.g.
    # {1,4,7} is not maximal... minimum maximal = ceil(n/3)) and 5
    assert 4 <= len(mis) <= 5


def test_luby_isolated_nodes_selected(spark):
    # isolated vertices must land in the MIS (probability 1/0 = inf,
    # Luby.cpp nodeProbability)
    edges = Graph.from_edge_list(spark, [(0, 1)], directed=False).edges
    g = Graph(
        edges,
        directed=False,
        vertices=edges.sparkSession.createDataFrame(
            [(i,) for i in range(4)], "id long"
        ),
    )
    algo, mis = _members(g)
    assert {2, 3} <= mis
    assert is_maximal(g, algo.members())


def test_luby_deterministic_given_seed(spark):
    edges = [(i, (i * 7 + 3) % 40) for i in range(120)]
    g = Graph.from_edge_list(
        spark, [(a, b) for a, b in edges if a != b], directed=False
    )
    _, m1 = _members(g, seed=5)
    _, m2 = _members(g, seed=5)
    assert m1 == m2
    assert is_independent_set(
        g, Luby(g, seed=5).run().members()
    )


def test_luby_directed_rejected(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        Luby(g)


def test_luby_accessor_before_run(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(RuntimeError):
        Luby(g).flags()
