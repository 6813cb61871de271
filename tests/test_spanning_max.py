"""Maximum spanning forest variants
(``cpp/graph/{RandomMaximumSpanningForest,UnionMaximumSpanningForest}.cpp``)."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators.spanning import (
    RandomMaximumSpanningForest,
    UnionMaximumSpanningForest,
)


def _forest(algo):
    return {
        (r["src"], r["dst"]): r["weight"] for r in algo.get_forest().collect()
    }


def test_rmsf_weighted_square(spark):
    # square 0-1-2-3-0 with weights 4,1,3,2 → max forest drops the 1
    g = Graph.from_edge_list(
        spark,
        [(0, 1, 4.0), (1, 2, 1.0), (2, 3, 3.0), (3, 0, 2.0)],
        directed=False,
        weighted=True,
    )
    f = _forest(RandomMaximumSpanningForest(g).run())
    assert set(f) == {(0, 1), (2, 3), (0, 3)}
    assert sum(f.values()) == pytest.approx(9.0)


def test_rmsf_total_weight_seed_invariant(spark):
    # equal-weight ties: different seeds may pick different forests but
    # every maximum spanning forest has the same total weight (n-1 here)
    edges = [(i, j, 1.0) for i in range(6) for j in range(i + 1, 6)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    t1 = RandomMaximumSpanningForest(g, seed=1).run()
    t2 = RandomMaximumSpanningForest(g, seed=2).run()
    w1 = sum(_forest(t1).values())
    w2 = sum(_forest(t2).values())
    assert w1 == pytest.approx(5.0)
    assert w2 == pytest.approx(5.0)
    assert len(_forest(t1)) == 5  # spanning tree of K6


def test_rmsf_deterministic_per_seed(spark):
    edges = [(i, (i * 3 + 1) % 12, 1.0) for i in range(12)]
    g = Graph.from_edge_list(
        spark, [(a, b, w) for a, b, w in edges if a != b],
        directed=False, weighted=True,
    )
    f1 = _forest(RandomMaximumSpanningForest(g, seed=7).run())
    f2 = _forest(RandomMaximumSpanningForest(g, seed=7).run())
    assert f1 == f2


def test_umsf_unique_msf(spark):
    # all-distinct weights → UMSF equals the unique maximum forest
    g = Graph.from_edge_list(
        spark,
        [(0, 1, 4.0), (1, 2, 1.0), (2, 3, 3.0), (3, 0, 2.0)],
        directed=False,
        weighted=True,
    )
    algo = UnionMaximumSpanningForest(g).run()
    assert set(_forest(algo)) == {(0, 1), (2, 3), (0, 3)}
    assert algo.in_umsf(0, 1)
    assert not algo.in_umsf(1, 2)


def test_umsf_tie_union(spark):
    # triangle with weights 2,2,1: both weight-2 edges are in some MSF,
    # the weight-1 edge in none; equal-weight square: ALL edges join
    g = Graph.from_edge_list(
        spark,
        [(0, 1, 2.0), (1, 2, 2.0), (0, 2, 1.0)],
        directed=False,
        weighted=True,
    )
    assert set(_forest(UnionMaximumSpanningForest(g).run())) == {
        (0, 1), (1, 2),
    }
    sq = Graph.from_edge_list(
        spark,
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)],
        directed=False,
        weighted=True,
    )
    assert len(_forest(UnionMaximumSpanningForest(sq).run())) == 4


def test_umsf_level_budget(spark):
    g = Graph.from_edge_list(
        spark,
        [(i, i + 1, float(i)) for i in range(8)],
        directed=False,
        weighted=True,
    )
    with pytest.raises(RuntimeError, match="distinct weight levels"):
        UnionMaximumSpanningForest(g, max_levels=3).run()
