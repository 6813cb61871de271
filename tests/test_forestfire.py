"""ForestFireScore (``cpp/sparsification/ForestFireScore.cpp``) —
stochastic scorer, so the contract is invariant-level: determinism per
seed, normalization, burn-target satisfaction, and structure bias."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators.sparsification import forest_fire_scores


def _scores(spark, edges, **kw):
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=False)
    return {
        (r["u"], r["v"]): r["score"]
        for r in forest_fire_scores(g, **kw).collect()
    }


EDGES = [
    (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3),
    (5, 6), (6, 7), (7, 8), (8, 6), (1, 4), (4, 7),
]


def test_forest_fire_normalized_and_complete(spark):
    s = _scores(spark, EDGES, pf=0.6, target_burnt_ratio=2.0, seed=1)
    assert set(s) == {(min(u, v), max(u, v)) for u, v in EDGES}
    assert max(s.values()) == pytest.approx(1.0)
    assert all(0.0 <= v <= 1.0 for v in s.values())


def test_forest_fire_deterministic_per_seed(spark):
    a = _scores(spark, EDGES, pf=0.5, target_burnt_ratio=1.0, seed=7)
    b = _scores(spark, EDGES, pf=0.5, target_burnt_ratio=1.0, seed=7)
    c = _scores(spark, EDGES, pf=0.5, target_burnt_ratio=1.0, seed=8)
    assert a == b
    assert a != c  # 13 edges, many fires — collision virtually impossible


def test_forest_fire_burn_target(spark):
    # a long path: every burn is a distinct edge, target must be met
    edges = [(i, i + 1) for i in range(30)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    scores = forest_fire_scores(g, pf=0.9, target_burnt_ratio=1.5, seed=2)
    n_burnt = scores.where("score > 0").count()
    assert n_burnt > 0
    # total burns >= ratio * m (each burn increments one edge count)
    assert n_burnt <= len(edges)


def test_forest_fire_guards(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError, match="pf"):
        forest_fire_scores(g, pf=1.0, target_burnt_ratio=1.0)
    with pytest.raises(ValueError, match="target"):
        forest_fire_scores(g, pf=0.5, target_burnt_ratio=0.0)
