"""DynApproxBetweenness — the equals-fresh-run contract (deterministic
seeded draws make update_batch reproduce a fresh run bit-for-bit), plus
score sanity and the reference's validation guards."""

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.operators.dynbetweenness import DynApproxBetweenness

from tests.conftest import spark  # noqa: F401


def _graph(spark, pairs, directed=False, weighted=False):
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    return Graph(edges, directed=directed, weighted=weighted)


def _events(spark, pairs):
    return spark.createDataFrame(
        [("EDGE_ADDITION", a, b, 1.0) for a, b in pairs],
        "etype string, u long, v long, w double",
    )


def _scores(algo):
    return sorted(
        (r["id"], round(r["score"], 9)) for r in algo.scores().collect()
    )


def test_update_equals_fresh_run(spark):
    base = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 6), (2, 5)]
    extra = [(0, 4), (3, 6)]
    g = _graph(spark, base)
    dab = DynApproxBetweenness(g, epsilon=0.5, delta=0.2, seed=9, n_samples=24).run()
    dab.update_batch(_events(spark, extra))
    # n_samples pinned: r is diameter-derived and the update shrinks
    # the diameter, so the fresh run would otherwise draw a different r
    fresh = DynApproxBetweenness(
        _graph(spark, base + extra), epsilon=0.5, delta=0.2, seed=9,
        n_samples=24,
    ).run()
    assert dab.number_of_samples() == fresh.number_of_samples()
    assert _scores(dab) == _scores(fresh)


def test_bridge_dominates(spark):
    # two cliques joined through node 4: it lies on every cross pair's
    # only shortest path
    left = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    right = [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
    bridge = [(3, 4), (4, 5)]
    g = _graph(spark, left + right + bridge)
    dab = DynApproxBetweenness(g, epsilon=0.3, seed=21).run()
    rows = {r["id"]: r["score"] for r in dab.scores().collect()}
    # the bridge (and its two attachment points 3/5) carry every
    # cross-clique path; plain clique members are interior of none
    for plain in (0, 1, 2, 6, 7, 8):
        assert rows[4] > rows[plain]
    assert all(0.0 <= v <= 1.0 for v in rows.values())


def test_redundant_insert_is_noop(spark):
    # re-inserting an existing edge changes no distance and no σ
    # (adjacency is set-semantic), so the deterministic resampling
    # reproduces the identical paths — scores must be unchanged
    base = [(0, 1), (1, 2), (2, 3)]
    g = _graph(spark, base)
    dab = DynApproxBetweenness(g, epsilon=0.5, seed=4).run()
    before = _scores(dab)
    dab.update_batch(_events(spark, [(1, 2)]))
    assert _scores(dab) == before


def test_validation(spark):
    with pytest.raises(ValueError):
        DynApproxBetweenness(_graph(spark, [(0, 1)], directed=True))
    with pytest.raises(ValueError):
        DynApproxBetweenness(_graph(spark, [(0, 1)], weighted=True))
    g = _graph(spark, [(0, 1), (1, 2)])
    dab = DynApproxBetweenness(g, epsilon=0.5).run()
    bad = spark.createDataFrame(
        [("EDGE_REMOVAL", 0, 1, None)], "etype string, u long, v long, w double"
    )
    with pytest.raises(RuntimeError):
        dab.update_batch(bad)
