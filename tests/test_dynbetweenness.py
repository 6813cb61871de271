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


# ---------------------------------------------------------------- exact
def test_dynbetweenness_equals_fresh_run(spark):
    from networkit_spark import Betweenness
    from networkit_spark.operators.dynbetweenness import DynBetweenness

    base = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 6)]
    extra = [(0, 4), (2, 5)]
    g = _graph(spark, base)
    dyn = DynBetweenness(g).run()
    dyn.update(_events(spark, extra))
    fresh = Betweenness(_graph(spark, base + extra)).run()
    assert _scores(dyn) == _scores(fresh)


def test_dynbetweenness_directed(spark):
    from networkit_spark import Betweenness
    from networkit_spark.operators.dynbetweenness import DynBetweenness

    base = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    extra = [(0, 2)]
    g = _graph(spark, base, directed=True)
    dyn = DynBetweenness(g).run()
    dyn.update(_events(spark, extra))
    fresh = Betweenness(_graph(spark, base + extra, directed=True)).run()
    assert _scores(dyn) == _scores(fresh)


def test_dynbetweenness_new_connection(spark):
    """Insertion that connects two components — previously-absent pair
    rows must appear and the scores still match a fresh run."""
    from networkit_spark import Betweenness
    from networkit_spark.operators.dynbetweenness import DynBetweenness

    base = [(0, 1), (1, 2), (3, 4), (4, 5)]
    extra = [(2, 3)]
    g = _graph(spark, base)
    dyn = DynBetweenness(g).run()
    dyn.update(_events(spark, extra))
    fresh = Betweenness(_graph(spark, base + extra)).run()
    assert _scores(dyn) == _scores(fresh)
    # pair state now spans the merged component
    d = {(r["s"], r["t"]): r["d"] for r in dyn.distances().collect()}
    assert d[(0, 5)] == 5 and d[(5, 0)] == 5


def test_dynbetweenness_guards(spark):
    from networkit_spark.operators.dynbetweenness import DynBetweenness

    g = _graph(spark, [(0, 1), (1, 2)])
    dyn = DynBetweenness(g).run()
    bad = spark.createDataFrame(
        [("EDGE_REMOVAL", 0, 1, 1.0)], "etype string, u long, v long, w double"
    )
    with pytest.raises(RuntimeError):
        dyn.update(bad)
    wg = _graph(spark, [(0, 1)], weighted=True)
    with pytest.raises(ValueError):
        DynBetweenness(wg)


def test_dynbetweenness_one_node(spark):
    from networkit_spark import Betweenness
    from networkit_spark.operators.dynbetweenness import DynBetweennessOneNode

    base = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 6)]
    extra = [(0, 4), (2, 5)]
    x = 2
    algo = DynBetweennessOneNode(_graph(spark, base), x).run()
    fresh0 = dict(_scores(Betweenness(_graph(spark, base)).run()))
    assert round(algo.get_bcx(), 9) == fresh0[x]
    algo.update(_events(spark, extra))
    fresh1 = dict(_scores(Betweenness(_graph(spark, base + extra)).run()))
    assert round(algo.get_bcx(), 9) == fresh1[x]
    # pairwise accessors: path 0..2 has d=2, one shortest path
    assert algo.get_distance(0, 2) == 2.0
    assert algo.get_sigma(0, 2) == 1.0
    # sigmax(0, 3): 0-1-2-3 passes through x=2 iff still shortest
    d03 = algo.get_distance(0, 3)
    sx = algo.get_sigmax(0, 3)
    assert sx >= 0.0 and (sx == 0.0 or
                          algo.get_distance(0, 2) + algo.get_distance(2, 3) == d03)


# ------------------------------------------------- top harmonic closeness
def test_dyn_top_harmonic_equals_fresh(spark):
    from networkit_spark.operators.betweenness import HarmonicCloseness
    from networkit_spark.operators.dyntopcloseness import (
        DynTopHarmonicCloseness,
    )

    base = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    extra = [(0, 5), (1, 4)]
    algo = DynTopHarmonicCloseness(_graph(spark, base), k=3).run()
    algo.update(_events(spark, extra))
    fresh = dict(_scores(HarmonicCloseness(_graph(spark, base + extra)).run()))
    got = algo.ranking()
    assert len(got) == 3
    exp = sorted(fresh.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(i, round(s, 9)) for i, s in got] == exp


def test_dyn_top_harmonic_removal_and_trail(spark):
    from networkit_spark.operators.dyntopcloseness import (
        DynTopHarmonicCloseness,
    )

    # 4-cycle: all nodes tied — trail past k shares the k-th score
    base = [(0, 1), (1, 2), (2, 3), (3, 0)]
    algo = DynTopHarmonicCloseness(_graph(spark, base), k=2).run()
    assert algo.topk_nodes_list() == [0, 1]
    assert len(algo.topk_nodes_list(include_trail=True)) == 4
    # removal breaks the tie: path 1-2-3-0 (removing 0-1)
    ev = spark.createDataFrame(
        [("EDGE_REMOVAL", 0, 1, 1.0)], "etype string, u long, v long, w double"
    )
    algo.update(ev)
    from networkit_spark.operators.betweenness import HarmonicCloseness

    fresh = dict(
        _scores(
            HarmonicCloseness(
                _graph(spark, [(1, 2), (2, 3), (3, 0)])
            ).run()
        )
    )
    got = dict((i, round(s, 9)) for i, s in algo.ranking(include_trail=True))
    for i, s in got.items():
        assert fresh[i] == s


def test_dyn_top_harmonic_directed(spark):
    from networkit_spark.operators.betweenness import HarmonicCloseness
    from networkit_spark.operators.dyntopcloseness import (
        DynTopHarmonicCloseness,
    )

    base = [(0, 1), (1, 2), (2, 3)]
    extra = [(3, 0)]
    algo = DynTopHarmonicCloseness(_graph(spark, base, directed=True), k=2).run()
    algo.update(_events(spark, extra))
    fresh = dict(
        _scores(
            HarmonicCloseness(_graph(spark, base + extra, directed=True)).run()
        )
    )
    exp = sorted(fresh.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(i, round(s, 9)) for i, s in algo.ranking()] == exp


def test_dyn_top_harmonic_guard(spark):
    from networkit_spark.operators.dyntopcloseness import (
        DynTopHarmonicCloseness,
    )

    algo = DynTopHarmonicCloseness(_graph(spark, [(0, 1)]), k=1).run()
    bad = spark.createDataFrame(
        [("EDGE_WEIGHT_UPDATE", 0, 1, 2.0)],
        "etype string, u long, v long, w double",
    )
    with pytest.raises(RuntimeError):
        algo.update(bad)
