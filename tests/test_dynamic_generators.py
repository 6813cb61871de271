"""Dynamic generator sources (``cpp/generators/Dynamic*.cpp``) +
RandomNodeEdgeScore (``cpp/sparsification/RandomNodeEdgeScore.cpp``)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.dynamic_generators import (
    DynamicBarabasiAlbertGenerator,
    DynamicDorogovtsevMendesGenerator,
    DynamicForestFireGenerator,
    DynamicPathGenerator,
)
from networkit_spark.operators.sparsification import random_node_edge_scores
from networkit_spark.streaming.events import graph_from_stream


def _replay(spark, events):
    return graph_from_stream(spark, events, weighted=False, directed=False)


def test_dynamic_path(spark):
    gen = DynamicPathGenerator(spark)
    ev = gen.generate(5)
    g = _replay(spark, ev)
    assert g.number_of_nodes() == 6
    assert g.number_of_edges() == 5
    degs = {r["id"]: r["out_deg"] for r in g.degrees().collect()}
    assert sorted(degs.values()) == [1, 1, 2, 2, 2, 2]
    # stateful continuation: ids and seq keep counting
    ev2 = gen.generate(2)
    assert ev2.agg(F.min("seq")).collect()[0][0] > ev.agg(
        F.max("seq")
    ).collect()[0][0]
    g2 = _replay(spark, ev.unionAll(ev2))
    assert g2.number_of_nodes() == 8 and g2.number_of_edges() == 7


def test_dynamic_dorogovtsev_mendes(spark):
    gen = DynamicDorogovtsevMendesGenerator(spark, seed=7)
    ev = gen.generate(6)
    g = _replay(spark, ev)
    # triangle + 1 node / 2 edges per step
    assert g.number_of_nodes() == 3 + 6
    assert g.number_of_edges() == 3 + 2 * 6
    # every new node v>=3 attaches to both endpoints of an existing edge
    rows = ev.where("etype = 'EDGE_ADDITION'").orderBy("seq").collect()
    attach = {}
    for r in rows[3:]:
        attach.setdefault(r["u"], []).append(r["v"])
    edge_set = {(min(r["u"], r["v"]), max(r["u"], r["v"])) for r in rows}
    for v, (s, t) in attach.items():
        assert (min(s, t), max(s, t)) in edge_set
    # seeded determinism
    again = DynamicDorogovtsevMendesGenerator(spark, seed=7).generate(6)
    assert again.collect() == ev.collect()


def test_dynamic_forest_fire_undirected(spark):
    gen = DynamicForestFireGenerator(spark, p=0.5, seed=11)
    ev = gen.generate(10)
    g = _replay(spark, ev)
    assert g.number_of_nodes() == 10
    # every non-seed node connects to >= 1 burned node (the ambassador)
    adds = ev.where("etype = 'EDGE_ADDITION'").collect()
    by_new = {}
    for r in adds:
        by_new.setdefault(r["u"], set()).add(r["v"])
    assert set(by_new) == set(range(1, 10))
    for v, targets in by_new.items():
        assert targets <= set(range(v))  # only burns existing nodes
    # grown graph is connected (fire always reaches the ambassador)
    from networkit_spark import ConnectedComponents

    cc = ConnectedComponents(g).run()
    assert cc.number_of_components() == 1


def test_dynamic_forest_fire_directed_runs(spark):
    gen = DynamicForestFireGenerator(spark, p=0.4, directed=True, r=0.5,
                                     seed=3)
    ev = gen.generate(8)
    g = graph_from_stream(spark, ev, directed=True)
    assert g.number_of_nodes() == 8
    assert g.number_of_edges() >= 7


def test_dynamic_barabasi_albert(spark):
    gen = DynamicBarabasiAlbertGenerator(spark, k=2, seed=5)
    with pytest.raises(RuntimeError):
        gen.generate(1)  # before initialize_graph, like the reference
    init = gen.initialize_graph()
    ev = gen.generate(7)
    g = _replay(spark, init.unionAll(ev))
    # k-node path start, then k distinct edges per new node
    assert g.number_of_nodes() == 2 + 7
    assert g.number_of_edges() == 1 + 2 * 7
    adds = ev.where("etype = 'EDGE_ADDITION'").collect()
    per_new = {}
    for r in adds:
        per_new.setdefault(r["u"], set()).add(r["v"])
    for u, targets in per_new.items():
        assert len(targets) == 2  # k distinct targets
        assert all(v < u for v in targets)
    with pytest.raises(ValueError):
        DynamicBarabasiAlbertGenerator(spark, k=0)


def test_random_node_edge_scores(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (1, 3), (3, 4)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    got = {(r["u"], r["v"]): r["score"]
           for r in random_node_edge_scores(g, seed=1).collect()}
    m = len(edges)
    # scores are exactly the removal fractions 0/m .. (m-1)/m, once each
    assert sorted(got.values()) == [i / m for i in range(m)]
    assert set(got) == {(min(u, v), max(u, v)) for u, v in edges}
    # seeded determinism
    again = {(r["u"], r["v"]): r["score"]
             for r in random_node_edge_scores(g, seed=1).collect()}
    assert got == again
    # differs for another seed (with overwhelming probability)
    other = {(r["u"], r["v"]): r["score"]
             for r in random_node_edge_scores(g, seed=2).collect()}
    assert got != other
    with pytest.raises(ValueError):
        random_node_edge_scores(
            Graph.from_edge_list(spark, [(0, 1)], directed=True)
        )


def _canon_edges(g):
    return {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g.edges.collect()
    }


def test_dynamic_pub_web_initial_equals_static(spark):
    from networkit_spark.dynamic_generators import DynamicPubWebGenerator
    from networkit_spark.generators import pub_web

    kw = dict(n=60, num_dense_areas=4, neighborhood_radius=0.25,
              max_neighbors=6, seed=7)
    dyn = DynamicPubWebGenerator(spark, **kw)
    ev = dyn.generate(0)  # initial dump only
    replayed = graph_from_stream(spark, ev, weighted=True, directed=False)
    static = pub_web(spark, **kw)
    assert _canon_edges(replayed) == _canon_edges(static)
    # weights: BASE_WEIGHT / sqdist, positive
    ws = [r["weight"] for r in replayed.edges.collect()]
    assert ws and all(w > 0 for w in ws)


def test_dynamic_pub_web_steps_replay(spark):
    from networkit_spark.dynamic_generators import DynamicPubWebGenerator

    dyn = DynamicPubWebGenerator(
        spark, n=60, num_dense_areas=4, neighborhood_radius=0.25,
        max_neighbors=6, seed=7,
    )
    ev0 = dyn.generate(0)
    g0 = graph_from_stream(spark, ev0, weighted=True, directed=False)
    ev = dyn.generate(2)
    from networkit_spark.streaming.events import TIME_STEP, apply_events

    # replay per TIME_STEP slice: apply_events collapses one batch to
    # set semantics, so an edge removed in step 1 and re-added in step
    # 2 must be replayed in separate batches (like GraphUpdater would)
    rows = ev.orderBy("seq").collect()
    replayed = g0
    batch: list = []
    for r in rows:
        if r["etype"] == TIME_STEP:
            if batch:
                replayed = apply_events(
                    replayed,
                    spark.createDataFrame(
                        batch, "seq long, etype string, u long, v long, w double"
                    ),
                )
            batch = []
        else:
            batch.append(tuple(r))
    assert _canon_edges(replayed) == _canon_edges(dyn.get_graph())
    # node churn: 5% of 60 = 3 per step, ids never reused
    ids = {r["id"] for r in dyn.get_coordinates().collect()}
    assert len(ids) == 60
    new = {r["id"] for r in dyn.get_new_coordinates().collect()}
    assert len(new) == 6 and all(i >= 60 for i in new)
    # weight updates carried through: replayed weights equal generator's
    wr = {(min(r["src"], r["dst"]), max(r["src"], r["dst"])): r["weight"]
          for r in replayed.edges.collect()}
    wg = {(min(r["src"], r["dst"]), max(r["src"], r["dst"])): r["weight"]
          for r in dyn.get_graph().edges.collect()}
    assert wr == wg


def test_dynamic_hyperbolic_initial_equals_static(spark):
    from networkit_spark.dynamic_generators import DynamicHyperbolicGenerator
    from networkit_spark.generators import hyperbolic

    dyn = DynamicHyperbolicGenerator(
        spark, n=80, avg_degree=4.0, exponent=3.0, seed=11
    )
    static = hyperbolic(spark, n=80, avg_degree=4.0, exponent=3.0, seed=11)
    assert _canon_edges(dyn.get_graph()) == _canon_edges(static)


def test_dynamic_hyperbolic_steps_replay(spark):
    from networkit_spark.dynamic_generators import DynamicHyperbolicGenerator
    from networkit_spark.streaming.events import apply_events

    dyn = DynamicHyperbolicGenerator(
        spark, n=60, avg_degree=4.0, exponent=3.0,
        move_each_step=0.5, move_distance=0.2, seed=5,
    )
    g0 = dyn.get_graph()
    ev = dyn.generate(3)
    replayed = apply_events(g0, ev)
    assert _canon_edges(replayed) == _canon_edges(dyn.get_graph())
    # movement honored the disk: radii in (0, R)
    rows = dyn.get_coordinates().collect()
    assert all(0.0 <= r["radius"] < dyn.R for r in rows)
    # some movement happened and the structure changed at least once
    assert ev.count() > 3  # more than just 3 TIME_STEPs


def test_dynamic_hyperbolic_validation(spark):
    from networkit_spark.dynamic_generators import DynamicHyperbolicGenerator
    import pytest

    with pytest.raises(ValueError):
        DynamicHyperbolicGenerator(spark, n=1)
    with pytest.raises(ValueError):
        DynamicHyperbolicGenerator(spark, n=10, move_each_step=1.5)
