"""DegreeCentrality (DegreeCentrality.cpp:15-47) + lifecycle contract."""

import pytest

from networkit_spark import DegreeCentrality, Graph


def test_lifecycle_guard(spark):
    g = Graph.from_edge_list(spark, [(0, 1)])
    dc = DegreeCentrality(g)
    with pytest.raises(RuntimeError):
        dc.scores()  # assureFinished (Algorithm.hpp:44-46)
    dc.run()
    assert dc.scores().count() == 2


def test_degree_centrality_undirected(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], num_nodes=5)
    dc = DegreeCentrality(g).run()
    s = {r["id"]: r["score"] for r in dc.scores().collect()}
    assert s == {0: 2.0, 1: 2.0, 2: 3.0, 3: 1.0, 4: 0.0}


def test_degree_centrality_directed_in_out(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2)], directed=True)
    out = {r["id"]: r["score"] for r in DegreeCentrality(g).run().scores().collect()}
    inn = {
        r["id"]: r["score"]
        for r in DegreeCentrality(g, out_deg=False).run().scores().collect()
    }
    assert out == {0: 2.0, 1: 1.0, 2: 0.0}
    assert inn == {0: 0.0, 1: 1.0, 2: 2.0}


def test_degree_normalized_and_self_loops(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 1)], num_nodes=3)
    dc = DegreeCentrality(g, normalized=True).run()
    s = {r["id"]: r["score"] for r in dc.scores().collect()}
    assert abs(s[0] - 0.5) < 1e-12  # deg 1 / (n-1)=2
    # self-loop ignored by default (DegreeCentrality.cpp ignoreSelfLoops)
    assert abs(s[1] - 0.5) < 1e-12

    keep = DegreeCentrality(g, ignore_self_loops=False).run()
    s2 = {r["id"]: r["score"] for r in keep.scores().collect()}
    assert s2[1] == 2.0


def test_ranking_order(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], num_nodes=4)
    dc = DegreeCentrality(g).run()
    ranked = [r["id"] for r in dc.ranking().collect()]
    assert ranked[0] == 2
    assert ranked == [2, 0, 1, 3]  # ties 0/1 broken by id asc
