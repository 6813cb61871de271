"""Distance-module extras (``cpp/distance/{JaccardDistance,
AdamicAdarDistance,GraphDistance,BidirectionalBFS,BidirectionalDijkstra,
Volume,NeighborhoodFunctionHeuristic}.cpp``)."""

import math

import pytest

from networkit_spark import Graph
from networkit_spark.operators.distance_extras import (
    BidirectionalBFS,
    BidirectionalDijkstra,
    NeighborhoodFunctionHeuristic,
    adamic_adar_distance_scores,
    jaccard_distance_scores,
    unweighted_distance,
    volume,
    volumes,
    weighted_distance,
)

# K4 minus edge (2,3) plus pendant 4 on 0
EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (0, 4)]


def test_jaccard_distance(spark):
    g = Graph.from_edge_list(spark, EDGES, directed=False)
    got = {
        (r["u"], r["v"]): r["score"]
        for r in jaccard_distance_scores(g).collect()
    }
    # edge (0,1): t=2 (common {2,3}), deg0=4, deg1=3 → 1 - 2/5
    assert got[(0, 1)] == pytest.approx(1 - 2 / 5)
    # edge (1,2): t=1 (0), deg1=3, deg2=2 → 1 - 1/4
    assert got[(1, 2)] == pytest.approx(1 - 1 / 4)
    # pendant edge (0,4): t=0 → 1.0
    assert got[(0, 4)] == pytest.approx(1.0)


def test_adamic_adar_distance(spark):
    g = Graph.from_edge_list(spark, EDGES, directed=False)
    got = {
        (r["u"], r["v"]): r["score"]
        for r in adamic_adar_distance_scores(g).collect()
    }
    # edge (0,1): common {2,3}, deg2=deg3=2 → aa=2/log2 → 1/aa
    assert got[(0, 1)] == pytest.approx(1 / (2 / math.log(2)))
    # edge (1,2): common {0}, deg0=4 → 1/(1/log4) = log4
    assert got[(1, 2)] == pytest.approx(math.log(4))
    # pendant: no common neighbor → +inf (reference's 1/0)
    assert math.isinf(got[(0, 4)])


def test_graph_distance_wrappers(spark):
    g = Graph.from_edge_list(
        spark, [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 10.0)],
        directed=False, weighted=True,
    )
    assert weighted_distance(g, 0, 2) == pytest.approx(5.0)
    assert unweighted_distance(g, 0, 2) == pytest.approx(1.0)


def test_bidirectional_bfs(spark):
    path = [(i, i + 1) for i in range(10)]
    g = Graph.from_edge_list(spark, path, directed=False)
    assert BidirectionalBFS(g, 0, 10).run().get_distance() == 10.0
    assert BidirectionalBFS(g, 3, 3).run().get_distance() == 0.0
    assert BidirectionalBFS(g, 0, 1).run().get_distance() == 1.0
    g2 = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    assert math.isinf(BidirectionalBFS(g2, 0, 3).run().get_distance())


def test_bidirectional_bfs_directed(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    assert BidirectionalBFS(g, 0, 2).run().get_distance() == 2.0
    assert BidirectionalBFS(g, 2, 1).run().get_distance() == 2.0


def test_bidirectional_dijkstra(spark):
    g = Graph.from_edge_list(
        spark,
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 5.0), (3, 4, 2.0)],
        directed=False, weighted=True,
    )
    assert BidirectionalDijkstra(g, 0, 4).run().get_distance() == pytest.approx(5.0)
    assert BidirectionalDijkstra(g, 0, 3).run().get_distance() == pytest.approx(3.0)
    g2 = Graph.from_edge_list(spark, [(0, 1, 1.0), (2, 3, 1.0)],
                              directed=False, weighted=True)
    assert math.isinf(BidirectionalDijkstra(g2, 0, 3).run().get_distance())


def test_volume_path_graph(spark):
    # path 0-1-2-3-4, unit weights: every node's r=1 ball has size
    # 2 (endpoints) or 3; sampling ALL nodes → exact average
    g = Graph.from_edge_list(
        spark, [(i, i + 1, 1.0) for i in range(4)],
        directed=False, weighted=True,
    )
    v1 = volume(g, r=1.0, samples=5)
    assert v1 == pytest.approx((2 + 3 + 3 + 3 + 2) / 5)
    vs = volumes(g, [0.0, 1.0, 4.0], samples=5)
    assert vs[0] == pytest.approx(1.0)
    assert vs[1] == pytest.approx(v1)
    assert vs[2] == pytest.approx(5.0)


def test_neighborhood_function_heuristic(spark):
    # cycle of 6: exact NF known; sampling all nodes → exact interior
    edges = [(i, (i + 1) % 6) for i in range(6)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    algo = NeighborhoodFunctionHeuristic(g, n_samples=6).run()
    nf = algo.get_neighborhood_function()
    # diameter 3; endpoints pinned: N(1) = 2m = 12, N(3) = n(n-1) = 30
    assert nf[0] == 12
    assert nf[-1] == 30
    assert nf == sorted(nf)  # monotone
    # interior d=2: 12 + 12 pairs at distance exactly 2 = 24
    assert nf[1] == 24


def test_neighborhood_function_guards(spark):
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError, match="undirected"):
        NeighborhoodFunctionHeuristic(gd)
    g2 = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(RuntimeError, match="connected"):
        NeighborhoodFunctionHeuristic(g2, n_samples=2).run()
    g3 = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError, match="strategy"):
        NeighborhoodFunctionHeuristic(g3, strategy="bogus")


def test_incomplete_dijkstra(spark):
    from networkit_spark.operators.distance_extras import IncompleteDijkstra

    g = Graph.from_edge_list(
        spark,
        [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (2, 3, 1.0)],
        directed=False, weighted=True,
    )
    it = IncompleteDijkstra(g, [0])
    out = []
    while it.has_next():
        out.append(it.next())
    # settled in nondecreasing distance: 0@0, 1@1, 2@3 (via 1), 3@4
    assert out == [(0, 0.0), (1, 1.0), (2, 3.0), (3, 4.0)]
    with pytest.raises(ValueError):
        it.next()
    # multi-source acts like a super source; explored nodes are absent
    it2 = IncompleteDijkstra(g, [0, 3], explored={2})
    got = dict()
    while it2.has_next():
        u, d = it2.next()
        got[u] = d
    assert got == {0: 0.0, 3: 0.0, 1: 1.0}
