"""ParallelAgglomerativeClusterer
(``cpp/community/ParallelAgglomerativeClusterer.cpp``) — contract:
valid partition, planted-structure recovery, hierarchy termination."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators.agglomerative import (
    ParallelAgglomerativeClusterer,
)


def _partition(algo):
    return {r["id"]: r["label"] for r in algo.get_partition().collect()}


def test_agglomerative_two_heavy_pockets(spark):
    # heavy intra-pocket weights, light bridge — pockets must merge,
    # bridge must survive as the community boundary
    edges = [
        (0, 1, 10.0), (1, 2, 10.0), (2, 0, 10.0),
        (3, 4, 10.0), (4, 5, 10.0), (5, 3, 10.0),
        (2, 3, 0.1),
    ]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    algo = ParallelAgglomerativeClusterer(g).run()
    p = _partition(algo)
    assert set(p) == set(range(6))
    assert p[0] == p[1] == p[2]
    assert p[3] == p[4] == p[5]
    assert p[0] != p[3]
    assert algo.number_of_levels() >= 1


def test_agglomerative_stops_at_two_communities(spark):
    # complete graph: matching rounds halve until MIN_NUM_COMMUNITIES
    edges = [
        (i, j, 1.0) for i in range(8) for j in range(i + 1, 8)
    ]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    algo = ParallelAgglomerativeClusterer(g).run()
    p = _partition(algo)
    n_comms = len(set(p.values()))
    assert n_comms >= ParallelAgglomerativeClusterer.MIN_NUM_COMMUNITIES
    assert n_comms < 8  # something merged


def test_agglomerative_no_edges_is_identity(spark):
    g = Graph.from_edge_list(
        spark, [(0, 1, 1.0)], directed=False, weighted=True, num_nodes=4
    )
    # nodes 2,3 isolated: they stay their own communities
    p = _partition(ParallelAgglomerativeClusterer(g).run())
    assert p[2] != p[3]
    # 0-1 is the only matchable pair: first level merges it (diff/n =
    # 0.25 > threshold), second level finds nothing and stops
    assert p[0] == p[1]


def test_agglomerative_directed_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError, match="undirected"):
        ParallelAgglomerativeClusterer(g)
