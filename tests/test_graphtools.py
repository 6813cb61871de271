"""GraphTools free functions (``cpp/graph/GraphTools.cpp``) + the cover
variant of hub dominance (``CoverHubDominance.cpp``)."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators import graphtools as gt
from networkit_spark.operators.quality import (
    cover_hub_dominance,
    hub_dominance,
    partition_hub_dominance,
)


@pytest.fixture(scope="module")
def g(spark):
    # star 0-{1,2,3} plus weighted edge 2-3 and a self-loop on 4
    edges = [(0, 1, 1.0), (0, 2, 2.0), (0, 3, 1.0), (2, 3, 5.0), (4, 4, 1.0)]
    return Graph.from_edge_list(spark, edges, directed=False, weighted=True,
                                num_nodes=6)


@pytest.fixture(scope="module")
def dg(spark):
    edges = [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 3.0), (2, 3, 1.0)]
    return Graph.from_edge_list(spark, edges, directed=True, weighted=True,
                                num_nodes=4)


def test_size_density_volume(g, dg):
    assert gt.size(g) == (6, 5)
    # undirected: (m - selfloops)*2 / (n(n-1)) = 4*2/30
    assert gt.density(g) == pytest.approx(8 / 30)
    # directed: m/(n(n-1)) = 4/12
    assert gt.density(dg) == pytest.approx(4 / 12)
    # volume: total weight (=10) doubled when undirected
    assert gt.volume(g) == pytest.approx(20.0)
    assert gt.volume(dg) == pytest.approx(7.0)
    assert gt.in_volume(dg) == pytest.approx(7.0)
    assert gt.in_volume(g) == pytest.approx(20.0)


def test_max_degree_family(g, dg):
    assert gt.max_degree(g) == 3  # node 0
    assert gt.max_in_degree(g) == 3
    # node 2: weights 2 + 5
    assert gt.max_weighted_degree(g) == pytest.approx(7.0)
    assert gt.max_degree(dg) == 2  # node 2: out-edges to 0 and 3
    assert gt.max_in_degree(dg) == 1
    assert gt.max_weighted_degree(dg) == pytest.approx(4.0)  # node 2: 3+1
    assert gt.max_weighted_in_degree(dg) == pytest.approx(3.0)  # node 0


def test_random_nodes_seeded(g):
    a = {r["id"] for r in gt.random_nodes(g, 3, seed=7).collect()}
    b = {r["id"] for r in gt.random_nodes(g, 3, seed=7).collect()}
    c = {r["id"] for r in gt.random_nodes(g, 3, seed=8).collect()}
    assert a == b and len(a) == 3 and a <= set(range(6))
    assert c <= set(range(6))
    n = gt.random_node(g, seed=7)
    assert n in a


def test_random_neighbor_and_edge(g):
    nb = gt.random_neighbor(g, 0, seed=3)
    assert nb in {1, 2, 3}
    assert gt.random_neighbor(g, 5, seed=3) is None  # isolated
    u, v = gt.random_edge(g, uniform=True, seed=3)
    assert (u, v) in {(0, 1), (0, 2), (0, 3), (2, 3), (4, 4)}
    u2, v2 = gt.random_edge(g, uniform=False, seed=3)
    assert v2 in {1, 2, 3, 0, 4, 3}  # a neighbor of the drawn node


def test_random_edges_with_replacement(g):
    rows = gt.random_edges(g, 8, seed=11).collect()
    assert len(rows) == 8
    assert {r["draw"] for r in rows} == set(range(8))
    stored = {(0, 1), (0, 2), (0, 3), (2, 3), (4, 4)}
    assert all((r["src"], r["dst"]) in stored for r in rows)
    again = gt.random_edges(g, 8, seed=11).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_continuous_ids_roundtrip(spark):
    # sparse ids 2, 5, 9
    g = Graph(
        spark.createDataFrame(
            [(2, 5, 1.0), (5, 9, 2.0)], "src long, dst long, weight double"
        ),
        directed=False,
        weighted=True,
    )
    mapping = gt.get_continuous_node_ids(g)
    m = {r["id"]: r["new_id"] for r in mapping.collect()}
    assert m == {2: 0, 5: 1, 9: 2}  # order-preserving
    compact = gt.get_compacted_graph(g, mapping)
    ce = {(r["src"], r["dst"], r["weight"]) for r in compact.edges.collect()}
    assert ce == {(0, 1, 1.0), (1, 2, 2.0)}
    restored = gt.restore_graph(mapping, compact)
    re_ = {(r["src"], r["dst"], r["weight"]) for r in restored.edges.collect()}
    assert re_ == {(2, 5, 1.0), (5, 9, 2.0)}
    inv = {r["id"]: r["old_id"] for r in gt.invert_continuous_node_ids(mapping).collect()}
    assert inv == {0: 2, 1: 5, 2: 9}


def test_to_weighted(g):
    w = gt.to_weighted(Graph(g.edges, directed=False, weighted=False))
    assert w.weighted is True


def test_cover_hub_dominance_vs_partition(spark, g):
    # a cover that IS a partition must reproduce the partition variant
    part = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(6)], "id long, label long"
    )
    pd_ = {
        r["label"]: r["dominance"]
        for r in partition_hub_dominance(g, part).collect()
    }
    cd = {
        r["label"]: r["dominance"]
        for r in cover_hub_dominance(g, part).collect()
    }
    assert cd == pytest.approx(pd_)
    assert hub_dominance(g, part) == pytest.approx(
        hub_dominance(g, part, cover=True)
    )


def test_cover_hub_dominance_overlap(spark, g):
    # node 2 belongs to both clusters; cluster 1 = {2, 3} with the 2-3
    # edge internal: maxInternalDeg = 1, size 2 → dominance 1/(2-1) = 1
    cover = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (2, 1), (3, 1)], "id long, label long"
    )
    d = {r["label"]: r for r in cover_hub_dominance(g, cover).collect()}
    assert d[1]["size"] == 2
    assert d[1]["max_internal_deg"] == 1
    assert d[1]["dominance"] == pytest.approx(1.0)
    # cluster 0 = {0,1,2}: node 0 has internal neighbors 1,2 → 2/(3-1)
    assert d[0]["dominance"] == pytest.approx(1.0)
    assert d[0]["max_internal_deg"] == 2
