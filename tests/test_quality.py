"""Partition quality measures + comparison measures — exact values on
hand-checkable graphs (Coverage.cpp / EdgeCut.cpp / Modularity.cpp /
Conductance.cpp / the comparison measures, SURVEY §2.5, §2.7)."""

import math

import pytest

from networkit_spark import Graph
from networkit_spark.operators.quality import (
    conductance,
    coverage,
    edge_cut,
    jaccard_measure,
    modularity,
    nmi,
    partition_intersection,
    rand_index,
)


@pytest.fixture(scope="module")
def g(spark):
    # two triangles joined by one edge (weight 1 each, 7 edges)
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    return Graph.from_edge_list(spark, edges, directed=False)


@pytest.fixture(scope="module")
def split(spark):
    return spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )


def test_coverage_and_edge_cut(g, split):
    # 6 intra edges of 7 total; the bridge 2-3 is cut
    assert coverage(g, split) == pytest.approx(6 / 7)
    assert edge_cut(g, split) == pytest.approx(1.0)


def test_modularity_two_triangles(g, split):
    # vol(C) = 7 each (3 edges*2 + bridge endpoint), 2W = 14
    # Q = 6/7 - 2*(7/14)^2 = 6/7 - 1/2
    assert modularity(g, split) == pytest.approx(6 / 7 - 0.5, abs=1e-9)


def test_conductance(g, split):
    # cut=1, vol(C0)=7, vol(rest)=7 → 1/7
    assert conductance(g, split, cluster=0) == pytest.approx(1 / 7)


def test_comparison_measures_identical(split):
    assert rand_index(split, split) == pytest.approx(1.0)
    assert jaccard_measure(split, split) == pytest.approx(1.0)
    assert nmi(split, split) == pytest.approx(1.0)


def test_comparison_measures_disagree(spark, split):
    other = spark.createDataFrame(
        [(i, i % 2) for i in range(6)], "id long, label long"
    )
    # hand-computed contingency {0,1}x{0,1} = [[2,1],[1,2]]
    ri = rand_index(split, other)
    # pairs agreeing: within both = C(2,2)*2+...; use formula result
    assert 0.0 < ri < 1.0
    assert 0.0 <= jaccard_measure(split, other) < 1.0
    assert 0.0 <= nmi(split, other) < 1.0


def test_partition_intersection(spark, split):
    other = spark.createDataFrame(
        [(i, 0 if i < 2 else 1) for i in range(6)], "id long, label long"
    )
    inter = partition_intersection(split, other)
    labels = {r["id"]: r["label"] for r in inter.collect()}
    # groups: {0,1} (0,0), {2} (0,1), {3,4,5} (1,1) → 3 dense clusters
    assert labels[0] == labels[1]
    assert labels[3] == labels[4] == labels[5]
    assert len({labels[0], labels[2], labels[3]}) == 3
    assert set(labels.values()) == {0, 1, 2}


# ---------------------------------------------------- per-cluster evaluations
from networkit_spark.operators.quality import (  # noqa: E402
    adjusted_rand_dissimilarity,
    cover_f1_similarity,
    intrapartition_density,
    isolated_interpartition_conductance,
    isolated_interpartition_expansion,
    partition_fragmentation,
    partition_hub_dominance,
    stable_partition_nodes,
    stable_partition_summary,
)


def _by_label(df, col):
    return {r["label"]: r[col] for r in df.collect()}


def test_intrapartition_density(g, split):
    # each cluster: 3 intra edges of C(3,2)=3 possible → density 1.0
    d = _by_label(intrapartition_density(g, split), "density")
    assert d == {0: pytest.approx(1.0), 1: pytest.approx(1.0)}


def test_intrapartition_density_sparse(spark):
    # path 0-1-2 in one cluster with isolated 3 as its own cluster:
    # cluster 0 has 2 of 3 possible edges; singleton cluster scores 1.0
    gg = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 7)], "id long, label long"
    )
    d = _by_label(intrapartition_density(gg, labels), "density")
    assert d[0] == pytest.approx(2 / 3)
    assert d[7] == pytest.approx(1.0)


def test_partition_hub_dominance(g, split):
    # triangle: every node has internal degree 2 = size-1 → dominance 1
    d = _by_label(partition_hub_dominance(g, split), "dominance")
    assert d == {0: pytest.approx(1.0), 1: pytest.approx(1.0)}


def test_partition_hub_dominance_star(spark):
    # star 0-{1,2,3} + node 4 in a second singleton cluster:
    # hub internal degree 3 / (size-1=3) = 1; leaf-only cluster {5,6}
    # with no internal edge → 0
    gg = Graph.from_edge_list(
        spark, [(0, 1), (0, 2), (0, 3)], directed=False
    )
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (5, 1), (6, 1)],
        "id long, label long",
    )
    d = _by_label(partition_hub_dominance(gg, labels), "dominance")
    assert d[0] == pytest.approx(1.0)
    assert d[1] == pytest.approx(0.0)


def test_partition_fragmentation(g, split, spark):
    # the graph is connected → one CC; each cluster is one whole piece
    cc = spark.createDataFrame([(i, 0) for i in range(6)], "id long, label long")
    f = _by_label(partition_fragmentation(g, split, cc), "fragmentation")
    assert f == {0: pytest.approx(0.0), 1: pytest.approx(0.0)}
    # a partition lumping both triangles of a DISCONNECTED graph
    gg = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)], directed=False
    )
    cc2 = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    lump = spark.createDataFrame([(i, 9) for i in range(6)], "id long, label long")
    f2 = _by_label(partition_fragmentation(gg, lump, cc2), "fragmentation")
    assert f2[9] == pytest.approx(0.5)  # largest piece 3 of 6


def test_stable_partition_nodes(g, split, spark):
    flags = {r["id"]: r["stable"] for r in stable_partition_nodes(g, split).collect()}
    # triangle nodes 0,1 and 4,5: own weight 2 vs other 0 → stable;
    # bridge endpoints 2,3: own 2 vs other 1 → still stable
    assert all(flags[i] for i in range(6))
    summ = _by_label(stable_partition_summary(g, split), "stable_fraction")
    assert summ == {0: pytest.approx(1.0), 1: pytest.approx(1.0)}
    # flip node 2 into cluster 1: its weight to label 1 is only the
    # bridge (1) vs 2 to label 0 → unstable
    moved = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (4, 1), (5, 1)], "id long, label long"
    )
    flags2 = {
        r["id"]: r["stable"] for r in stable_partition_nodes(g, moved).collect()
    }
    assert not flags2[2]
    assert flags2[3]


def test_stable_isolated_node(spark):
    gg = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 3)], "id long, label long"
    )
    gg2 = Graph(
        gg.edges,
        directed=False,
        vertices=spark.createDataFrame([(i,) for i in range(3)], "id long"),
    )
    flags = {
        r["id"]: r["stable"] for r in stable_partition_nodes(gg2, labels).collect()
    }
    assert flags[2] is True  # isolated → stable (StablePartitionNodes.cpp:20)


def test_isolated_interpartition_conductance(g, split):
    # cut(C)=1 each, vol(C)=7 each, total vol=14 → 1/min(7,7) = 1/7
    c = _by_label(isolated_interpartition_conductance(g, split), "conductance")
    assert c == {0: pytest.approx(1 / 7), 1: pytest.approx(1 / 7)}


def test_isolated_interpartition_expansion(g, split):
    # cut=1, min(|C|, n-|C|) = 3 → 1/3
    e = _by_label(isolated_interpartition_expansion(g, split), "expansion")
    assert e == {0: pytest.approx(1 / 3), 1: pytest.approx(1 / 3)}


def test_adjusted_rand(split, spark):
    assert adjusted_rand_dissimilarity(split, split) == pytest.approx(0.0)
    # all-singletons vs split → maxIndex==expected guard → 0.0
    singles = spark.createDataFrame(
        [(i, i) for i in range(6)], "id long, label long"
    )
    assert adjusted_rand_dissimilarity(singles, singles) == pytest.approx(0.0)
    other = spark.createDataFrame(
        [(i, i % 2) for i in range(6)], "id long, label long"
    )
    d = adjusted_rand_dissimilarity(split, other)
    assert 0.0 < d <= 2.0  # ARI can be negative → dissimilarity > 1 possible


def test_cover_f1(spark, split):
    # identical covers → per-cluster F1 = 1
    f = _by_label(cover_f1_similarity(split, split), "f1")
    assert f == {0: pytest.approx(1.0), 1: pytest.approx(1.0)}
    # cluster {0,1,2} vs reference {0,1} → ol=2, F1 = 2*2/(3+2) = 0.8
    ref = spark.createDataFrame(
        [(0, 10), (1, 10), (3, 11), (4, 11), (5, 11)], "id long, label long"
    )
    f2 = _by_label(cover_f1_similarity(split, ref), "f1")
    assert f2[0] == pytest.approx(0.8)
    assert f2[1] == pytest.approx(1.0)
    # overlapping cover membership: node 2 in both reference clusters
    ref2 = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10), (2, 11), (3, 11), (4, 11), (5, 11)],
        "id long, label long",
    )
    f3 = _by_label(cover_f1_similarity(split, ref2), "f1")
    assert f3[0] == pytest.approx(1.0)  # {0,1,2} ≡ ref cluster 10
