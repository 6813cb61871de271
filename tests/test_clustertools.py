"""ClusteringGenerator / GraphClusteringTools / structural Rand family
(``cpp/community/{ClusteringGenerator,GraphClusteringTools,
GraphStructuralRandMeasure,Sampled*RandMeasure}.cpp``)."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators import clustertools as ct

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)]


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def _g(spark, num_nodes=6):
    return Graph.from_edge_list(
        spark, EDGES, directed=False, num_nodes=num_nodes
    )


def test_generators(spark):
    g = _g(spark)
    singles = _labels(ct.make_singleton_clustering(g))
    assert singles == {i: i for i in range(6)}
    ones = _labels(ct.make_one_clustering(g))
    assert set(ones.values()) == {0}
    rnd = _labels(ct.make_random_clustering(g, 3, seed=1))
    assert set(rnd.values()) <= {0, 1, 2}
    assert rnd == _labels(ct.make_random_clustering(g, 3, seed=1))
    # continuous balanced, n=6 k=4: block sizes 2,2,1,1
    cont = _labels(ct.make_continuous_balanced_clustering(g, 4))
    assert [cont[i] for i in range(6)] == [0, 0, 1, 1, 2, 3]
    nonc = _labels(ct.make_noncontinuous_balanced_clustering(g, 4))
    assert [nonc[i] for i in range(6)] == [0, 1, 2, 3, 0, 1]


def test_tools(spark):
    g = _g(spark)
    spark_ = g.edges.sparkSession
    two = spark_.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    assert ct.get_imbalance(two) == pytest.approx(1.0)
    skew = spark_.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 1)],
        "id long, label long",
    )
    assert ct.get_imbalance(skew) == pytest.approx(5 / 3)

    cg = ct.communication_graph(g, two)
    rows = cg.edges.collect()
    assert len(rows) == 1  # only the single inter-cluster edge (2,3)
    assert rows[0]["weight"] == pytest.approx(1.0)

    assert ct.weighted_degree_with_cluster(g, two, u=2, cid=0) == 2
    assert ct.weighted_degree_with_cluster(g, two, u=2, cid=1) == 1

    assert ct.is_proper_clustering(g, two)
    assert not ct.is_proper_clustering(g, two.where("id < 5"))
    assert ct.is_one_clustering(g, ct.make_one_clustering(g))
    assert ct.is_singleton_clustering(g, ct.make_singleton_clustering(g))
    assert not ct.is_singleton_clustering(g, two)

    relabeled = two.select("id", (100 - two.label).alias("label"))
    assert ct.equal_clusterings(two, relabeled, g)
    assert not ct.equal_clusterings(two, ct.make_one_clustering(g), g)


def test_graph_structural_rand(spark):
    g = _g(spark)
    spark_ = g.edges.sparkSession
    two = spark_.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    assert ct.graph_structural_rand_dissimilarity(g, two, two) == 0.0
    ones = ct.make_one_clustering(g)
    # vs one-clustering: disagreement only on the cut edge (2,3) → 1/7
    assert ct.graph_structural_rand_dissimilarity(g, two, ones) == (
        pytest.approx(1 / 7)
    )
    g_empty = Graph.from_edge_list(spark, [], directed=False, num_nodes=3)
    with pytest.raises(RuntimeError, match="without edges"):
        ct.graph_structural_rand_dissimilarity(g_empty, two, two)


def test_sampled_rand_measures(spark):
    g = _g(spark)
    spark_ = g.edges.sparkSession
    two = spark_.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    # identical partitions → dissimilarity 0 regardless of the sample
    assert ct.sampled_node_structural_rand_dissimilarity(g, two, two, 5) == 0.0
    assert ct.sampled_graph_structural_rand_dissimilarity(g, two, two, 5) == 0.0
    # sampling every edge reproduces the full graph-structural measure
    ones = ct.make_one_clustering(g)
    full = ct.graph_structural_rand_dissimilarity(g, two, ones)
    assert ct.sampled_graph_structural_rand_dissimilarity(
        g, two, ones, max_samples=7
    ) == pytest.approx(full)
    # determinism
    a = ct.sampled_node_structural_rand_dissimilarity(g, two, ones, 5, seed=3)
    b = ct.sampled_node_structural_rand_dissimilarity(g, two, ones, 5, seed=3)
    assert a == b
