"""PLP invariants + planted-partition recovery (SURVEY §5;
CommunityGTest.cpp:49-86,125-147 style — the reference's async PLP is
nondeterministic, so equivalence is at the invariant level; OUR sync
variant must additionally be deterministic)."""

from pyspark.sql import functions as F

from networkit_spark import Graph, PLP
from networkit_spark.generators import clustered_random, erdos_renyi


def test_plp_proper_clustering_er(spark):
    g = erdos_renyi(spark, 100, 0.2, seed=42)
    plp = PLP(g).run()
    labels = plp.get_partition()
    # covers exactly the node set (test_algorithms.py:256-276)
    assert labels.count() == 100
    assert labels.select("id").distinct().count() == 100
    # every label is some node's id (proper clustering)
    bad = labels.join(
        g.vertices.withColumnRenamed("id", "label"), "label", "left_anti"
    ).count()
    assert bad == 0


def test_plp_planted_partition_recovery(spark):
    # (n=100, k=3, pin=1.0, pout=0.0) → exactly 3 clusters
    # (CommunityGTest.cpp:67-86)
    g, truth = clustered_random(spark, 100, 3, 1.0, 0.0, seed=42)
    plp = PLP(g).run()
    labels = plp.get_partition()
    assert labels.select("label").distinct().count() == 3
    # clusters coincide with ground truth: each (truth,found) pair maps 1:1
    pairs = labels.join(
        truth.withColumnRenamed("label", "truth"), "id"
    ).select("label", "truth").distinct()
    assert pairs.count() == 3


def test_plp_isolated_nodes_stay_singletons(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2)], num_nodes=5)
    plp = PLP(g).run()
    lab = {r["id"]: r["label"] for r in plp.get_partition().collect()}
    assert lab[3] == 3 and lab[4] == 4  # PLP.cpp:48-59


def test_plp_deterministic(spark):
    g = erdos_renyi(spark, 80, 0.1, seed=9)
    l1 = sorted(map(tuple, PLP(g).run().get_partition().collect()))
    l2 = sorted(map(tuple, PLP(g).run().get_partition().collect()))
    assert l1 == l2


def test_plp_max_iterations_and_timing(spark):
    g = erdos_renyi(spark, 100, 0.2, seed=42)
    plp = PLP(g, max_iterations=2).run()
    assert plp.number_of_iterations() <= 2
    assert len(plp.get_timing()) == plp.number_of_iterations()


def test_plp_base_clustering(spark):
    g, truth = clustered_random(spark, 60, 3, 1.0, 0.0, seed=5)
    base = truth.select("id", (F.col("label") * 100).alias("label"))
    plp = PLP(g, base_clustering=base).run()
    # starting from the planted clustering it is already stable
    assert plp.get_partition().select("label").distinct().count() == 3


def test_lpdo_planted_partition_recovery(spark):
    from networkit_spark import LPDegreeOrdered

    g, truth = clustered_random(spark, 100, 3, 1.0, 0.0, seed=42)
    lpdo = LPDegreeOrdered(g, batches=3).run()
    labels = lpdo.get_partition()
    assert labels.select("label").distinct().count() == 3
    pairs = (
        labels.join(truth.withColumnRenamed("label", "truth"), "id")
        .select("label", "truth")
        .distinct()
    )
    assert pairs.count() == 3
    assert lpdo.number_of_iterations() >= 1


def test_lpdo_isolated_nodes_stay_singletons(spark):
    from networkit_spark import Graph, LPDegreeOrdered

    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2)], num_nodes=5)
    lab = {
        r["id"]: r["label"]
        for r in LPDegreeOrdered(g, batches=2).run().get_partition().collect()
    }
    # degree(v) > 0 guard (LPDegreeOrdered.cpp:36): isolated stay singleton
    assert lab[3] == 3 and lab[4] == 4
    assert len(lab) == 5


def test_lpdo_deterministic_and_proper(spark):
    from networkit_spark import LPDegreeOrdered

    g = erdos_renyi(spark, 80, 0.1, seed=9)
    l1 = sorted(map(tuple, LPDegreeOrdered(g).run().get_partition().collect()))
    l2 = sorted(map(tuple, LPDegreeOrdered(g).run().get_partition().collect()))
    assert l1 == l2
    assert len(l1) == 80  # every node labeled exactly once
