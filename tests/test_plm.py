"""PLM (parallel Louvain) tests — invariant-level equivalence with the
reference (SURVEY §5): proper clustering, planted-partition recovery,
modularity sanity (CommunityGTest.cpp:49-147 style)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.generators import clustered_random
from networkit_spark.operators.plm import PLM
from networkit_spark.operators.quality import modularity, rand_index


def test_plm_two_cliques_bridge(spark):
    # two K4s joined by one bridge edge → two communities
    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(i + 4, j + 4) for i in range(4) for j in range(i + 1, 4)]
    g = Graph.from_edge_list(spark, k4a + k4b + [(3, 4)], directed=False)
    plm = PLM(g).run()
    labels = {r["id"]: r["label"] for r in plm.get_partition().collect()}
    assert len(labels) == 8
    a = {labels[i] for i in range(4)}
    b = {labels[i] for i in range(4, 8)}
    assert len(a) == 1 and len(b) == 1 and a != b
    q = modularity(g, plm.get_partition())
    assert q > 0.3


def test_plm_planted_partition_recovery(spark):
    g, truth = clustered_random(spark, n=60, k=3, p_in=0.9, p_out=0.02, seed=42)
    plm = PLM(g).run()
    part = plm.get_partition()
    # covers the node set exactly once (proper clustering)
    assert part.count() == 60
    assert part.select("id").distinct().count() == 60
    # near-perfect agreement with the planted clusters
    assert rand_index(part, truth) > 0.95
    # modularity in the legal range and decent for a planted partition
    q = modularity(g, part)
    assert -0.5 <= q <= 1.0
    assert q > 0.4


def test_plm_rejects_directed(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        PLM(g)


def test_plm_deterministic(spark):
    g, _ = clustered_random(spark, n=40, k=2, p_in=0.8, p_out=0.05, seed=7)
    p1 = {(r["id"], r["label"]) for r in PLM(g).run().get_partition().collect()}
    p2 = {(r["id"], r["label"]) for r in PLM(g).run().get_partition().collect()}
    assert p1 == p2


def test_plm_refine_no_worse_modularity(spark):
    g, _truth = clustered_random(spark, n=80, k=4, p_in=0.5, p_out=0.02, seed=11)
    base = PLM(g, max_sweeps=4).run().get_partition()
    refined = PLM(g, max_sweeps=4, refine=True).run().get_partition()
    q_base = modularity(g, base)
    q_ref = modularity(g, refined)
    # the refine phase only accepts strictly-positive-gain moves, so
    # modularity cannot decrease (up to FP noise)
    assert q_ref >= q_base - 1e-9
    # still a proper clustering: every node labeled exactly once
    assert refined.count() == g.number_of_nodes()
    assert refined.select("id").distinct().count() == g.number_of_nodes()
