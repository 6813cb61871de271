"""k-core, BFS/ANF, coarsening, sparsification, link-prediction tests."""

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.operators.kcore import CoreDecomposition
from networkit_spark.operators.distance import (
    BFS,
    EffectiveDiameterApproximation,
    hop_histogram,
)
from networkit_spark.operators.coarsening import ParallelPartitionCoarsening
from networkit_spark.operators.sparsification import (
    degree_product_scores,
    global_threshold_filter,
)
from networkit_spark.operators.linkprediction import link_prediction_scores


@pytest.fixture(scope="module")
def g(spark):
    # triangle 0-1-2 + tail 2-3-4, plus isolated clique 5-6-7-8 (K4)
    edges = [
        (0, 1), (1, 2), (0, 2), (2, 3), (3, 4),
        (5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8),
    ]
    return Graph.from_edge_list(spark, edges, directed=False, num_nodes=9)


def test_core_decomposition(g):
    cd = CoreDecomposition(g).run()
    cores = {r["id"]: r["core"] for r in cd.core_numbers().collect()}
    # K4 members have core 3; triangle members core 2; tail nodes core 1
    assert cores[5] == cores[6] == cores[7] == cores[8] == 3
    assert cores[0] == cores[1] == cores[2] == 2
    assert cores[3] == 1 and cores[4] == 1
    assert cd.max_core_number() == 3
    shells = {r["core"]: r["size"] for r in cd.shells().collect()}
    assert shells == {1: 2, 2: 3, 3: 4}


def test_bfs(g):
    bfs = BFS(g, source=0).run()
    d = {r["id"]: r["dist"] for r in bfs.distances().collect()}
    assert d == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}
    assert bfs.eccentricity() == 3
    full = {r["id"]: r["dist"] for r in bfs.distances_with_unreachable().collect()}
    assert full[5] == -1
    hist = {r["dist"]: r["count"] for r in hop_histogram(g, 0).collect()}
    assert hist == {0: 1, 1: 2, 2: 1, 3: 1}


def test_bfs_directed(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    d = {r["id"]: r["dist"] for r in BFS(g, 0).run().distances().collect()}
    assert d == {0: 0, 1: 1, 2: 2}


def test_effective_diameter(spark):
    # path of 20 nodes: diameter 19, 0.9-effective diameter ≈ 17±2
    edges = [(i, i + 1) for i in range(19)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    eff = EffectiveDiameterApproximation(g, ratio=0.9, k=8).run()
    assert 12 <= eff.get_effective_diameter() <= 19
    # clique: everything reachable in 1 hop
    kg = Graph.from_edge_list(
        spark, [(i, j) for i in range(5) for j in range(i + 1, 5)], directed=False
    )
    eff2 = EffectiveDiameterApproximation(kg, ratio=0.9, k=8).run()
    assert eff2.get_effective_diameter() == 1.0


def test_coarsening(g, spark):
    labels = spark.createDataFrame(
        [(i, 10 if i <= 4 else 20) for i in range(9)], "id long, label long"
    )
    pc = ParallelPartitionCoarsening(g, labels).run()
    cg = pc.get_coarse_graph()
    rows = {(r["src"], r["dst"]): r["weight"] for r in cg.edges.collect()}
    # 5 intra edges in cluster 10 → self-loop weight 5; 6 in cluster 20;
    # no inter-cluster edges
    assert rows == {(0, 0): 5.0, (1, 1): 6.0}
    mapping = {r["id"]: r["super"] for r in
               pc.get_fine_to_coarse_node_mapping().collect()}
    assert mapping[0] == 0 and mapping[5] == 1


def test_matching_coarsening(g, spark):
    from networkit_spark.operators.coarsening import MatchingCoarsening

    # matching {0,1}, {2,3}, {5,6}; 4, 7, 8 unmatched. Reference id
    # assignment (MatchingCoarsening.cpp:25-40): sequential in
    # ascending fine-id order → rep 0→0, rep 2→1, rep 4→2, rep 5→3,
    # rep 7→4, rep 8→5.
    matching = spark.createDataFrame(
        [(0, 1), (2, 3), (5, 6)], "src long, dst long"
    )
    mc = MatchingCoarsening(g, matching).run()
    mapping = {r["id"]: r["super"] for r in
               mc.get_fine_to_coarse_node_mapping().collect()}
    assert mapping == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 3, 6: 3, 7: 4, 8: 5}
    rows = {(r["src"], r["dst"]): r["weight"] for r in
            mc.get_coarse_graph().edges.collect()}
    # hand contraction of the fixture (triangle 0-1-2, tail 2-3-4,
    # K4 on 5-8): {0,1} edge → self-loop (0,0); 1-2 and 0-2 → (0,1)
    # weight 2; 2-3 → self-loop (1,1); 3-4 → (1,2); {5,6} edge →
    # self-loop (3,3); 5-7,6-7 → (3,4) weight 2; 5-8,6-8 → (3,5)
    # weight 2; 7-8 → (4,5)
    assert rows == {
        (0, 0): 1.0, (0, 1): 2.0, (1, 1): 1.0, (1, 2): 1.0,
        (3, 3): 1.0, (3, 4): 2.0, (3, 5): 2.0, (4, 5): 1.0,
    }
    # noSelfLoops drops the matched-pair self-loops
    mc2 = MatchingCoarsening(g, matching, no_self_loops=True).run()
    rows2 = {(r["src"], r["dst"]): r["weight"] for r in
             mc2.get_coarse_graph().edges.collect()}
    assert rows2 == {
        (0, 1): 2.0, (1, 2): 1.0, (3, 4): 2.0, (3, 5): 2.0, (4, 5): 1.0,
    }
    # composes with the engine's own matcher: contraction by a valid
    # matching halves matched pairs, preserves total weight (self-loops
    # included) and never merges two unmatched nodes
    from networkit_spark.operators.matching import LocalMaxMatcher

    m = LocalMaxMatcher(g).run().get_matching()
    mc3 = MatchingCoarsening(g, m).run()
    n_matched = m.count()
    assert mc3.get_coarse_graph().number_of_nodes() == 9 - n_matched
    total = mc3.get_coarse_graph().edges.agg(
        F.sum("weight").alias("s")
    ).collect()[0]["s"]
    assert total == 11.0


def test_global_threshold_filter(g):
    scores = degree_product_scores(g)
    # K4 edges have score 9; triangle/tail edges less
    filtered = global_threshold_filter(g, scores, threshold=9.0, above=True)
    kept = {(r["src"], r["dst"]) for r in filtered.edges.collect()}
    assert kept == {(5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8)}


def test_link_prediction(g, spark):
    pairs = spark.createDataFrame([(0, 3), (5, 6), (0, 4)], "u long, v long")
    res = {(r["u"], r["v"]): r for r in
           link_prediction_scores(g, pairs).collect()}
    # 0 and 3 share neighbor 2
    assert res[(0, 3)]["common_neighbors"] == 1
    # jaccard = 1 / |{1,2} ∪ {2,4}| = 1/3
    assert res[(0, 3)]["jaccard"] == pytest.approx(1 / 3, abs=1e-6)
    # 5,6 share 7 and 8 (both degree 3): AA = 2/ln(3)
    import math

    assert res[(5, 6)]["common_neighbors"] == 2
    assert res[(5, 6)]["adamic_adar"] == pytest.approx(2 / math.log(3), abs=1e-5)
    assert res[(5, 6)]["pref_attachment"] == 9
    assert res[(0, 4)]["common_neighbors"] == 0
