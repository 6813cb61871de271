"""Round-2 operators: Dijkstra, LocalDegreeScore, Assortativity,
streaming dedup plan."""

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph


def test_dijkstra_directed(spark):
    from networkit_spark.operators.distance import Dijkstra

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 2.0)],
        "src long, dst long, weight double",
    )
    g = Graph(edges, directed=True, weighted=True)
    dj = Dijkstra(g, source=0).run()
    d = {r["id"]: r["dist"] for r in dj.distances().collect()}
    assert d == {0: 0.0, 1: 1.0, 2: 2.0, 3: 4.0}
    assert dj.distance(3) == 4.0
    assert dj.distance(99) == float("inf")


def test_dijkstra_undirected_and_negative(spark):
    from networkit_spark.operators.distance import Dijkstra

    edges = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 2.0), (0, 2, 3.0)],
        "src long, dst long, weight double",
    )
    g = Graph(edges, directed=False, weighted=True)
    d = {r["id"]: r["dist"] for r in Dijkstra(g, 2).run().distances().collect()}
    assert d == {2: 0.0, 1: 2.0, 0: 3.0}
    neg = Graph(
        spark.createDataFrame([(0, 1, -1.0)], "src long, dst long, weight double"),
        directed=True, weighted=True,
    )
    with pytest.raises(ValueError):
        Dijkstra(neg, 0).run()


def test_local_degree_scores(spark):
    from networkit_spark.operators.sparsification import local_degree_scores

    # deg: 0->3, 1->2, 2->2, 3->1; hand-computed competition ranks
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (0, 3), (1, 2)])
    s = {(r["u"], r["v"]): round(r["score"], 6) for r in local_degree_scores(g).collect()}
    assert s[(0, 1)] == 1.0
    assert s[(0, 2)] == 1.0
    assert s[(0, 3)] == 1.0  # leaf side keeps it (d=1 -> 1.0)
    assert s[(1, 2)] == 0.0  # rank 2 of 2 on both sides


def test_assortativity_numeric(spark):
    from networkit_spark.operators.correlation import (
        Assortativity,
        degree_assortativity,
    )

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)])  # path P3
    att = spark.createDataFrame([(0, 1.0), (1, 2.0), (2, 1.0)], "id long, v double")
    r = Assortativity(g, attribute=att).run().get_coefficient()
    assert r == pytest.approx(-1.0)
    assert degree_assortativity(g) == pytest.approx(-1.0)


def test_assortativity_nominal(spark):
    from networkit_spark.operators.correlation import Assortativity

    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    part = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, label long"
    )
    r = Assortativity(g, partition=part).run().get_coefficient()
    assert r == pytest.approx(0.2)
    with pytest.raises(ValueError):
        Assortativity(g)


def test_streaming_exact_dedup_plan(spark):
    from networkit_spark.streaming.events import streaming_exact_dedup

    docs = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00")], "content_hash string, ts string"
    ).select("content_hash", F.col("ts").cast("timestamp"))
    out = streaming_exact_dedup(docs)
    # batch-mode sanity: watermark is a no-op, dedup applies
    dup = docs.unionAll(docs)
    assert streaming_exact_dedup(dup).count() == 1
    assert out.columns == ["content_hash", "ts"]


def test_scan_similarity_scores(spark):
    from networkit_spark.operators.sparsification import scan_similarity_scores

    # triangle 0-1-2 plus pendant 2-3: deg 0,1=2; 2=3; 3=1
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    s = {(r["u"], r["v"]): r["score"] for r in scan_similarity_scores(g).collect()}
    assert s[(0, 1)] == pytest.approx(2 / 3)  # (1+1)/sqrt(3*3)
    assert s[(0, 2)] == pytest.approx(2 / (3 * 4) ** 0.5)
    assert s[(2, 3)] == pytest.approx(1 / (4 * 2) ** 0.5)


def test_generators_deterministic_and_shaped(spark):
    from networkit_spark.generators import (
        barabasi_albert_like,
        chung_lu,
        watts_strogatz,
    )

    cl = chung_lu(spark, 200, exponent=2.5, avg_degree=6.0, seed=7)
    m1 = cl.number_of_edges()
    m2 = chung_lu(spark, 200, exponent=2.5, avg_degree=6.0, seed=7).number_of_edges()
    assert m1 == m2 and m1 > 0
    # power-law-ish: node 0 (largest expected weight) outranks the median
    deg = {r["id"]: r["out_deg"] for r in cl.degrees().collect()}
    assert deg.get(0, 0) >= sorted(deg.values())[len(deg) // 2]

    ws = watts_strogatz(spark, 100, k=4, p=0.1, seed=7)
    n_edges = ws.number_of_edges()
    # ring keeps ~n*k/2 edges; rewiring only dedups/self-loops a few
    assert 100 * 2 * 0.85 <= n_edges <= 100 * 2
    ba = barabasi_albert_like(spark, 300, k=3, seed=7)
    bdeg = {r["id"]: r["out_deg"] for r in ba.degrees().collect()}
    # rich-get-richer: early nodes dominate the tail
    assert max(bdeg, key=bdeg.get) < 30


def test_minimum_spanning_forest(spark):
    from networkit_spark.operators.spanning import (
        MinimumSpanningForest,
        SpanningForest,
    )

    # square with a heavy diagonal + disjoint pair; MST weight = 1+1+2 + 7
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 0, 2.0), (0, 2, 5.0),
         (8, 9, 7.0)],
        "src long, dst long, weight double",
    )
    g = Graph(edges, directed=False, weighted=True)
    msf = MinimumSpanningForest(g).run()
    assert msf.total_weight() == pytest.approx(11.0)
    f = msf.get_forest().collect()
    assert len(f) == 4  # n - #components = 6 - 2
    # partition byproduct = connected components (canonical min-id labels)
    labs = {r["id"]: r["label"] for r in msf.get_partition().collect()}
    assert labs[0] == labs[1] == labs[2] == labs[3] == 0
    assert labs[8] == labs[9] == 8

    sf = SpanningForest(g).run()
    assert len(sf.get_forest().collect()) == 4


def test_local_similarity_scores(spark):
    from networkit_spark.operators.sparsification import local_similarity_scores

    # triangle 0-1-2 plus pendant 2-3 (deg 0,1=2; 2=3; 3=1)
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    s = {(r["u"], r["v"]): r["score"] for r in local_similarity_scores(g).collect()}
    # edge (2,3): tri=0, sim=0 from both sides; node 3 has d=1 -> e=1.0
    assert s[(2, 3)] == pytest.approx(1.0)
    # edge (0,1): tri=1, sim from 0's side = 1/(2+2-1)=1/3; from 2's list
    # edges (0,2),(1,2) have sim 1/(2+3-1)=0.25 -> ranks at node 0:
    # (0,1) sim 1/3 rank 1 -> e=1; so max = 1.0
    assert s[(0, 1)] == pytest.approx(1.0)
    # edge (0,2): node0 ranks it 2nd of d=2 -> e=0; node2 ranks (0,2) 1st
    # (sim .25 ties with (1,2), tie->smaller v=0 first) of d=3 -> e=1
    assert s[(0, 2)] == pytest.approx(1.0)
    # edge (1,2): node1 rank2/d2 -> 0; node2 rank2/d3 -> 1-ln2/ln3
    import math

    assert s[(1, 2)] == pytest.approx(1 - math.log(2) / math.log(3))


def test_multiscale_scores(spark):
    from networkit_spark.operators.sparsification import multiscale_scores

    # star center 0 with leaves 1,2 at weights 3,1
    edges = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    g = Graph(edges, directed=False, weighted=True)
    s = {(r["u"], r["v"]): r["score"] for r in multiscale_scores(g).collect()}
    # from 0 (k=2, wsum=4): p(0,1)=1-(1-.75)^1=.75 ; p(0,2)=1-(1-.25)^1=.25
    # from leaves (k=1): 1-(1-1)^0 = 0 -> max stays with center's view
    assert s[(0, 1)] == pytest.approx(0.75)
    assert s[(0, 2)] == pytest.approx(0.25)


def test_salted_skew_helpers_match_unsalted(spark):
    from networkit_spark.plans.skew import salted_count_distinct, salted_gather_join

    # hub key 0 with many values incl. repeats
    rows = [(0, v % 37) for v in range(500)] + [(1, 5), (1, 6), (2, 5)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["distinct_count"]
        for r in salted_count_distinct(df, ["k"], "v", n_salts=8).collect()
    }
    assert got == {0: 37, 1: 2, 2: 1}

    big = spark.createDataFrame(
        [(0, i) for i in range(200)] + [(1, 999)], "key long, payload long"
    )
    small = spark.createDataFrame([(0, "hub"), (1, "cold")], "id long, tag string")
    out = salted_gather_join(big, small, "key", "id", n_salts=4)
    assert out.count() == 201
    assert out.where("tag = 'cold'").count() == 1


def test_jaccard_similarity_scores(spark):
    from networkit_spark.operators.sparsification import jaccard_similarity_scores

    # triangle 0-1-2 plus pendant 2-3: deg 0,1=2; 2=3; 3=1
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    s = {(r["u"], r["v"]): r["score"] for r in jaccard_similarity_scores(g).collect()}
    # (0,1): t=1, 1/(2+2-1); (0,2): t=1, 1/(2+3-1); (2,3): t=0
    assert s[(0, 1)] == pytest.approx(1 / 3)
    assert s[(0, 2)] == pytest.approx(1 / 4)
    assert s[(2, 3)] == pytest.approx(0.0)


def test_chance_corrected_triangle_scores(spark):
    from networkit_spark.operators.sparsification import (
        chance_corrected_triangle_scores,
    )

    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    s = {
        (r["u"], r["v"]): r["score"]
        for r in chance_corrected_triangle_scores(g).collect()
    }
    # n=4: (0,1): 1*(4-2)/((2-1)*(2-1)) = 2; (0,2): 1*2/(1*2) = 1
    # (2,3): t=0 but deg(3)=1 -> 1.0 (ChanceCorrectedTriangleScore.cpp:25-27)
    assert s[(0, 1)] == pytest.approx(2.0)
    assert s[(0, 2)] == pytest.approx(1.0)
    assert s[(2, 3)] == pytest.approx(1.0)


def test_sfigality_path4(spark):
    from networkit_spark.operators.degree import Sfigality

    # path 0-1-2-3: deg 0,3=1; deg 1,2=2
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)])
    s = {r["id"]: r["score"] for r in Sfigality(g).run().scores().collect()}
    # endpoints: their single neighbor has higher degree -> 1/1
    # middles: one neighbor (endpoint) lower, one (middle) equal -> 0/2
    assert s[0] == pytest.approx(1.0)
    assert s[3] == pytest.approx(1.0)
    assert s[1] == pytest.approx(0.0)
    assert s[2] == pytest.approx(0.0)


def test_laplacian_centrality_star(spark):
    from networkit_spark.operators.degree import LaplacianCentrality

    # star center 0 with leaves 1..3, unit weights
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (0, 3)])
    s = {
        r["id"]: r["score"]
        for r in LaplacianCentrality(g).run().scores().collect()
    }
    # center: 3^2 + 3 leaves * 1*(1+2*1) = 9 + 9 = 18
    # leaf: 1^2 + 1*(1+2*3) = 1 + 7 = 8
    assert s[0] == pytest.approx(18.0)
    assert s[1] == pytest.approx(8.0)
    # normalized: total energy = (9+1+1+1) + sum of w^2 both dirs (6*1) = 18
    sn = {
        r["id"]: r["score"]
        for r in LaplacianCentrality(g, normalized=True).run().scores().collect()
    }
    assert sn[0] == pytest.approx(1.0)
    assert sn[1] == pytest.approx(8.0 / 18.0)


def test_local_partition_coverage(spark):
    from networkit_spark.operators.degree import LocalPartitionCoverage

    # triangle 0-1-2 + pendant 2-3; partition {0,1} | {2,3}
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    part = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, label long"
    )
    s = {
        r["id"]: r["score"]
        for r in LocalPartitionCoverage(g, part).run().scores().collect()
    }
    assert s[0] == pytest.approx(1 / 2)  # nbrs 1 (in), 2 (out)
    assert s[2] == pytest.approx(1 / 3)  # nbrs 0,1 (out), 3 (in)
    assert s[3] == pytest.approx(1.0)


def test_link_prediction_new_indices(spark):
    from networkit_spark.operators.linkprediction import (
        link_prediction_scores,
        neighbors_measure_scores,
        same_community_scores,
    )

    # square 0-1-2-3-0 with diagonal 0-2
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    pairs = spark.createDataFrame([(1, 3)], "u long, v long")
    row = link_prediction_scores(g, pairs).collect()[0]
    # N(1)={0,2}, N(3)={0,2}: CN=2, deg1=deg3=2, union=2
    assert row["common_neighbors"] == 2
    assert row["resource_allocation"] == pytest.approx(
        round(1 / 3 + 1 / 3, 6)
    )  # deg(0)=deg(2)=3
    assert row["neighborhood_distance"] == pytest.approx(1.0)  # 2/sqrt(4)
    assert row["total_neighbors"] == 2
    assert row["u_degree"] == 2 and row["v_degree"] == 2
    # adjusted_rand (reference set_union quirk): a=2, b=c=2, d=4-2=2
    # denom = ab+ac+2ad+b^2+bd+c^2+cd = 4+4+8+4+4+4+4 = 32
    # 2(ad - bc)/denom = 2(4-4)/32 = 0
    assert row["adjusted_rand"] == pytest.approx(0.0)

    nm = neighbors_measure_scores(g, pairs).collect()[0]
    # CN=2; walks 1-a-b-3 with a in {0,2}, b in {0,2}, edge(a,b): (0,2),(2,0)
    assert nm["neighbors_measure"] == 4

    part = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, label long"
    )
    sc = same_community_scores(g, pairs, part).collect()[0]
    assert sc["same_community"] == 0


def test_simmelian_overlap_scores(spark):
    from networkit_spark.operators.sparsification import simmelian_overlap_scores

    # square 0-1-2-3-0 with diagonal 0-2; tri counts: (0,2)=2, rest=1
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    s0 = {
        (r["u"], r["v"]): r["score"]
        for r in simmelian_overlap_scores(g, max_rank=0).collect()
    }
    # rank 0 neighborhoods: 0->{2}; 1->{0,2} (tie); 2->{0}; 3->{0,2} (tie)
    assert s0[(0, 1)] == 1  # CN={2}: rank_0(2)=0, rank_1(2)=0
    assert s0[(0, 2)] == 0  # CN={1,3}: both rank 1 at node 0
    assert s0[(1, 2)] == 1 and s0[(2, 3)] == 1 and s0[(0, 3)] == 1
    s1 = {
        (r["u"], r["v"]): r["score"]
        for r in simmelian_overlap_scores(g, max_rank=1).collect()
    }
    assert s1[(0, 2)] == 2


def test_missing_links_and_thresholders(spark):
    from networkit_spark.operators.linkprediction import (
        missing_links_at_distance,
        precision_recall_points,
        random_link_sample,
        roc_points,
        threshold_by_count,
        threshold_by_percentage,
        threshold_by_score,
    )

    # path 0-1-2-3 plus edge 1-3: distances
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (1, 3)])
    d2 = {(r["u"], r["v"]) for r in missing_links_at_distance(g, 2).collect()}
    assert d2 == {(0, 2), (0, 3)}
    assert missing_links_at_distance(g, 3).count() == 0

    preds = spark.createDataFrame(
        [(0, 2, 0.9), (0, 3, 0.5), (1, 2, 0.2)], "u long, v long, score double"
    )
    assert {
        (r["u"], r["v"]) for r in threshold_by_score(preds, 0.5).collect()
    } == {(0, 2), (0, 3)}
    assert threshold_by_count(preds, 1).collect()[0]["u"] == 0
    assert threshold_by_percentage(preds, 2 / 3).count() == 2
    assert random_link_sample(g, 2).count() == 2
    # sampling is deterministic for a fixed seed
    s1 = {(r["src"], r["dst"]) for r in random_link_sample(g, 2, seed=7).collect()}
    s2 = {(r["src"], r["dst"]) for r in random_link_sample(g, 2, seed=7).collect()}
    assert s1 == s2

    test_edges = spark.createDataFrame([(0, 2)], "src long, dst long")
    roc = roc_points(preds, test_edges).collect()
    # first threshold: the true edge (0,2) -> tpr=1 immediately, fpr=0
    assert roc[0]["tpr"] == pytest.approx(1.0)
    assert roc[0]["fpr"] == pytest.approx(0.0)
    pr = precision_recall_points(preds, test_edges).collect()
    assert pr[0]["precision"] == pytest.approx(1.0)
    assert pr[-1]["precision"] == pytest.approx(1 / 3)


def test_algebraic_distance_index(spark):
    from networkit_spark.operators.linkprediction import algebraic_distance_scores

    # path 0-1-2-3-4-5: after smoothing, adjacent nodes are closer than
    # the path endpoints
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)])
    pairs = spark.createDataFrame([(0, 1), (0, 5)], "u long, v long")
    s = {
        (r["u"], r["v"]): r["score"]
        for r in algebraic_distance_scores(
            g, pairs, num_systems=4, num_iterations=6
        ).collect()
    }
    assert s[(0, 1)] < s[(0, 5)]
    # deterministic: same seed -> identical scores
    s2 = {
        (r["u"], r["v"]): r["score"]
        for r in algebraic_distance_scores(
            g, pairs, num_systems=4, num_iterations=6
        ).collect()
    }
    assert s == s2


def test_random_edge_scores(spark):
    from networkit_spark.operators.sparsification import random_edge_scores

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)])
    s = random_edge_scores(g).collect()
    assert len(s) == 3
    assert all(0.0 <= r["score"] < 1.0 for r in s)
    s2 = random_edge_scores(g).collect()
    assert sorted(map(tuple, s)) == sorted(map(tuple, s2))  # deterministic


def test_group_degree_star_plus_path(spark):
    from networkit_spark.operators.group import GroupDegree

    # star center 0 (leaves 1-4) plus disjoint path 5-6-7
    g = Graph.from_edge_list(
        spark, [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6), (6, 7)]
    )
    gd = GroupDegree(g, k=2).run()
    # greedy: first pick 0 (covers 4), then 6 (covers 5,7 -> +2)
    assert gd.group_max_degree() == [0, 6]
    # reachable = {0..4} u {5,6,7} = 8 nodes, minus k=2 -> 6
    assert gd.get_score() == 6
    gd2 = GroupDegree(g, k=2, count_group_nodes=True).run()
    assert gd2.group_max_degree() == [0, 6]
    assert gd2.get_score() == 8


def test_permanence_centrality(spark):
    from networkit_spark.operators.degree import PermanenceCentrality

    # triangle 0-1-2 (community A) + pendant 3 (community B) on node 2
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    part = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1)], "id long, label long"
    )
    s = {
        r["id"]: r["score"]
        for r in PermanenceCentrality(g, part).run().scores().collect()
    }
    assert s[0] == pytest.approx(1.0)     # 2/1/2 - (1-1)
    assert s[1] == pytest.approx(1.0)
    assert s[2] == pytest.approx(2 / 3)   # 2/1/3 - (1-1)
    assert s[3] == pytest.approx(-1.0)    # 0/1/1 - (1-0)


def test_kpath_centrality_star(spark):
    from networkit_spark.operators.kpath import KPathCentrality

    # star: center 0, leaves 1..5 — every 2+-step walk passes the center
    g = Graph.from_edge_list(
        spark, [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5)]
    )
    kp = KPathCentrality(g, k=3, num_walks=200).run()
    s = {r["id"]: r["score"] for r in kp.scores().collect()}
    assert s[0] > max(s[i] for i in range(1, 6))
    # deterministic for a fixed seed
    s2 = {
        r["id"]: r["score"]
        for r in KPathCentrality(g, k=3, num_walks=200).run().scores().collect()
    }
    assert s == s2
    with pytest.raises(RuntimeError):
        KPathCentrality(g, alpha=0.9)
