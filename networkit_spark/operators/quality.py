"""Partition quality measures + partition set-operations.

Reference: ``cpp/community/Coverage.cpp:13-59``, ``EdgeCut.cpp:12-20``,
``Modularity.cpp:25-80``, ``Conductance.cpp``,
``PartitionIntersection.cpp``, and the comparison measures
(``JaccardMeasure``, ``NodeStructuralRandMeasure``, ``NMIDistance``).
All are per-cluster conditional sums — pure SQL expressions over
``edges ⋈ labels × 2`` (SURVEY §2.5), no iteration.

Conventions: ``labels`` is ``(id, label)``; graphs are undirected with
canonical edges and no self-loops unless noted (the quality formulas
for self-loop volume follow the standard convention: a self-loop adds
2w to its node's volume — irrelevant for our link graphs, which strip
self-loops before community detection).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph


def _edge_label_join(graph: Graph, labels: DataFrame) -> DataFrame:
    """edges with both endpoint labels attached — two equi joins."""
    l_src = labels.select(F.col("id").alias("src"), F.col("label").alias("l_src"))
    l_dst = labels.select(F.col("id").alias("dst"), F.col("label").alias("l_dst"))
    return graph.canonical().join(l_src, "src").join(l_dst, "dst")


def coverage(graph: Graph, labels: DataFrame) -> float:
    """Intra-cluster weight / total weight (``Coverage.cpp:13-59``)."""
    j = _edge_label_join(graph, labels)
    row = j.agg(
        F.sum("weight").alias("total"),
        F.sum(F.when(F.col("l_src") == F.col("l_dst"), F.col("weight"))).alias("intra"),
    ).collect()[0]
    return (row["intra"] or 0.0) / row["total"] if row["total"] else 0.0


def edge_cut(graph: Graph, labels: DataFrame) -> float:
    """Total weight of inter-cluster edges (``EdgeCut.cpp:12-20``)."""
    j = _edge_label_join(graph, labels)
    row = j.where(F.col("l_src") != F.col("l_dst")).agg(
        F.sum("weight").alias("cut")
    ).collect()[0]
    return row["cut"] or 0.0


def modularity(graph: Graph, labels: DataFrame) -> float:
    """``Q = coverage − Σ_C vol(C)² / vol(G)²`` (``Modularity.cpp:25-80``)
    with ``vol(G) = 2·Σw`` for undirected graphs."""
    cov = coverage(graph, labels)
    total = graph.canonical().agg(F.sum("weight").alias("w")).collect()[0]["w"] or 0.0
    if total == 0:
        return 0.0
    wdeg = graph.symmetrized().groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("wd")
    )
    vols = (
        wdeg.join(labels, "id")
        .groupBy("label")
        .agg(F.sum("wd").alias("vol"))
    )
    sq = vols.agg(F.sum(F.pow("vol", 2)).alias("s")).collect()[0]["s"] or 0.0
    return cov - sq / (4.0 * total * total)


def conductance(graph: Graph, labels: DataFrame, cluster: int) -> float:
    """Conductance of one cluster: cut(C, V∖C) / min(vol(C), vol(V∖C))
    (``cpp/community/Conductance.cpp``)."""
    j = _edge_label_join(graph, labels)
    in_c_src = F.col("l_src") == cluster
    in_c_dst = F.col("l_dst") == cluster
    row = j.agg(
        F.sum(F.when(in_c_src != in_c_dst, F.col("weight"))).alias("cut")
    ).collect()[0]
    cut = row["cut"] or 0.0
    wdeg = graph.symmetrized().groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("wd")
    )
    vol_rows = (
        wdeg.join(labels, "id")
        .agg(
            F.sum(F.when(F.col("label") == cluster, F.col("wd"))).alias("vol_c"),
            F.sum("wd").alias("vol_g"),
        )
        .collect()[0]
    )
    vol_c = vol_rows["vol_c"] or 0.0
    vol_rest = (vol_rows["vol_g"] or 0.0) - vol_c
    denom = min(vol_c, vol_rest)
    return cut / denom if denom else 0.0


# ------------------------------------------------------------- partition ops
def partition_intersection(p1: DataFrame, p2: DataFrame) -> DataFrame:
    """Product of two partitions (``PartitionIntersection.cpp``):
    cluster = distinct (l1, l2) pair, densely ranked."""
    joined = (
        p1.select("id", F.col("label").alias("l1"))
        .join(p2.select("id", F.col("label").alias("l2")), "id")
    )
    # distributed dense rank over (l1, l2) pairs: range-sorted distinct +
    # zipWithIndex — no global single-partition window
    spark = joined.sparkSession
    distinct_sorted = joined.select("l1", "l2").distinct().orderBy("l1", "l2")
    rdd = distinct_sorted.rdd.zipWithIndex().map(
        lambda t: (t[0][0], t[0][1], t[1])
    )
    pairs = spark.createDataFrame(rdd, "l1 long, l2 long, label long")
    return joined.join(pairs, ["l1", "l2"]).select("id", "label")


def _contingency(p1: DataFrame, p2: DataFrame) -> DataFrame:
    return (
        p1.select("id", F.col("label").alias("l1"))
        .join(p2.select("id", F.col("label").alias("l2")), "id")
        .groupBy("l1", "l2")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def rand_index(p1: DataFrame, p2: DataFrame) -> float:
    """Node-structural Rand measure: fraction of node pairs on which the
    two partitions agree (``NodeStructuralRandMeasure.cpp``). Computed
    from the contingency table, not by pair enumeration."""
    cont = _contingency(p1, p2).persist()
    n = cont.agg(F.sum("n")).collect()[0][0]
    s_ij = cont.agg(F.sum(F.col("n") * F.col("n"))).collect()[0][0]
    s_i = (
        cont.groupBy("l1").agg(F.sum("n").alias("a"))
        .agg(F.sum(F.col("a") * F.col("a"))).collect()[0][0]
    )
    s_j = (
        cont.groupBy("l2").agg(F.sum("n").alias("b"))
        .agg(F.sum(F.col("b") * F.col("b"))).collect()[0][0]
    )
    cont.unpersist()
    if n < 2:
        return 1.0
    pairs = n * (n - 1) / 2.0
    both = (s_ij - n) / 2.0
    in1 = (s_i - n) / 2.0
    in2 = (s_j - n) / 2.0
    return 1.0 - (in1 + in2 - 2 * both) / pairs


def jaccard_measure(p1: DataFrame, p2: DataFrame) -> float:
    """Jaccard index over co-membership pairs (``JaccardMeasure.cpp``)."""
    cont = _contingency(p1, p2).persist()
    n = cont.agg(F.sum("n")).collect()[0][0]
    s_ij = cont.agg(F.sum(F.col("n") * F.col("n"))).collect()[0][0]
    s_i = (
        cont.groupBy("l1").agg(F.sum("n").alias("a"))
        .agg(F.sum(F.col("a") * F.col("a"))).collect()[0][0]
    )
    s_j = (
        cont.groupBy("l2").agg(F.sum("n").alias("b"))
        .agg(F.sum(F.col("b") * F.col("b"))).collect()[0][0]
    )
    cont.unpersist()
    both = (s_ij - n) / 2.0
    in1 = (s_i - n) / 2.0
    in2 = (s_j - n) / 2.0
    union = in1 + in2 - both
    return both / union if union else 1.0


def nmi(p1: DataFrame, p2: DataFrame) -> float:
    """Normalized mutual information between two partitions
    (``NMIDistance.cpp`` computes 1−NMI; we return NMI)."""
    cont = _contingency(p1, p2).collect()
    n = sum(r["n"] for r in cont)
    from collections import defaultdict

    a: dict = defaultdict(int)
    b: dict = defaultdict(int)
    for r in cont:
        a[r["l1"]] += r["n"]
        b[r["l2"]] += r["n"]
    mi = 0.0
    for r in cont:
        p_xy = r["n"] / n
        p_x = a[r["l1"]] / n
        p_y = b[r["l2"]] / n
        mi += p_xy * math.log(p_xy / (p_x * p_y)) if p_xy > 0 else 0.0
    h1 = -sum((v / n) * math.log(v / n) for v in a.values())
    h2 = -sum((v / n) * math.log(v / n) for v in b.values())
    denom = math.sqrt(h1 * h2)
    return mi / denom if denom else 1.0
