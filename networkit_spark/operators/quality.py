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


# --------------------------------------------------- per-cluster evaluations
#
# The reference's LocalPartitionEvaluation family (values per cluster +
# min/max/unweighted/weighted averages). Each returns a per-cluster
# DataFrame; the summary scalars are one agg away and the gated driver
# query hashes the rounded unweighted averages.


def _cluster_sizes(labels: DataFrame) -> DataFrame:
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


def intrapartition_density(graph: Graph, labels: DataFrame) -> DataFrame:
    """Per-cluster intra-cluster edge density
    (``cpp/community/IntrapartitionDensity.cpp:20-60``): intra-edge count
    over ``s·(s−1)/2`` possible; clusters where no edge is possible
    (size 1) score 1.0 like the reference's ``id = 1`` default.

    Returns ``(label, size, intra_edges, density)``.
    """
    j = _edge_label_join(graph, labels)
    intra = (
        j.where(F.col("l_src") == F.col("l_dst"))
        .groupBy(F.col("l_src").alias("label"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    sizes = _cluster_sizes(labels)
    possible = (F.col("size") * (F.col("size") - 1) / 2.0)
    return (
        sizes.join(intra, "label", "left")
        .na.fill({"intra_edges": 0})
        .select(
            "label",
            "size",
            "intra_edges",
            F.when(possible > 0, F.col("intra_edges") / possible)
            .otherwise(F.lit(1.0))
            .alias("density"),
        )
    )


def partition_hub_dominance(graph: Graph, labels: DataFrame) -> DataFrame:
    """Per-cluster hub dominance (``PartitionHubDominance.cpp:8-66``):
    max internal degree over ``size − 1``; singleton clusters score 1
    (the reference's ``dominance = 1`` default). A cluster whose nodes
    have no internal edges scores 0.

    Returns ``(label, size, max_internal_deg, dominance)``. The scalar
    ``HubDominance.getQuality`` is the unweighted average of
    ``dominance`` (``HubDominance.cpp:12-16``).
    """
    sym = graph.symmetrized()
    l_src = labels.select(F.col("id").alias("src"), F.col("label").alias("l_src"))
    l_dst = labels.select(F.col("id").alias("dst"), F.col("label").alias("l_dst"))
    internal = (
        sym.join(l_src, "src")
        .join(l_dst, "dst")
        .where(F.col("l_src") == F.col("l_dst"))
        .groupBy(F.col("src").alias("id"), F.col("l_src").alias("label"))
        .agg(F.count(F.lit(1)).alias("ideg"))
        .groupBy("label")
        .agg(F.max("ideg").alias("max_internal_deg"))
    )
    sizes = _cluster_sizes(labels)
    return (
        sizes.join(internal, "label", "left")
        .na.fill({"max_internal_deg": 0})
        .select(
            "label",
            "size",
            "max_internal_deg",
            F.when(
                F.col("size") > 1,
                F.col("max_internal_deg") / (F.col("size") - 1),
            )
            .otherwise(F.lit(1.0))
            .alias("dominance"),
        )
    )


def cover_hub_dominance(graph: Graph, cover: DataFrame) -> DataFrame:
    """Per-cluster hub dominance over a COVER
    (``CoverHubDominance.cpp:8-77``): a cover is a multi-membership
    ``(id, label)`` frame. For each cluster c, ``maxInternalDeg`` = max
    over members u of the number of neighbors v that also carry c;
    dominance = that over ``size − 1`` (singletons score 1, the
    reference's default). Unlike the partition variant one node
    contributes to every cluster it belongs to, so the edge–label join
    keys on ``(dst, label)`` instead of comparing two single labels.

    Returns ``(label, size, max_internal_deg, dominance)``; the cover
    branch of ``HubDominance.getQuality`` (``HubDominance.cpp:18-21``)
    is the unweighted average, see :func:`hub_dominance`.
    """
    sym = graph.symmetrized()
    c_src = cover.select(F.col("id").alias("src"), "label")
    c_dst = cover.select(F.col("id").alias("dst"), "label")
    internal = (
        sym.select("src", "dst")
        .join(c_src, "src")
        .join(c_dst, ["dst", "label"])
        .groupBy(F.col("src").alias("id"), "label")
        .agg(F.count(F.lit(1)).alias("ideg"))
        .groupBy("label")
        .agg(F.max("ideg").alias("max_internal_deg"))
    )
    sizes = cover.groupBy("label").agg(F.count(F.lit(1)).alias("size"))
    return (
        sizes.join(internal, "label", "left")
        .na.fill({"max_internal_deg": 0})
        .select(
            "label",
            "size",
            "max_internal_deg",
            F.when(
                F.col("size") > 1,
                F.col("max_internal_deg") / (F.col("size") - 1),
            )
            .otherwise(F.lit(1.0))
            .alias("dominance"),
        )
    )


def hub_dominance(
    graph: Graph, labels: DataFrame, cover: bool = False
) -> float:
    """``HubDominance::getQuality`` (``HubDominance.cpp:12-21``): the
    unweighted average per-cluster dominance, dispatching to the
    partition (``PartitionHubDominance``) or cover
    (``CoverHubDominance``) variant exactly like the reference's two
    overloads."""
    per = (
        cover_hub_dominance(graph, labels)
        if cover
        else partition_hub_dominance(graph, labels)
    )
    row = per.agg(F.avg("dominance")).collect()[0][0]
    return float(row) if row is not None else 0.0


def partition_fragmentation(
    graph: Graph, labels: DataFrame, components: DataFrame
) -> DataFrame:
    """Per-cluster fragmentation (``PartitionFragmentation.cpp:6-70``):
    ``1 − largest-connected-piece / cluster size`` where pieces come from
    intersecting the partition with the connected-components partition
    (the reference takes the min over nodes of ``1 − pieceSize/size``,
    i.e. exactly the largest piece). ``components`` is any ``(id, label)``
    partition frame — pass the CC labels.

    Returns ``(label, size, max_piece, fragmentation)``.
    """
    joined = (
        labels.select("id", "label")
        .join(components.select("id", F.col("label").alias("comp")), "id")
        .groupBy("label", "comp")
        .agg(F.count(F.lit(1)).alias("piece"))
        .groupBy("label")
        .agg(F.max("piece").alias("max_piece"))
    )
    sizes = _cluster_sizes(labels)
    return sizes.join(joined, "label").select(
        "label",
        "size",
        "max_piece",
        (1.0 - F.col("max_piece") / F.col("size")).alias("fragmentation"),
    )


def stable_partition_nodes(graph: Graph, labels: DataFrame) -> DataFrame:
    """Per-node stability flags (``StablePartitionNodes.cpp:7-80``):
    a node is stable iff it is isolated, or its weight to its own label
    is positive AND strictly exceeds its weight to every other label
    (the reference marks unstable when any other label ties or wins).

    Returns ``(id, label, stable)``; the per-cluster fraction and the
    global ``weightedAverage = stableCount/n`` are one groupBy away
    (see :func:`stable_partition_summary`).
    """
    sym = graph.symmetrized()
    l_dst = labels.select(F.col("id").alias("_d"), F.col("label").alias("nbr_label"))
    lw = (
        sym.join(l_dst, sym["dst"] == l_dst["_d"])
        .groupBy(F.col("src").alias("id"), "nbr_label")
        .agg(F.sum("weight").alias("w"))
    )
    own = labels.select("id", "label")
    per_node = (
        lw.join(own, "id")
        .groupBy("id", "label")
        .agg(
            F.sum(F.when(F.col("nbr_label") == F.col("label"), F.col("w"))).alias(
                "own_w"
            ),
            F.max(F.when(F.col("nbr_label") != F.col("label"), F.col("w"))).alias(
                "other_max"
            ),
        )
        .select(
            "id",
            "label",
            (
                (F.coalesce(F.col("own_w"), F.lit(0.0)) > 0)
                & (
                    F.coalesce(F.col("own_w"), F.lit(0.0))
                    > F.coalesce(F.col("other_max"), F.lit(0.0))
                )
            ).alias("stable"),
        )
    )
    # isolated nodes never appear in lw — the reference counts them stable
    isolated = own.join(per_node.select("id"), "id", "left_anti").select(
        "id", "label", F.lit(True).alias("stable")
    )
    return per_node.unionAll(isolated)


def stable_partition_summary(graph: Graph, labels: DataFrame) -> DataFrame:
    """Per-cluster fraction of stable nodes (``values[i] /= size``)."""
    flags = stable_partition_nodes(graph, labels)
    return flags.groupBy("label").agg(
        F.count(F.lit(1)).alias("size"),
        (F.sum(F.col("stable").cast("long")) / F.count(F.lit(1))).alias(
            "stable_fraction"
        ),
    )


def isolated_interpartition_conductance(
    graph: Graph, labels: DataFrame
) -> DataFrame:
    """Per-cluster isolated conductance
    (``IsolatedInterpartitionConductance.cpp:4-68``): inter-cluster cut
    of C over ``min(vol(C), vol(G)−vol(C))``; 0 when the denominator is
    0 (the reference's explicit ``denominator > 0`` guard).

    Returns ``(label, size, cut, vol, conductance)``.
    """
    j = _edge_label_join(graph, labels)
    inter = F.col("l_src") != F.col("l_dst")
    per_side = j.select(
        F.col("l_src").alias("label"),
        F.col("weight"),
        F.when(inter, F.col("weight")).otherwise(F.lit(0.0)).alias("cutw"),
    ).unionAll(
        j.select(
            F.col("l_dst").alias("label"),
            F.col("weight"),
            F.when(inter, F.col("weight")).otherwise(F.lit(0.0)).alias("cutw"),
        )
    )
    per_cluster = per_side.groupBy("label").agg(
        F.sum("cutw").alias("cut"), F.sum("weight").alias("vol")
    )
    total = graph.canonical().agg((2.0 * F.sum("weight")).alias("tv"))
    sizes = _cluster_sizes(labels)
    out = sizes.join(per_cluster, "label", "left").na.fill(
        {"cut": 0.0, "vol": 0.0}
    ).crossJoin(F.broadcast(total))
    denom = F.least(F.col("vol"), F.col("tv") - F.col("vol"))
    return out.select(
        "label",
        "size",
        "cut",
        "vol",
        F.when(denom > 0, F.col("cut") / denom).otherwise(F.lit(0.0)).alias(
            "conductance"
        ),
    )


def isolated_interpartition_expansion(graph: Graph, labels: DataFrame) -> DataFrame:
    """Per-cluster isolated expansion
    (``IsolatedInterpartitionExpansion.cpp:4-50``): inter-cluster cut
    over ``min(|C|, n−|C|)``. Documented divergence: the reference
    divides unconditionally (a whole-graph cluster yields NaN); we emit
    0.0 for a 0 denominator — a DataFrame-friendlier sentinel, same
    rationale as Sfigality's isolated-node 0.0.

    Returns ``(label, size, cut, expansion)``.
    """
    j = _edge_label_join(graph, labels)
    inter = F.col("l_src") != F.col("l_dst")
    cut = (
        j.where(inter)
        .select(F.col("l_src").alias("label"), "weight")
        .unionAll(j.where(inter).select(F.col("l_dst").alias("label"), "weight"))
        .groupBy("label")
        .agg(F.sum("weight").alias("cut"))
    )
    n = graph.number_of_nodes()
    sizes = _cluster_sizes(labels)
    denom = F.least(F.col("size"), F.lit(n) - F.col("size"))
    return (
        sizes.join(cut, "label", "left")
        .na.fill({"cut": 0.0})
        .select(
            "label",
            "size",
            "cut",
            F.when(denom > 0, F.col("cut") / denom)
            .otherwise(F.lit(0.0))
            .alias("expansion"),
        )
    )


def adjusted_rand_dissimilarity(p1: DataFrame, p2: DataFrame) -> float:
    """Adjusted-Rand *dissimilarity* ``1 − ARI``
    (``AdjustedRandMeasure.cpp:5-54``), computed from the contingency
    table: ``randIndex = Σ C(n_ij,2)``, ``sumZeta/sumEta = Σ C(a_i,2)/
    Σ C(b_j,2)``, ``expected = sumZeta·sumEta / C(n,2)``,
    ``max = (sumZeta+sumEta)/2``; both degenerate guards (all-singleton
    and single-cluster) return 0.0 exactly like the reference.
    """
    cont = _contingency(p1, p2).persist()
    row = cont.agg(
        F.sum("n").alias("n"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("rand"),
    ).collect()[0]
    n, rand_idx = row["n"], float(row["rand"] or 0.0)
    sum_zeta = float(
        cont.groupBy("l1")
        .agg(F.sum("n").alias("a"))
        .agg(F.sum(F.col("a") * (F.col("a") - 1) / 2))
        .collect()[0][0]
        or 0.0
    )
    sum_eta = float(
        cont.groupBy("l2")
        .agg(F.sum("n").alias("b"))
        .agg(F.sum(F.col("b") * (F.col("b") - 1) / 2))
        .collect()[0][0]
        or 0.0
    )
    cont.unpersist()
    if n < 2:
        return 0.0
    denominator = n * (n - 1) / 2.0
    max_index = 0.5 * (sum_zeta + sum_eta)
    expected = sum_zeta * sum_eta / denominator
    if max_index == 0 or max_index == expected:
        return 0.0
    return 1.0 - (rand_idx - expected) / (max_index - expected)


def cover_f1_similarity(
    memberships: DataFrame, reference: DataFrame
) -> DataFrame:
    """Per-cluster best-F1 against a reference cover
    (``CoverF1Similarity.cpp:9-100``). Covers are multi-membership
    frames ``(id, label)`` (a node may carry several labels). For each
    cluster c of ``memberships``: overlap with every reference cluster s
    via one join-agg, then ``F1 = 2·ol / (|c| + |s|)`` (the harmonic
    mean of ol/|c| and ol/|s| simplifies because both share the ol
    numerator), best F1 per c. Clusters overlapping nothing score 0.

    Returns ``(label, size, f1)``.
    """
    c_sizes = memberships.groupBy("label").agg(F.count(F.lit(1)).alias("c_size"))
    r_sizes = (
        reference.groupBy("label")
        .agg(F.count(F.lit(1)).alias("r_size"))
        .select(F.col("label").alias("r_label"), "r_size")
    )
    overlap = (
        memberships.select("id", "label")
        .join(
            reference.select("id", F.col("label").alias("r_label")), "id"
        )
        .groupBy("label", "r_label")
        .agg(F.count(F.lit(1)).alias("ol"))
    )
    best = (
        overlap.join(c_sizes, "label")
        .join(F.broadcast(r_sizes), "r_label")
        .select(
            "label",
            F.col("c_size"),
            (2.0 * F.col("ol") / (F.col("c_size") + F.col("r_size"))).alias("f1"),
        )
        .groupBy("label", "c_size")
        .agg(F.max("f1").alias("f1"))
    )
    return (
        c_sizes.join(best.select("label", "f1"), "label", "left")
        .na.fill({"f1": 0.0})
        .select("label", F.col("c_size").alias("size"), "f1")
    )


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


def hashing_overlapper(
    graph: Graph, partitions: list[DataFrame]
) -> DataFrame:
    """HashingOverlapper (``cpp/overlap/HashingOverlapper.cpp:13-82``):
    combine partitions into their overlap (core) clustering by hashing
    per-node label tuples. The reference uses djb2 over raw label bits
    (two-partition case ``hash((l1^0xffff)<<16 | (l2^0xffff))``,
    k-way case a sum of masked hashes) and accepts hash collisions;
    here the label is a 64-bit ``xxhash64`` of the ordered label tuple
    — same overlap semantics, different (and far rarer) collision
    profile. :func:`partition_intersection` is the collision-free
    equivalent with compacted labels.
    """
    if not partitions:
        return graph.vertices.select("id", F.lit(0).cast("long").alias("label"))
    if len(partitions) == 1:
        return partitions[0].select("id", "label")
    out = partitions[0].select("id", F.col("label").alias("l0"))
    for i, p in enumerate(partitions[1:], start=1):
        out = out.join(
            p.select("id", F.col("label").alias(f"l{i}")), "id"
        )
    cols = [F.col(f"l{i}") for i in range(len(partitions))]
    return out.select(
        "id", F.xxhash64(*cols).alias("label")
    )


def dynamic_nmi_distance(
    graph: Graph, old_partition: DataFrame, new_partition: DataFrame
) -> float:
    """DynamicNMIDistance (``cpp/community/DynamicNMIDistance.cpp:
    28-110``): NMI dissimilarity (1 − NMI) between consecutive
    clusterings of a dynamic graph, computed over the nodes of the NEW
    graph that carry a label in BOTH partitions (``isInBoth``) — nodes
    added or removed between snapshots are excluded. Normalization
    follows this engine's :func:`nmi` (sqrt of entropies)."""
    common = (
        graph.vertices
        .join(old_partition.select("id", F.col("label").alias("lo")), "id")
        .join(new_partition.select("id", F.col("label").alias("ln")), "id")
        .localCheckpoint()
    )
    p_old = common.select("id", F.col("lo").alias("label"))
    p_new = common.select("id", F.col("ln").alias("label"))
    return 1.0 - nmi(p_old, p_new)
