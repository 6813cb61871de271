"""Clustering utilities — generators, tools, structural Rand measures.

Reference surface:

- ``cpp/community/ClusteringGenerator.cpp:15-88`` — fixture partitions
  (singleton, one, seeded random, continuous/non-continuous balanced).
  The balanced variants follow the reference's block-size rule
  ``n/k + (n % k > block)`` over the dense node order.
- ``cpp/community/GraphClusteringTools.cpp:9-110`` — imbalance,
  communication graph (INTER-cluster edges only, compacted labels),
  per-node cluster-restricted weighted degree (integer-truncated like
  the reference's ``count`` accumulator), proper/one/singleton
  predicates, edge-co-membership equality.
- ``cpp/community/GraphStructuralRandMeasure.cpp:12-36`` — Rand
  dissimilarity restricted to CONNECTED pairs (one pass over edges).
- ``cpp/community/Sampled{Node,Graph}StructuralRandMeasure.cpp`` —
  the sampled variants; pair draws here are seeded hash orders
  (deterministic at any parallelism; the reference draws from a global
  RNG, so streams differ by construction).

Partitions are ``(id, label)`` DataFrames throughout, like every other
community operator in this engine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph, zip_dense_rank
from networkit_spark.operators.dedup import portable_hash32


# ------------------------------------------------------------ generators
def make_singleton_clustering(graph: Graph) -> DataFrame:
    """``ClusteringGenerator::makeSingletonClustering``."""
    return graph.vertices.select("id", F.col("id").alias("label"))


def make_one_clustering(graph: Graph) -> DataFrame:
    """``ClusteringGenerator::makeOneClustering``."""
    return graph.vertices.select("id", F.lit(0).cast("long").alias("label"))


def make_random_clustering(graph: Graph, k: int, seed: int = 42) -> DataFrame:
    """``ClusteringGenerator::makeRandomClustering`` — uniform seeded
    label in [0, k)."""
    if k <= 0:
        raise ValueError("k must be positive")
    return graph.vertices.select(
        "id",
        (
            portable_hash32(F.col("id").cast("string"), f"rc{seed}")
            % F.lit(int(k))
        ).alias("label"),
    )


def _dense_positions(graph: Graph) -> DataFrame:
    """``(id, pos)`` — 0-based rank of node ids (the reference's node
    order is the dense 0..n-1 id range)."""
    return (
        graph.vertices.join(
            zip_dense_rank(graph.vertices, "id", "pos"), "id"
        )
    )


def make_continuous_balanced_clustering(graph: Graph, k: int) -> DataFrame:
    """``makeContinuousBalancedClustering`` — the first ``n % k`` blocks
    take ``n/k + 1`` consecutive nodes, the rest ``n/k``."""
    if k <= 0:
        raise ValueError("k must be positive")
    n = graph.number_of_nodes()
    q, r = divmod(n, k)
    pos = _dense_positions(graph)
    big = r * (q + 1)
    if q == 0:
        label = F.col("pos")  # every block holds at most one node
    else:
        label = F.when(
            F.col("pos") < big, F.floor(F.col("pos") / (q + 1))
        ).otherwise(r + F.floor((F.col("pos") - big) / q))
    return pos.select("id", label.cast("long").alias("label"))


def make_noncontinuous_balanced_clustering(graph: Graph, k: int) -> DataFrame:
    """``makeNoncontinuousBalancedClustering`` — node position mod k."""
    if k <= 0:
        raise ValueError("k must be positive")
    return _dense_positions(graph).select(
        "id", (F.col("pos") % k).cast("long").alias("label")
    )


# ----------------------------------------------------------------- tools
def get_imbalance(labels: DataFrame) -> float:
    """``GraphClusteringTools::getImbalance`` — max cluster size over
    ``ceil(n / #clusters)`` (float32 ceil like the reference)."""
    row = (
        labels.groupBy("label")
        .agg(F.count("*").alias("sz"))
        .agg(
            F.max("sz").alias("mx"),
            F.count("*").alias("k"),
            F.sum("sz").alias("n"),
        )
        .collect()[0]
    )
    avg = math.ceil(float(row["n"]) / float(row["k"]))
    return float(row["mx"]) / avg


def communication_graph(graph: Graph, labels: DataFrame) -> Graph:
    """``GraphClusteringTools::communicationGraph`` — compact the labels
    and keep only INTER-cluster edges, weights summed."""
    compact = zip_dense_rank(labels, "label", "super")
    mapping = labels.join(F.broadcast(compact), "label").select("id", "super")
    base = graph.edges if graph.directed else graph.canonical()
    contracted = (
        base.join(
            mapping.withColumnRenamed("id", "src").withColumnRenamed(
                "super", "su"
            ),
            "src",
        )
        .join(
            mapping.withColumnRenamed("id", "dst").withColumnRenamed(
                "super", "sv"
            ),
            "dst",
        )
        .where(F.col("su") != F.col("sv"))
        .select(
            F.least("su", "sv").alias("src"),
            F.greatest("su", "sv").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    return Graph(
        contracted,
        directed=False,
        weighted=True,
        vertices=mapping.select(F.col("super").alias("id")).distinct(),
    )


def weighted_degree_with_cluster(
    graph: Graph, labels: DataFrame, u: int, cid: int
) -> int:
    """``GraphClusteringTools::weightedDegreeWithCluster`` — weight of
    u's edges into cluster ``cid``, truncated to an integer count like
    the reference's ``count wdeg`` accumulator."""
    sym = graph.edges if graph.directed else graph.symmetrized()
    row = (
        sym.where(F.col("src") == int(u))
        .join(
            labels.withColumnRenamed("id", "dst"), "dst"
        )
        .where(F.col("label") == int(cid))
        .agg(
            F.sum(
                F.col("weight").cast("long")
                if graph.weighted
                else F.lit(1)
            ).alias("w")
        )
        .collect()[0]
    )
    return int(row["w"] or 0)


def is_proper_clustering(graph: Graph, labels: DataFrame) -> bool:
    """``isProperClustering`` — every node carries a label."""
    return (
        graph.vertices.join(labels, "id", "left_anti").limit(1).count() == 0
    )


def is_one_clustering(graph: Graph, labels: DataFrame) -> bool:
    """``isOneClustering``."""
    return labels.select("label").distinct().count() == 1


def is_singleton_clustering(graph: Graph, labels: DataFrame) -> bool:
    """``isSingletonClustering``."""
    return (
        labels.select("label").distinct().count() == graph.number_of_nodes()
    )


def equal_clusterings(
    zeta: DataFrame, eta: DataFrame, graph: Graph
) -> bool:
    """``equalClusterings`` — agreement of edge co-membership on every
    edge (the reference compares connected pairs only)."""
    z1 = zeta.withColumnRenamed("label", "l1")
    z2 = eta.withColumnRenamed("label", "l2")
    pairs = (
        graph.canonical()
        .select("src", "dst")
        .join(z1.withColumnRenamed("id", "src"), "src")
        .join(
            z1.withColumnRenamed("id", "dst").withColumnRenamed("l1", "m1"),
            "dst",
        )
        .join(z2.withColumnRenamed("id", "src"), "src")
        .join(
            z2.withColumnRenamed("id", "dst").withColumnRenamed("l2", "m2"),
            "dst",
        )
    )
    disagree = pairs.where(
        (F.col("l1") == F.col("m1")) != (F.col("l2") == F.col("m2"))
    )
    return disagree.limit(1).count() == 0


# -------------------------------------------------- structural Rand family
def graph_structural_rand_dissimilarity(
    graph: Graph, zeta: DataFrame, eta: DataFrame
) -> float:
    """``GraphStructuralRandMeasure::getDissimilarity`` — 1 − (e11 +
    e00)/m over the graph's edges; raises on edgeless graphs like the
    reference."""
    z1 = zeta.withColumnRenamed("label", "l1")
    z2 = eta.withColumnRenamed("label", "l2")
    agg = (
        graph.canonical()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .join(z1.withColumnRenamed("id", "src"), "src")
        .join(
            z1.withColumnRenamed("id", "dst").withColumnRenamed("l1", "m1"),
            "dst",
        )
        .join(z2.withColumnRenamed("id", "src"), "src")
        .join(
            z2.withColumnRenamed("id", "dst").withColumnRenamed("l2", "m2"),
            "dst",
        )
        .agg(
            F.count("*").alias("m"),
            F.count(
                F.when(
                    (F.col("l1") == F.col("m1"))
                    == (F.col("l2") == F.col("m2")),
                    F.lit(1),
                )
            ).alias("agree"),
        )
        .collect()[0]
    )
    if not agg["m"]:
        raise RuntimeError(
            "The graph-structural rand measure is not defined for graphs "
            "without edges."
        )
    return 1.0 - float(agg["agree"]) / float(agg["m"])


def sampled_node_structural_rand_dissimilarity(
    graph: Graph,
    zeta: DataFrame,
    eta: DataFrame,
    max_samples: int,
    seed: int = 42,
) -> float:
    """``SampledNodeStructuralRandMeasure::getDissimilarity`` —
    dissimilarity over ``max_samples`` seeded distinct node pairs
    (two independent hash orders zipped; the reference draws pairs
    from its global RNG — documented stream divergence)."""
    if max_samples <= 0:
        raise ValueError("max_samples must be positive")
    spark = graph.edges.sparkSession
    take = max_samples + 8  # headroom for u == v collisions
    a = [
        r["id"]
        for r in graph.vertices.select(
            "id", portable_hash32(F.col("id").cast("string"), f"ra{seed}").alias("h")
        ).orderBy("h", "id").limit(take).collect()
    ]
    b = [
        r["id"]
        for r in graph.vertices.select(
            "id", portable_hash32(F.col("id").cast("string"), f"rb{seed}").alias("h")
        ).orderBy("h", "id").limit(take).collect()
    ]
    pairs = [(u, v) for u, v in zip(a, b) if u != v][:max_samples]
    if len(pairs) < max_samples:
        # wrap the shorter stream against a shifted copy
        shift = [(u, v) for u, v in zip(a, b[1:] + b[:1]) if u != v]
        pairs = (pairs + shift)[:max_samples]
    pdf = spark.createDataFrame(pairs, "u long, v long")
    z1 = zeta.withColumnRenamed("label", "l1")
    z2 = eta.withColumnRenamed("label", "l2")
    agg = (
        pdf.join(z1.withColumnRenamed("id", "u"), "u")
        .join(z1.withColumnRenamed("id", "v").withColumnRenamed("l1", "m1"), "v")
        .join(z2.withColumnRenamed("id", "u"), "u")
        .join(z2.withColumnRenamed("id", "v").withColumnRenamed("l2", "m2"), "v")
        .agg(
            F.count("*").alias("n"),
            F.count(
                F.when(
                    (F.col("l1") == F.col("m1"))
                    == (F.col("l2") == F.col("m2")),
                    F.lit(1),
                )
            ).alias("agree"),
        )
        .collect()[0]
    )
    return 1.0 - float(agg["agree"]) / float(agg["n"])


def sampled_graph_structural_rand_dissimilarity(
    graph: Graph,
    zeta: DataFrame,
    eta: DataFrame,
    max_samples: int,
    seed: int = 42,
) -> float:
    """``SampledGraphStructuralRandMeasure::getDissimilarity`` — the
    connected-pairs variant: ``max_samples`` seeded edges."""
    if max_samples <= 0:
        raise ValueError("max_samples must be positive")
    edges = (
        graph.canonical()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            "src", "dst",
            portable_hash32(
                F.concat_ws(":", "src", "dst"), f"re{seed}"
            ).alias("h"),
        )
        .orderBy("h", "src", "dst")
        .limit(max_samples)
        .drop("h")
    )
    z1 = zeta.withColumnRenamed("label", "l1")
    z2 = eta.withColumnRenamed("label", "l2")
    agg = (
        edges.join(z1.withColumnRenamed("id", "src"), "src")
        .join(z1.withColumnRenamed("id", "dst").withColumnRenamed("l1", "m1"), "dst")
        .join(z2.withColumnRenamed("id", "src"), "src")
        .join(z2.withColumnRenamed("id", "dst").withColumnRenamed("l2", "m2"), "dst")
        .agg(
            F.count("*").alias("n"),
            F.count(
                F.when(
                    (F.col("l1") == F.col("m1"))
                    == (F.col("l2") == F.col("m2")),
                    F.lit(1),
                )
            ).alias("agree"),
        )
        .collect()[0]
    )
    if not agg["n"]:
        raise RuntimeError("no edges to sample")
    return 1.0 - float(agg["agree"]) / float(agg["n"])
