"""Deterministic graph generators as DataFrame producers.

Mirrors the reference's generator module used for test fixtures
(``cpp/generators/ErdosRenyiGenerator.cpp``,
``ClusteredRandomGraphGenerator.cpp``, ``RmatGenerator.cpp``) — but as
seeded, reproducible DataFrame programs: ``spark.range`` + arithmetic
hash-based sampling, no driver-side loops, so the same generator runs
unchanged at 10^9 nodes on a cluster. The hash is ``xxhash64`` (a Spark
built-in, stable across runs/partitionings for fixed input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import Graph

# xxhash64 returns a signed 64-bit value; map to [0,1) uniformly
_U64_SPAN = 2.0**64


def _unit_hash(*cols) -> F.Column:
    """Deterministic uniform [0,1) from hashed columns."""
    h = F.xxhash64(*cols)
    return (h.cast("double") + F.lit(2.0**63)) / F.lit(_U64_SPAN)


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = False
) -> Graph:
    """G(n, p): each (unordered) pair kept independently with prob p.

    Pairs are enumerated as ``spark.range(n*n)`` decomposed to (u,v) —
    fine for test sizes; the crossJoin-free arithmetic keeps it a single
    narrow scan. Undirected keeps u<v pairs only.
    """
    pairs = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("src"),
        (F.col("id") % n).alias("dst").cast("long"),
    )
    if directed:
        pairs = pairs.where(F.col("src") != F.col("dst"))
    else:
        pairs = pairs.where(F.col("src") < F.col("dst"))
    edges = pairs.where(_unit_hash(F.col("src"), F.col("dst"), F.lit(seed)) < p)
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(
        edges.withColumn("weight", F.lit(1.0)),
        directed=directed,
        vertices=verts,
    )


def clustered_random(
    spark: SparkSession,
    n: int,
    k: int,
    p_in: float,
    p_out: float,
    seed: int = 42,
) -> tuple[Graph, DataFrame]:
    """Planted-partition graph (``ClusteredRandomGraphGenerator.cpp``):
    n nodes in k equal clusters; intra-cluster pairs with p_in,
    inter-cluster with p_out. Returns (graph, ground_truth(id, label)).
    Used for PLP recovery tests (``CommunityGTest.cpp:67-86,125-147``)."""
    cluster = (F.col("id") % k).alias("label")
    truth = spark.range(n).select(F.col("id").cast("long"), cluster)
    pairs = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("src"),
        (F.col("id") % n).cast("long").alias("dst"),
    ).where(F.col("src") < F.col("dst"))
    same = (F.col("src") % k) == (F.col("dst") % k)
    u = _unit_hash(F.col("src"), F.col("dst"), F.lit(seed))
    edges = pairs.where(
        (same & (u < p_in)) | (~same & (u < p_out))
    ).withColumn("weight", F.lit(1.0))
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, vertices=verts), truth


def rmat_like(
    spark: SparkSession,
    scale: int = 14,
    avg_degree: int = 16,
    seed: int = 42,
    directed: bool = True,
) -> Graph:
    """RMAT-style skewed web graph (``cpp/generators/RmatGenerator.cpp``),
    expressed without iteration: endpoints drawn from a power-law-ish
    distribution by exponentiating a uniform hash. Hub vertices exist by
    construction — the fixture for skew handling (salting /
    degree-orientation) and the bench input.

    n = 2^scale nodes, m = n·avg_degree edges; endpoint id
    = floor(n · u^3) concentrates mass near id 0 (Zipf-like tail).
    """
    n = 1 << scale
    m = n * avg_degree
    eid = spark.range(m)
    u_src = _unit_hash(F.col("id"), F.lit(seed), F.lit(1))
    u_dst = _unit_hash(F.col("id"), F.lit(seed), F.lit(2))
    edges = eid.select(
        (F.pow(u_src, 3.0) * n).cast("long").alias("src"),
        (F.pow(u_dst, 3.0) * n).cast("long").alias("dst"),
    ).withColumn("weight", F.lit(1.0))
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=directed, vertices=verts)
