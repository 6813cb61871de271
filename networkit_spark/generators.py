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


def chung_lu(
    spark: SparkSession,
    n: int,
    exponent: float = 2.5,
    avg_degree: float = 8.0,
    seed: int = 42,
) -> Graph:
    """Chung-Lu expected-degree model (``cpp/generators/
    ChungLuGenerator.cpp``): undirected pair (u,v) kept with probability
    ``min(1, w_u·w_v / S)`` where ``S = Σ w``. Weights follow a
    deterministic power law ``w_i ∝ (i+1)^(-1/(exponent-1))`` scaled to
    the requested average degree — the standard web-graph degree profile.

    Pair enumeration is the same ``spark.range(n²)`` scan as
    :func:`erdos_renyi` (test scale); at cluster scale one would switch
    to per-node binomial sampling, the plan shape stays a narrow scan.
    """
    alpha = 1.0 / (exponent - 1.0)
    # driver-side closed form for the normalization (exact, no data scan);
    # w_i = c·(i+1)^-alpha with c chosen so Σ w = n·avg_degree
    s = sum((i + 1.0) ** -alpha for i in range(n))
    c = n * avg_degree / s
    pairs = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("src"),
        (F.col("id") % n).cast("long").alias("dst"),
    ).where(F.col("src") < F.col("dst"))
    wu = F.pow(F.col("src") + 1.0, -alpha) * c
    wv = F.pow(F.col("dst") + 1.0, -alpha) * c
    p = F.least(F.lit(1.0), wu * wv / F.lit(n * avg_degree))
    edges = pairs.where(_unit_hash(F.col("src"), F.col("dst"), F.lit(seed)) < p)
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges.withColumn("weight", F.lit(1.0)), directed=False, vertices=verts)


def watts_strogatz(
    spark: SparkSession, n: int, k: int = 4, p: float = 0.1, seed: int = 42
) -> Graph:
    """Watts-Strogatz small world (``cpp/generators/
    WattsStrogatzGenerator.cpp``): ring lattice (each node linked to the
    next k/2 ids) with each edge's far endpoint rewired to a uniform
    random node with probability p. One ``spark.range(n·k/2)`` scan.
    """
    half = max(1, k // 2)
    base = spark.range(n * half).select(
        (F.col("id") / half).cast("long").alias("src"),
        (
            ((F.col("id") / half).cast("long") + F.col("id") % half + 1) % n
        ).alias("ring_dst"),
    )
    u_rewire = _unit_hash(F.col("src"), F.col("ring_dst"), F.lit(seed), F.lit(1))
    u_target = _unit_hash(F.col("src"), F.col("ring_dst"), F.lit(seed), F.lit(2))
    dst = F.when(
        u_rewire < p, (u_target * n).cast("long")
    ).otherwise(F.col("ring_dst").cast("long"))
    edges = (
        base.select(F.col("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, vertices=verts)


def barabasi_albert_like(
    spark: SparkSession, n: int, k: int = 3, seed: int = 42
) -> Graph:
    """BA-style preferential attachment (``cpp/generators/
    BarabasiAlbertGenerator.cpp``). True PA is sequential (each edge
    depends on the running degree sequence); the standard scalable
    stand-in with the same stationary degree law is the *copying model*:
    node i attaches its c-th edge to ``j = floor(i · u²)`` — quadratic
    concentration toward early (high-degree) ids reproduces the rich-get-
    richer tail without sequential state. Deterministic per (i, c, seed).
    """
    rows = spark.range(k, n * k).select(
        (F.col("id") / k).cast("long").alias("src"),
        (F.col("id") % k).alias("c"),
    ).where(F.col("src") >= 1)
    u = _unit_hash(F.col("src"), F.col("c"), F.lit(seed))
    edges = (
        rows.select(
            "src", (F.pow(u, 2.0) * F.col("src")).cast("long").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, vertices=verts)


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
