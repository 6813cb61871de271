"""Edge-score transforms + quadrangle counts + approx clustering
coefficients (``cpp/edgescores/``, ``cpp/global/ClusteringCoefficient.cpp``).

Edge scores are ``(u, v, score)`` DataFrames keyed by the canonical
edge (u < v) — the engine-wide analog of the reference's positional
``edgeid`` attribute vectors (``EdgeScore.hpp``).

- GeometricMeanScore (``GeometricMeanScore.cpp:18-40``): score /
  sqrt(incidentSum(u) · incidentSum(v)) for positive scores, else 0.
- EdgeScoreNormalizer (``EdgeScoreNormalizer.cpp:14-55``): affine
  [min,max] → [lower,upper] rescale, optional inversion; a constant
  score column raises (the reference emits ±inf there).
- EdgeScoreLinearizer (``EdgeScoreLinearizer.cpp:17-55``): score →
  rank/(m−1) with seeded-hash tie order (the reference uses RNG
  tie-break); m = 1 → 0.5.
- EdgeScoreBlender (``EdgeScoreBlender.cpp:15-27``): per-edge select
  between two score columns by a boolean selection column.
- EdgeScoreAsWeight (``EdgeScoreAsWeight.cpp:16-36``): new Graph with
  weight = offset + factor·score(²).
- ChibaNishizekiQuadrangleEdgeScore
  (``ChibaNishizekiQuadrangleEdgeScore.cpp:14-100``): per-edge 4-cycle
  counts. The anchor-once edge-deletion scan counts every quadrangle
  once per cycle, +1 on each of its 4 edges; the closed form per edge
  (a,b) is Σ_{w ∈ N(b)∖{a}} (|N(a) ∩ N(w)| − 1), computed here as a
  wedge-count join (the same Θ(Σ deg²) work the reference pays).
- ClusteringCoefficient::approxAvgLocal
  (``ClusteringCoefficient.cpp:134-165``): sample nodes of degree ≥ 2
  (uniform over that set, seeded), pick two distinct random neighbors,
  test closure — one batched join pipeline for all trials.
- ClusteringCoefficient::approxGlobal
  (``ClusteringCoefficient.cpp:221-267``): nodes drawn ∝ deg(deg−1)
  via inverse-CDF over the degree-weight prefix sums, then the same
  closure test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph, zip_dense_rank
from networkit_spark.operators.dedup import portable_hash32


def _check_scores(scores: DataFrame) -> DataFrame:
    cols = set(scores.columns)
    if not {"u", "v", "score"} <= cols:
        raise ValueError("edge scores need (u, v, score) columns")
    return scores.select("u", "v", "score")


def geometric_mean_score(graph: Graph, scores: DataFrame) -> DataFrame:
    """``GeometricMeanScore`` — normalize each edge score by the
    geometric mean of its endpoints' incident score sums."""
    s = _check_scores(scores)
    incident = (
        s.select(F.col("u").alias("id"), "score")
        .unionAll(s.select(F.col("v").alias("id"), "score"))
        .groupBy("id")
        .agg(F.sum("score").alias("ns"))
    )
    return (
        s.join(incident.withColumnRenamed("id", "u").withColumnRenamed("ns", "nu"), "u")
        .join(incident.withColumnRenamed("id", "v").withColumnRenamed("ns", "nv"), "v")
        .select(
            "u", "v",
            F.when(
                (F.col("score") > 0) & (F.col("nu") * F.col("nv") > 0),
                F.col("score") / F.sqrt(F.col("nu") * F.col("nv")),
            )
            .when(F.col("score") > 0, F.lit(float("nan")))
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )


def normalize_edge_scores(
    graph: Graph,
    scores: DataFrame,
    lower: float = 0.0,
    upper: float = 1.0,
    invert: bool = False,
) -> DataFrame:
    """``EdgeScoreNormalizer`` — affine rescale of the score range."""
    s = _check_scores(scores)
    row = s.agg(F.min("score").alias("mn"), F.max("score").alias("mx")).collect()[0]
    mn, mx = float(row["mn"]), float(row["mx"])
    if mx == mn:
        raise ValueError(
            "constant score column cannot be normalized (the reference "
            "divides by zero here)"
        )
    factor = (upper - lower) / (mx - mn)
    offset = lower - mn * factor
    if invert:
        factor = -factor
        offset = upper - mn * factor
    return s.select(
        "u", "v", (F.lit(factor) * F.col("score") + F.lit(offset)).alias("score")
    )


def linearize_edge_scores(
    graph: Graph, scores: DataFrame, inverse: bool = False, seed: int = 42
) -> DataFrame:
    """``EdgeScoreLinearizer`` — score = sort position / (m − 1); ties
    in seeded-hash order (partitioning-independent)."""
    s = _check_scores(scores)
    m = s.count()
    if m == 0:
        return s
    if m == 1:
        return s.select("u", "v", F.lit(0.5).alias("score"))
    tie = portable_hash32(F.concat_ws(":", "u", "v"), f"lin{seed}")
    keyed = s.select("u", "v", "score", tie.alias("t"))
    # distributed rank: range-sort + per-partition offsets, no global
    # single-partition window (same shape as zip_dense_rank)
    order = [F.col("score"), F.col("t"), F.col("u"), F.col("v")]
    if inverse:
        order = [c.desc() for c in order]
    spark = s.sparkSession
    rdd = keyed.orderBy(*order).rdd.zipWithIndex()
    ranked = spark.createDataFrame(
        rdd.map(lambda p: (p[0]["u"], p[0]["v"], p[1])),
        "u long, v long, pos long",
    )
    return ranked.select(
        "u", "v", (F.col("pos") / F.lit(float(m - 1))).alias("score")
    )


def blend_edge_scores(
    graph: Graph,
    scores0: DataFrame,
    scores1: DataFrame,
    selection: DataFrame,
) -> DataFrame:
    """``EdgeScoreBlender`` — per-edge pick of ``scores1`` where the
    ``(u, v, sel)`` frame is true, else ``scores0``."""
    s0 = _check_scores(scores0).withColumnRenamed("score", "s0")
    s1 = _check_scores(scores1).withColumnRenamed("score", "s1")
    return (
        s0.join(s1, ["u", "v"])
        .join(selection.select("u", "v", "sel"), ["u", "v"])
        .select(
            "u", "v",
            F.when(F.col("sel"), F.col("s1")).otherwise(F.col("s0")).alias("score"),
        )
    )


def edge_score_as_weight(
    graph: Graph,
    scores: DataFrame,
    squared: bool = False,
    offset: float = 1.0,
    factor: float = 1.0,
) -> Graph:
    """``EdgeScoreAsWeight::calculate`` — weighted copy of the graph
    with weight = offset + factor · score(²)."""
    s = _check_scores(scores)
    term = F.col("score") * F.col("score") if squared else F.col("score")
    new_edges = (
        graph.canonical()
        .select("src", "dst")
        .join(
            s.select(
                F.col("u").alias("src"), F.col("v").alias("dst"), "score"
            ),
            ["src", "dst"],
        )
        .select(
            "src", "dst", (F.lit(offset) + F.lit(factor) * term).alias("weight")
        )
    )
    return Graph(
        new_edges, directed=False, weighted=True, vertices=graph.vertices
    )


def quadrangle_edge_scores(graph: Graph) -> DataFrame:
    """``ChibaNishizekiQuadrangleEdgeScore`` — per-edge 4-cycle count:
    Σ_{w ∈ N(b)∖{a}} (cn(a, w) − 1) over paths a–b–w, where cn is the
    common-neighbor count (b itself is always one of them)."""
    if graph.directed:
        raise ValueError("quadrangle counting needs an undirected graph")
    sym = (
        graph.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    # common-neighbor counts for every 2-hop pair (x, y), x != y
    cn = (
        sym.select(F.col("dst").alias("m"), F.col("src").alias("x"))
        .join(sym.select(F.col("dst").alias("m"), F.col("src").alias("y")), "m")
        .where(F.col("x") != F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("cn"))
    )
    # paths a–b–w: edge (a,b) with w ∈ N(b)\{a}, scored by cn(a,w)−1
    per_edge = (
        sym.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(sym.select(F.col("src").alias("b"), F.col("dst").alias("w")), "b")
        .where(F.col("w") != F.col("a"))
        .join(
            cn.select(F.col("x").alias("a"), F.col("y").alias("w"), "cn"),
            ["a", "w"],
        )
        .groupBy(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .agg((F.sum(F.col("cn") - 1) / 2).cast("long").alias("q"))
    )
    canon = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    out = canon.join(per_edge, ["u", "v"], "left").select(
        "u", "v", F.coalesce("q", F.lit(0)).alias("score")
    )
    sym.unpersist()
    return out


def chiba_nishizeki_triangle_edge_scores(graph: Graph) -> DataFrame:
    """``ChibaNishizekiTriangleEdgeScore.cpp:16-120`` — per-edge triangle
    counts via the Chiba–Nishizeki degree-bucketed neighbor-marking scan.
    The scan order is a sequential-machine detail; the RESULT (number of
    triangles containing each edge) is identical to ``TriangleEdgeScore``,
    so this delegates to the engine's degree-oriented wedge-join
    implementation (``operators/triangles.TriangleEdgeScore``) and exists
    as the reference-name alias. Returns ``(u, v, score)`` on canonical
    edges."""
    from networkit_spark.operators.triangles import TriangleEdgeScore

    return TriangleEdgeScore(graph).run().edge_scores()


def _closure_fraction(graph: Graph, draws: DataFrame, seed: int) -> float:
    """Shared tail of the approx clustering coefficients: per (trial,
    node) draw two distinct seeded-uniform neighbors, return the
    fraction of closed wedges."""
    sym = (
        graph.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    r = (
        portable_hash32(
            F.concat_ws("|", F.col("trial"), F.col("dst")), f"accn{seed}"
        )
    )
    w_rank = Window.partitionBy("trial").orderBy("r", "dst")
    picks = (
        draws.withColumnRenamed("id", "src")
        .join(sym, "src")
        .select("trial", "dst", r.alias("r"))
        .withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 2)
    )
    pairs = (
        picks.groupBy("trial")
        .agg(F.min("dst").alias("a"), F.max("dst").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    closed = pairs.join(
        sym.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_semi",
    ).count()
    total = pairs.count()
    return closed / total if total else 0.0


def approx_avg_local_clustering(
    graph: Graph, trials: int, seed: int = 42
) -> float:
    """``ClusteringCoefficient::approxAvgLocal`` — closure fraction of
    wedges at uniformly sampled degree-≥2 nodes."""
    if trials <= 0:
        raise ValueError("trials must be positive")
    spark = graph.edges.sparkSession
    eligible = graph.degrees().where(F.col("out_deg") >= 2).select("id")
    n2 = eligible.count()
    if n2 == 0:
        return 0.0
    pos = eligible.join(zip_dense_rank(eligible, "id", "pos"), "id")
    trials_df = spark.range(trials).select(
        F.col("id").alias("trial"),
        (
            portable_hash32(F.col("id").cast("string"), f"acct{seed}")
            % F.lit(int(n2))
        ).alias("pos"),
    )
    draws = trials_df.join(F.broadcast(pos) if n2 < 1_000_000 else pos, "pos").select(
        "trial", "id"
    )
    return _closure_fraction(graph, draws, seed)


def approx_global_clustering(
    graph: Graph, trials: int, seed: int = 42
) -> float:
    """``ClusteringCoefficient::approxGlobal`` — same closure test with
    nodes drawn ∝ deg·(deg−1) (inverse CDF over the weight prefix
    sums, exactly the reference's binary search)."""
    if trials <= 0:
        raise ValueError("trials must be positive")
    spark = graph.edges.sparkSession
    weights = (
        graph.degrees()
        .where(F.col("out_deg") >= 2)
        .select(
            "id",
            (F.col("out_deg") * (F.col("out_deg") - 1)).alias("w"),
        )
    )
    # prefix sums via range-sort + per-partition offsets
    rows = weights.orderBy("id").rdd.zipWithIndex().map(
        lambda p: (p[0]["id"], p[0]["w"])
    )
    # running total computed with one pass over partition sums
    sums = rows.map(lambda p: p[1])
    psum = sums.sum()
    if psum == 0:
        return 0.0
    parts = sums.mapPartitionsWithIndex(
        lambda i, it: [(i, sum(it))]
    ).collect()
    offsets = {}
    acc = 0
    for i, s in sorted(parts):
        offsets[i] = acc
        acc += s

    def attach(i, it):
        c = offsets[i]
        for nid, w in it:
            yield (nid, c, c + w)
            c += w

    ranges = spark.createDataFrame(
        rows.mapPartitionsWithIndex(attach),
        "id long, lo long, hi long",
    )
    trials_df = spark.range(trials).select(
        F.col("id").alias("trial"),
        (
            portable_hash32(F.col("id").cast("string"), f"accg{seed}")
            % F.lit(int(psum))
        ).alias("r"),
    )
    draws = trials_df.join(
        ranges,
        (F.col("r") >= F.col("lo")) & (F.col("r") < F.col("hi")),
    ).select("trial", "id")
    return _closure_fraction(graph, draws, seed)


def prefix_jaccard_scores(graph: Graph, scores: DataFrame) -> DataFrame:
    """PrefixJaccardScore (``cpp/edgescores/PrefixJaccardScore.cpp:
    20-150``): per edge (u, v), rank both endpoints' neighbor lists by
    the edge attribute descending (ties share a rank = the count of
    strictly-greater entries, the reference's ``curRank`` rule), and
    return the BEST Jaccard coefficient over all rank prefixes, with u
    and v excluded from each other's lists.

    Closed form: the prefix Jaccard can only attain its maximum at a
    level where a COMMON neighbor enters (non-common entries only grow
    the union), so the candidate levels are ``r_w = max(rank_u(w),
    rank_v(w))`` over common neighbors w, and per candidate level
    ``J(r) = cn(r) / (pu(r) + pv(r) − cn(r))`` — three prefix counts
    per (edge, level) computed by rank-bounded joins. Work is
    Θ(Σ_e triangles(e) · deg) at worst — the same neighborhood-merge
    regime as the reference's per-edge scans. Edges with no common
    neighbor score 0 (the reference's ``bestJaccard = 0`` initial)."""
    from pyspark.sql import Window

    if graph.directed:
        raise ValueError("PrefixJaccardScore needs an undirected graph")
    s = _check_scores(scores)
    # symmetric ranked adjacency with the attribute
    half = s.select(F.col("u").alias("a"), F.col("v").alias("b"), "score")
    sym = half.unionAll(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"), "score")
    )
    w_rank = Window.partitionBy("a").orderBy(
        F.desc("score"), F.asc("b")
    )
    # rank = number of strictly greater attributes (ties share):
    # Spark's rank() is 1-based with gaps → rank()-1 over score-only
    # ordering; the u/att/id tie fields in the reference's RankedEdge
    # only order the scan, not the rank value itself
    w_val = Window.partitionBy("a").orderBy(F.desc("score"))
    ranked = sym.select(
        "a", "b", (F.rank().over(w_val) - 1).alias("rk")
    ).persist()

    canon = s.select("u", "v")
    ru = ranked.select(F.col("a").alias("u"), F.col("b").alias("w"),
                       F.col("rk").alias("rk_u"))
    rv = ranked.select(F.col("a").alias("v"), F.col("b").alias("w"),
                       F.col("rk").alias("rk_v"))
    commons = (
        canon.join(ru, "u")
        .where(F.col("w") != F.col("v"))
        .join(rv, ["v", "w"])
        .where(F.col("w") != F.col("u"))
        .select(
            "u", "v", "w",
            F.greatest("rk_u", "rk_v").alias("lvl"),
        )
        .persist()
    )
    levels = commons.select("u", "v", "lvl").distinct()
    # cn(lvl): commons entering at or below the level
    cn = (
        levels.join(commons.withColumnRenamed("lvl", "wl"), ["u", "v"])
        .where(F.col("wl") <= F.col("lvl"))
        .groupBy("u", "v", "lvl")
        .agg(F.count("*").alias("cn"))
    )
    # pu(lvl)/pv(lvl): prefix sizes excluding the opposite endpoint
    pu = (
        levels.join(ru, "u")
        .where((F.col("w") != F.col("v")) & (F.col("rk_u") <= F.col("lvl")))
        .groupBy("u", "v", "lvl")
        .agg(F.count("*").alias("pu"))
    )
    pv = (
        levels.join(rv, "v")
        .where((F.col("w") != F.col("u")) & (F.col("rk_v") <= F.col("lvl")))
        .groupBy("u", "v", "lvl")
        .agg(F.count("*").alias("pv"))
    )
    best = (
        cn.join(pu, ["u", "v", "lvl"])
        .join(pv, ["u", "v", "lvl"])
        .select(
            "u", "v",
            (
                F.col("cn").cast("double")
                / (F.col("pu") + F.col("pv") - F.col("cn"))
            ).alias("j"),
        )
        .groupBy("u", "v")
        .agg(F.max("j").alias("score"))
    )
    out = canon.join(best, ["u", "v"], "left").select(
        "u", "v", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    ranked.unpersist()
    commons.unpersist()
    return out
