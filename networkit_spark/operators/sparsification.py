"""Edge sparsification — per-edge scores + threshold filters.

Reference surface (``networkit/sparsification.pyx:32-1272``): a family of
edge scorers + ``GlobalThresholdFilter`` (``sparsification.pyx:619``)
that keeps edges whose score passes a threshold. In scope per SURVEY
§2.9: ``TriangleEdgeScore`` (implemented in
:mod:`networkit_spark.operators.triangles`) and the filter; plus the
degree-product scorer used by several methods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def global_threshold_filter(
    graph: Graph,
    edge_scores: DataFrame,
    threshold: float,
    above: bool = True,
) -> Graph:
    """``GlobalThresholdFilter(G, scores, e, above)``
    (``networkit/sparsification.pyx:619-647``): keep canonical edges with
    score ≥ threshold (``above=True``) or ≤ threshold.

    ``edge_scores`` is ``(u, v, score)`` keyed by canonical edge (u<v for
    undirected). One equi-join + filter; Catalyst pushes the comparison
    into the join's output projection.
    """
    canon = graph.canonical() if not graph.directed else graph.edges
    keyed = canon.join(
        edge_scores.select(
            F.col("u").alias("src"), F.col("v").alias("dst"), "score"
        ),
        ["src", "dst"],
        "left",
    )
    cond = (
        F.coalesce("score", F.lit(0.0)) >= threshold
        if above
        else F.coalesce("score", F.lit(0.0)) <= threshold
    )
    kept = keyed.where(cond).select("src", "dst", "weight")
    return Graph(kept, directed=graph.directed, weighted=graph.weighted,
                 vertices=graph.vertices)


def degree_product_scores(graph: Graph) -> DataFrame:
    """``(u, v, score)`` with score = deg(u)·deg(v) — the
    preferential-attachment edge scorer several sparsifiers share."""
    deg = graph.degrees().select("id", "out_deg")
    canon = graph.canonical() if not graph.directed else graph.edges
    du = deg.select(F.col("id").alias("src"), F.col("out_deg").alias("du"))
    dv = deg.select(F.col("id").alias("dst"), F.col("out_deg").alias("dv"))
    return (
        canon.join(du, "src")
        .join(dv, "dst")
        .select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            (F.col("du") * F.col("dv")).cast("double").alias("score"),
        )
    )


def scan_similarity_scores(
    graph: Graph, triangle_scores: DataFrame | None = None
) -> DataFrame:
    """``SCANStructuralSimilarityScore`` (``cpp/sparsification/
    SCANStructuralSimilarityScore.cpp:10-16``): per canonical edge
    ``score = (triangles(u,v) + 1) / sqrt((deg(u)+1) * (deg(v)+1))``.

    The reference takes precomputed per-edge triangle counts (the
    ``TriangleEdgeScore`` output); pass ``triangle_scores`` as
    ``(u, v, score)`` to reuse one, else it is computed here. One
    wedge-join (bounded by degree orientation) plus two degree joins —
    the skew story is the orientation, exactly as in triangle counting.

    Returns ``(u, v, score)`` over canonical edges.
    """
    if triangle_scores is None:
        from networkit_spark.operators.triangles import TriangleEdgeScore

        triangle_scores = TriangleEdgeScore(graph).run().edge_scores()
    deg = (
        graph.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    return (
        triangle_scores.select("u", "v", F.col("score").alias("tri"))
        .join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            (
                (F.col("tri") + 1)
                / F.sqrt((F.col("du") + 1) * (F.col("dv") + 1))
            ).alias("score"),
        )
    )


def _simple_degrees(graph: Graph) -> DataFrame:
    """``(id, d)`` simple-graph degree (distinct neighbors, no loops)."""
    return (
        graph.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
    )


def _with_endpoint_degrees(graph: Graph, triangle_scores: DataFrame | None):
    """Per-edge triangle counts joined with both endpoint degrees:
    ``(u, v, tri, du, dv)`` — the shared input of the Jaccard and
    chance-corrected scorers."""
    if triangle_scores is None:
        from networkit_spark.operators.triangles import TriangleEdgeScore

        triangle_scores = TriangleEdgeScore(graph).run().edge_scores()
    deg = _simple_degrees(graph)
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    return (
        triangle_scores.select("u", "v", F.col("score").alias("tri"))
        .join(du, "u")
        .join(dv, "v")
    )


def jaccard_similarity_scores(
    graph: Graph, triangle_scores: DataFrame | None = None
) -> DataFrame:
    """Neighborhood Jaccard per canonical edge:
    ``score = t / (deg(u) + deg(v) - t)`` with ``t`` the common-neighbor
    count — the similarity used by ``JaccardSimilaritySparsifier``
    (``networkit/sparsification.pyx:983-1004``); the reference's
    ``JaccardDistance`` returns ``1 - score``
    (``cpp/distance/JaccardDistance.cpp:38-40``).

    Returns ``(u, v, score)``; pure joins over the per-edge triangle
    counts and the two endpoint degrees.
    """
    return _with_endpoint_degrees(graph, triangle_scores).select(
        "u",
        "v",
        (
            F.col("tri")
            / (F.col("du") + F.col("dv") - F.col("tri")).cast("double")
        ).alias("score"),
    )


def chance_corrected_triangle_scores(
    graph: Graph, triangle_scores: DataFrame | None = None
) -> DataFrame:
    """``ChanceCorrectedTriangleScore`` (``cpp/sparsification/
    ChanceCorrectedTriangleScore.cpp:22-28``): per canonical edge

    - ``t > 0`` → ``t · (n - 2) / ((deg(u) - 1) · (deg(v) - 1))``
    - ``t = 0`` and either endpoint has degree 1 → ``1.0``
    - otherwise ``0.0``

    (the expected triangle count of a random edge between nodes of the
    same degrees; degree-1 endpoints cannot close triangles at all, so
    the edge is kept by convention).
    """
    n = graph.number_of_nodes()
    return _with_endpoint_degrees(graph, triangle_scores).select(
        "u",
        "v",
        F.when(
            F.col("tri") > 0,
            F.col("tri")
            * F.lit(float(n - 2))
            / ((F.col("du") - 1) * (F.col("dv") - 1)).cast("double"),
        )
        .when((F.col("du") == 1) | (F.col("dv") == 1), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("score"),
    )


def local_degree_scores(graph: Graph) -> DataFrame:
    """``LocalDegreeScore`` (``cpp/sparsification/LocalDegreeScore.cpp:
    38-88``): per node i (degree d), rank its neighbors by degree
    descending with competition ranking (ties share the smallest rank);
    edge score from i's side is ``1 - log(rank)/log(d)`` (1.0 when
    d ≤ 1); the undirected edge keeps the max over both endpoints.

    Skew-free plan: the rank of a neighbor with degree x equals
    ``1 + #neighbors of i with degree > x``, so the window runs over
    **distinct neighbor degrees per node** (groupBy(src, d) + cumulative
    count — the same shape as the k-core h-index pass), never over a
    hub's full neighbor list; the per-edge rank is then a join on
    ``(src, neighbor_degree)``.

    Returns ``(u, v, score)`` over canonical edges.
    """
    from pyspark.sql import Window

    deg = (
        graph.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    sym = (
        graph.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    dd = deg.select(F.col("id").alias("dst"), F.col("d").alias("d_dst"))
    ds = deg.select(F.col("id").alias("src"), F.col("d").alias("d_src"))
    j = sym.join(dd, "dst").join(ds, "src")
    # competition rank via cumulative counts over DISTINCT degree values
    per_val = j.groupBy("src", "d_src", "d_dst").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        Window.partitionBy("src")
        .orderBy(F.desc("d_dst"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_val.withColumn(
        "rnk", F.sum("c").over(w) - F.col("c") + 1
    )
    e = F.when(
        F.col("d_src") > 1,
        1.0 - F.log(F.col("rnk").cast("double")) / F.log(F.col("d_src").cast("double")),
    ).otherwise(F.lit(1.0))
    scored = j.join(ranked.select("src", "d_dst", "rnk"), ["src", "d_dst"]).select(
        "src", "dst", e.alias("e")
    )
    return (
        scored.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            "e",
        )
        .groupBy("u", "v")
        .agg(F.max("e").alias("score"))
    )


def local_similarity_scores(
    graph: Graph, triangle_scores: DataFrame | None = None
) -> DataFrame:
    """``LocalSimilarityScore`` (``cpp/sparsification/
    LocalSimilarityScore.cpp:17-66``): per node i, rank neighbors by
    similarity ``sim = tri(i,j) / (deg(i) + deg(j) - tri(i,j))``
    descending (ties → smaller neighbor id first, the
    ``AttributizedEdge`` comparator, ``LocalSimilarityScore.hpp:26-29``),
    ordinal rank; per-endpoint exponent ``e = 1`` if ``deg(i) <= 1``
    else ``1 - log(rank)/log(deg(i))``; the edge keeps the max over both
    endpoints.

    The ordinal rank is a per-node window — the same per-node neighbor
    sort the reference does; at web scale a 10^8-degree hub serializes
    one window partition, so hub rows should be handled via the
    two-stage distinct-value ranking of :func:`local_degree_scores` if
    similarity values are discretized. Returns ``(u, v, score)``.
    """
    from pyspark.sql import Window

    if triangle_scores is None:
        from networkit_spark.operators.triangles import TriangleEdgeScore

        triangle_scores = TriangleEdgeScore(graph).run().edge_scores()
    deg = (
        graph.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    tri = triangle_scores.select("u", "v", F.col("score").alias("tri"))
    # both directions: each endpoint ranks the edge in its own list
    both = tri.unionAll(
        tri.select(F.col("v").alias("u"), F.col("u").alias("v"), "tri")
    )
    di = deg.select(F.col("id").alias("u"), F.col("d").alias("di"))
    dj = deg.select(F.col("id").alias("v"), F.col("d").alias("dj"))
    j = both.join(di, "u").join(dj, "v").withColumn(
        "sim",
        F.col("tri") / (F.col("di") + F.col("dj") - F.col("tri")),
    )
    w = Window.partitionBy("u").orderBy(F.desc("sim"), F.asc("v"))
    ranked = j.withColumn("rnk", F.row_number().over(w))
    e = F.when(F.col("di") <= 1, F.lit(1.0)).otherwise(
        1.0 - F.log(F.col("rnk").cast("double")) / F.log(F.col("di").cast("double"))
    )
    return (
        ranked.select(
            F.least("u", "v").alias("cu"),
            F.greatest("u", "v").alias("cv"),
            e.alias("e"),
        )
        .groupBy(F.col("cu").alias("u"), F.col("cv").alias("v"))
        .agg(F.max("e").alias("score"))
    )


def multiscale_scores(graph: Graph) -> DataFrame:
    """``MultiscaleScore`` (``cpp/sparsification/MultiscaleScore.cpp:
    14-62``): per endpoint u with degree k, normalize the edge weight
    within N(u) (``p = w / Σ_{v∈N(u)} w``); the edge's significance from
    u's side is ``1 - (1 - p)^(k-1)``; keep the max over both endpoints.
    Pure hash aggregations — per-node sums then a join, no windows, so
    hub degrees stream through partial aggregation. Returns
    ``(u, v, score)`` over canonical edges.
    """
    sym = (
        graph.symmetrized()
        .select("src", "dst", "weight")
        .where(F.col("src") != F.col("dst"))
    )
    per_node = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("wsum"), F.count(F.lit(1)).alias("k")
    )
    j = sym.join(per_node, sym.src == per_node.id).select(
        "src",
        "dst",
        (
            1.0
            - F.pow(
                1.0 - F.col("weight") / F.col("wsum"),
                (F.col("k") - 1).cast("double"),
            )
        ).alias("p"),
    )
    return (
        j.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            "p",
        )
        .groupBy("u", "v")
        .agg(F.max("p").alias("score"))
    )


def simmelian_overlap_scores(
    graph: Graph,
    max_rank: int = 10,
    triangle_scores: DataFrame | None = None,
) -> DataFrame:
    """Parametric Simmelian backbone overlap per canonical edge
    (``cpp/sparsification/SimmelianOverlapScore.cpp:16-31``,
    ``SimmelianScore.cpp:16-118``).

    Each node ranks its neighbors by the triangle count of the
    connecting edge ("simmelianness"), strongest first, with
    competition ranking (rank 0 best; ties share a rank; next rank
    skips by group size — ``SimmelianScore.cpp:29-42``). The score of
    edge (u, v) is the number of common neighbors w with
    ``rank_u(w) <= max_rank`` AND ``rank_v(w) <= max_rank`` — the
    incremental set-matching in ``getOverlap`` computes exactly this
    prefix intersection.

    Spark plan: triangle edge scores → per-ego ``rank()`` window
    (partitioned by ego — parallel over nodes, no global sort) →
    prefix-filtered adjacency self-join on the common neighbor.
    """
    from pyspark.sql import Window

    from networkit_spark.operators.triangles import TriangleEdgeScore

    if triangle_scores is None:
        triangle_scores = TriangleEdgeScore(graph).run().edge_scores()
    tri = triangle_scores.select("u", "v", "score")
    nbrs = tri.select(
        F.col("u").alias("ego"), F.col("v").alias("alter"), "score"
    ).unionAll(
        tri.select(F.col("v").alias("ego"), F.col("u").alias("alter"), "score")
    )
    w = Window.partitionBy("ego").orderBy(F.desc("score"))
    ranked = (
        nbrs.select("ego", "alter", (F.rank().over(w) - 1).alias("rnk"))
        .where(F.col("rnk") <= max_rank)
    )
    ru = ranked.select(F.col("ego").alias("u"), F.col("alter").alias("w"))
    rv = ranked.select(F.col("ego").alias("v"), F.col("alter").alias("w"))
    overlap = (
        tri.select("u", "v")
        .join(ru, "u")
        .join(rv, ["v", "w"])
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    return (
        tri.select("u", "v")
        .join(overlap, ["u", "v"], "left")
        .select("u", "v", F.coalesce("score", F.lit(0)).alias("score"))
    )


def random_edge_scores(graph: Graph, seed: int = 42) -> DataFrame:
    """RandomEdgeScore (``cpp/sparsification/RandomEdgeScore.cpp:
    18-28``): a uniform random score per canonical edge. Deterministic
    here: seeded ``xxhash64`` mapped to [0, 1) — reproducible at any
    parallelism, unlike the reference's shared RNG."""
    canon = graph.canonical().select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return canon.select(
        "u", "v",
        (
            (F.xxhash64("u", "v", F.lit(seed)).cast("double")
             / F.lit(float(2**63))) / 2.0 + 0.5
        ).alias("score"),
    )
