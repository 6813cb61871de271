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


def forest_fire_scores(
    graph: Graph,
    pf: float,
    target_burnt_ratio: float,
    seed: int = 42,
    first_batch: int = 32,
    max_batches: int = 20,
    max_rounds: int = 10_000,
) -> DataFrame:
    """ForestFireScore (``cpp/sparsification/ForestFireScore.cpp:21-94``):
    repeatedly start fires at random nodes; an active node burns a
    Geometric(pf)-distributed number of its not-yet-visited neighbors
    (uniformly, without replacement), burnt nodes become active, and
    fires restart until ``target_burnt_ratio · m`` edge-burns happened.
    Edge score = burn count / max burn count.

    Spark re-expression — a whole BATCH of fires advances per round:

    - per active ``(fire, v)``, the geometric draw is
      ``k = floor(ln u / ln pf)`` from a seeded md5 uniform, and the
      "k uniform picks without replacement" equal the k smallest seeded
      hash ranks over v's unvisited neighbors (row_number per
      ``(fire, v)`` — partition width ≤ degree);
    - simultaneous landings on one node collapse to the smallest-rank
      edge (the reference's first-burn-marks-visited rule);
    - fire batches double until the burn budget is met, so the driver
      loop is O(log target) batches of O(fire-depth) rounds.

    Documented divergences (stochastic scorer — the reference itself is
    RNG- and thread-schedule-dependent): burning is synchronous per
    frontier (the reference interleaves one global queue), fire start
    nodes are a seeded hash shuffle without replacement per batch, and
    all draws are md5-seeded so results are deterministic at any
    parallelism. Invariants preserved: per fire each node is burnt via
    at most one in-edge, per expansion neighbors burn without
    replacement with Geometric(pf) counts, and scores are burn counts
    normalized to max = 1.
    """
    from networkit_spark.operators.dedup import portable_hash32
    from networkit_spark.plans.iterate import Materializer, local_cut
    from pyspark.sql import Window

    if not (0.0 <= pf < 1.0):
        raise ValueError("pf must be in [0, 1)")
    if target_burnt_ratio <= 0:
        raise ValueError("target_burnt_ratio must be positive")
    spark = graph.edges.sparkSession
    mat = Materializer()
    adj = (
        graph.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = adj.repartition(shuffle_parts, "src").persist()
    m = graph.canonical().where(F.col("src") != F.col("dst")).count()
    target = target_burnt_ratio * m
    two32 = float(2**32)

    def h01(*cols, salt):
        return (
            portable_hash32(F.concat_ws("|", *cols), salt).cast("double")
            + 0.5
        ) / two32

    burnt_parts: list[DataFrame] = []
    total_burnt = 0
    fires_done = 0
    batch_size = first_batch
    for b in range(max_batches):
        if total_burnt >= target:
            break
        starts = [
            r["id"]
            for r in graph.vertices.select(
                "id", portable_hash32(F.col("id").cast("string"),
                                      f"ffs{seed}b{b}").alias("h")
            ).orderBy("h", "id").limit(batch_size).collect()
        ]
        frontier = spark.createDataFrame(
            [(fires_done + i, s) for i, s in enumerate(starts)],
            "fire long, id long",
        )
        frontier = mat.cut(0, frontier)
        visited = frontier.limit(0)
        batch_lands: list[DataFrame] = []
        for rnd in range(1, max_rounds + 1):
            if frontier.limit(1).count() == 0:
                break
            cand = (
                adj.join(
                    frontier.withColumnRenamed("id", "src").hint(
                        "shuffle_hash"
                    ),
                    "src",
                )
                .join(
                    visited.withColumnRenamed("id", "dst").withColumn(
                        "seen", F.lit(True)
                    ),
                    ["fire", "dst"],
                    "left",
                )
                .where(F.col("seen").isNull())
                .select(
                    "fire", F.col("src").alias("v"), F.col("dst").alias("x")
                )
            )
            u = h01(F.col("fire"), F.col("v"), F.lit(rnd), salt=f"ffk{seed}")
            k = (
                F.floor(F.log(u) / F.log(F.lit(float(pf))))
                if pf > 0
                else F.lit(0)
            )
            r = h01(F.col("fire"), F.col("v"), F.col("x"), salt=f"ffr{seed}")
            w_rank = Window.partitionBy("fire", "v").orderBy("r", "x")
            sel = (
                cand.select("fire", "v", "x", r.alias("r"), k.alias("k"))
                .withColumn("rn", F.row_number().over(w_rank))
                .where(F.col("rn") <= F.col("k"))
            )
            land = (
                sel.groupBy("fire", "x")
                .agg(F.min(F.struct("r", "v")).alias("p"))
                .select("fire", F.col("p.v").alias("v"), "x")
            )
            land = mat.cut(rnd, land)
            batch_lands.append(
                land.select(
                    F.least("v", "x").alias("u"),
                    F.greatest("v", "x").alias("v"),
                )
            )
            frontier = land.select("fire", F.col("x").alias("id"))
            visited = mat.cut(
                rnd, visited.unionAll(frontier).distinct()
            )
        else:
            adj.unpersist()
            raise RuntimeError(
                f"a fire batch did not die out in {max_rounds} rounds"
            )
        if batch_lands:
            batch_burnt = local_cut(_union_all(batch_lands))
            total_burnt += batch_burnt.count()
            burnt_parts.append(batch_burnt)
        fires_done += batch_size
        batch_size *= 2
    else:
        adj.unpersist()
        raise RuntimeError(
            f"burn target not reached in {max_batches} fire batches — "
            "raise max_batches or first_batch"
        )
    adj.unpersist()

    counts = (
        _union_all(burnt_parts).groupBy("u", "v")
        .agg(F.count("*").alias("cnt"))
        if burnt_parts
        else spark.createDataFrame([], "u long, v long, cnt long")
    )
    counts = local_cut(counts)
    mx = counts.agg(F.max("cnt").alias("m")).collect()[0]["m"] or 0
    canon = graph.canonical().select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).where(F.col("u") != F.col("v")).distinct()
    denom = float(mx) if mx > 0 else 1.0
    return canon.join(counts, ["u", "v"], "left").select(
        "u", "v",
        (F.coalesce("cnt", F.lit(0)).cast("double") / F.lit(denom)).alias(
            "score"
        ),
    )


def _union_all(frames: list[DataFrame]) -> DataFrame:
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


def random_node_edge_scores(
    graph: Graph, rne_ratio: float = 0.8, seed: int = 42
) -> DataFrame:
    """RandomNodeEdgeScore (``cpp/sparsification/RandomNodeEdgeScore.cpp:
    17-66``): score(e) = (removal index)/m under sequential random
    peeling — with probability ``rneRatio`` the removed edge is
    node-biased (uniform node with degree > 0, then uniform incident
    edge — ``GraphTools::randomEdge`` default mode,
    ``GraphTools.cpp:128-138``), otherwise uniform over remaining edges.
    Early-removed edges score low, survivors high.

    The score IS the removal order of one sequential peel — each draw's
    distribution depends on every prior removal — so this runs
    DRIVER-SIDE at fixture scale (guarded), seeded, like the other
    sequential-process ports. Divergence: the reference's uniform branch
    pops from a stale pre-drawn batch revalidated by ``hasEdge``; here
    each uniform draw is over the CURRENT edge set (the limit
    distribution the batch approximates). Returns ``(u, v, score)``.
    """
    import random as _random

    if graph.directed:
        raise ValueError("RandomNodeEdgeScore needs an undirected graph")
    m = graph.number_of_edges()
    if m > 2_000_000:
        raise ValueError(
            f"RandomNodeEdgeScore is a sequential peel ({m} edges > "
            "2000000); use random_edge_scores at engine scale"
        )
    rng = _random.Random(seed)
    adj: dict[int, set[int]] = {}
    edges: list[tuple[int, int]] = []
    for r in (
        graph.canonical()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .collect()
    ):
        u, v = int(r["src"]), int(r["dst"])
        edges.append((u, v))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    edges.sort()
    m = len(edges)
    pos = {e: i for i, e in enumerate(edges)}  # live-edge index
    live = list(edges)
    nodes = sorted(adj)
    score: dict[tuple[int, int], float] = {}
    removed = 0

    def _remove(e: tuple[int, int]) -> None:
        i = pos.pop(e)
        last = live[-1]
        live[i] = last
        if last != e:
            pos[last] = i
        live.pop()
        adj[e[0]].discard(e[1])
        adj[e[1]].discard(e[0])

    while live:
        if rng.random() >= rne_ratio:  # uniform over remaining edges
            e = live[rng.randrange(len(live))]
        else:  # node-biased: uniform non-isolated node, uniform neighbor
            while True:
                u = nodes[rng.randrange(len(nodes))]
                if adj[u]:
                    break
            v = sorted(adj[u])[rng.randrange(len(adj[u]))]
            e = (u, v) if u < v else (v, u)
        score[e] = removed / m
        _remove(e)
        removed += 1

    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(u, v, s) for (u, v), s in sorted(score.items())],
        "u long, v long, score double",
    )
