"""Link prediction indices — common neighbors, Jaccard, Adamic/Adar,
preferential attachment.

Reference: ``networkit/linkprediction.pyx:35-1085`` (each index is
``Index(G).run(u, v)`` per pair, or ``runAll``). Our surface scores a
**pairs DataFrame** in one shot — the batch form a Spark engine wants —
via wedge joins over the symmetric adjacency (SURVEY §2.9 last row:
"expressible as wedge joins + aggs").

All indices share one plan: common neighbors of (u, v) = rows of the
two-hop join ``adj(u,w) ⋈ adj(v,w)``; per-index weighting happens in the
aggregation. Degree-based terms join the (small) degree table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def _adjacency(graph: Graph) -> DataFrame:
    return (
        graph.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def common_neighbor_rows(graph: Graph, pairs: DataFrame) -> DataFrame:
    """``(u, v, w)`` — one row per common neighbor w of each input pair."""
    adj = _adjacency(graph)
    au = adj.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    av = adj.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    return pairs.select("u", "v").join(au, "u").join(av, ["v", "w"])


def link_prediction_scores(graph: Graph, pairs: DataFrame) -> DataFrame:
    """All closed-form neighborhood indices per pair, one wedge join:
    ``(u, v, common_neighbors, jaccard, adamic_adar, pref_attachment,
    resource_allocation, neighborhood_distance, total_neighbors,
    u_degree, v_degree, adjusted_rand)``.

    - CommonNeighborsIndex: |N(u) ∩ N(v)| (``linkprediction.pyx``)
    - JaccardIndex: |∩| / |∪|
    - AdamicAdarIndex: Σ_w 1/ln(deg(w))
    - PreferentialAttachmentIndex: deg(u)·deg(v)
    - ResourceAllocationIndex: Σ_w 1/deg(w)
      (``cpp/linkprediction/ResourceAllocationIndex.cpp:13-21``)
    - NeighborhoodDistanceIndex: |∩| / √(deg(u)·deg(v))
      (``include/.../NeighborhoodDistanceIndex.hpp:30-35``)
    - TotalNeighborsIndex: |N(u) ∪ N(v)|
      (``include/.../TotalNeighborsIndex.hpp:29-31``)
    - U/VDegreeIndex: deg(u) / deg(v)
      (``include/.../{U,V}DegreeIndex.hpp:27-29``)
    - AdjustedRandIndex: reproduces the reference LITERALLY, including
      its ``set_union`` quirk — ``uDifference``/``vDifference`` are
      both computed with ``std::set_union`` (not set_difference), so
      b = c = |N(u) ∪ N(v)| in the formula
      ``2(ad − bc) / (ab + ac + 2ad + b² + bd + c² + cd)`` with
      a = |∩|, d = n − |∪| (``AdjustedRandIndex.cpp:13-45``).
    """
    adj = _adjacency(graph)
    n = graph.number_of_nodes()
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    cn = common_neighbor_rows(graph, pairs)
    dw = deg.select(F.col("id").alias("w"), F.col("deg").alias("deg_w"))
    agg = (
        cn.join(dw, "w")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(
                F.when(F.col("deg_w") > 1, 1.0 / F.log("deg_w")).otherwise(0.0)
            ).alias("adamic_adar"),
            F.sum(1.0 / F.col("deg_w")).alias("resource_allocation"),
        )
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v"))
    cnc = F.coalesce("common_neighbors", F.lit(0))
    dgu = F.coalesce("deg_u", F.lit(0))
    dgv = F.coalesce("deg_v", F.lit(0))
    union_sz = dgu + dgv - cnc
    a = cnc.cast("double")
    b = union_sz.cast("double")  # reference set_union quirk (see doc)
    c = b
    d = F.lit(float(n)) - b
    ar_denom = a * b + a * c + 2 * a * d + b * b + b * d + c * c + c * d
    return (
        pairs.select("u", "v")
        .join(agg, ["u", "v"], "left")
        .join(du, "u", "left")
        .join(dv, "v", "left")
        .select(
            "u",
            "v",
            cnc.alias("common_neighbors"),
            F.round(cnc / F.greatest(union_sz, F.lit(1)), 6).alias("jaccard"),
            F.round(F.coalesce("adamic_adar", F.lit(0.0)), 6).alias("adamic_adar"),
            (dgu * dgv).alias("pref_attachment"),
            F.round(
                F.coalesce("resource_allocation", F.lit(0.0)), 6
            ).alias("resource_allocation"),
            F.round(
                cnc / F.sqrt(F.greatest(dgu * dgv, F.lit(1))), 6
            ).alias("neighborhood_distance"),
            union_sz.alias("total_neighbors"),
            dgu.alias("u_degree"),
            dgv.alias("v_degree"),
            F.round(
                F.when(
                    ar_denom == 0, F.lit(0.0)
                ).otherwise(2 * (a * d - b * c) / ar_denom),
                6,
            ).alias("adjusted_rand"),
        )
    )


def neighbors_measure_scores(graph: Graph, pairs: DataFrame) -> DataFrame:
    """NeighborsMeasureIndex (``include/.../NeighborsMeasureIndex.hpp:
    29-42``): for each pair (u, v), count of neighbor pairs
    (a ∈ N(u), b ∈ N(v)) with a == b or (a, b) an edge — i.e.
    |N(u) ∩ N(v)| plus the number of length-3 u→a→b→v walks.

    Spark plan: the common-neighbor wedge join plus one 3-hop join
    (adj ⋈ adj ⋈ adj restricted to the pairs frame) — the pairs frame
    prunes the walk enumeration to the sampled pairs.
    """
    adj = _adjacency(graph)
    au = adj.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    av = adj.select(F.col("src").alias("v"), F.col("dst").alias("b"))
    mid = adj.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    walks = (
        pairs.select("u", "v")
        .join(au, "u")
        .join(mid, "a")
        .join(av, ["v", "b"])
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("walk3"))
    )
    cn = (
        common_neighbor_rows(graph, pairs)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return (
        pairs.select("u", "v")
        .join(cn, ["u", "v"], "left")
        .join(walks, ["u", "v"], "left")
        .select(
            "u",
            "v",
            (
                F.coalesce("cn", F.lit(0)) + F.coalesce("walk3", F.lit(0))
            ).alias("neighbors_measure"),
        )
    )


def same_community_scores(
    graph: Graph, pairs: DataFrame, partition: DataFrame | None = None
) -> DataFrame:
    """SameCommunityIndex (``cpp/linkprediction/SameCommunityIndex.cpp:
    14-36``): 1 if both endpoints share a community, else 0. The
    reference detects communities with PLM; ``partition`` (an
    ``(id, label)`` frame) overrides that — pass a deterministic
    partition (e.g. connected components) for reproducible pipelines.
    """
    if partition is None:
        from networkit_spark.operators.plm import PLM

        partition = PLM(graph).run().get_partition()
    pu = partition.select(F.col("id").alias("u"), F.col("label").alias("lu"))
    pv = partition.select(F.col("id").alias("v"), F.col("label").alias("lv"))
    return (
        pairs.select("u", "v")
        .join(pu, "u", "left")
        .join(pv, "v", "left")
        .select(
            "u",
            "v",
            F.when(
                F.col("lu").isNotNull() & (F.col("lu") == F.col("lv")), 1
            )
            .otherwise(0)
            .alias("same_community"),
        )
    )


def missing_links_at_distance(graph: Graph, k: int = 2) -> DataFrame:
    """MissingLinksFinder.findAtDistance(k)
    (``cpp/linkprediction/MissingLinksFinder.cpp:24-76``): all node
    pairs ``(u, v)`` with ``u < v`` at BFS distance exactly ``k`` —
    i.e. non-adjacent pairs whose shortest path is ``k``.

    Spark plan: k rounds of frontier ⋈ adjacency with an anti-join
    against the visited set — the batched all-sources BFS truncated at
    depth k. For the default k=2 this is one wedge join minus edges.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from networkit_spark.plans.iterate import local_cut

    adj = _adjacency(graph)
    visited = graph.vertices.select(
        F.col("id").alias("root"), F.col("id").alias("node")
    )
    frontier = visited
    for i in range(k):
        step = (
            frontier.join(adj, frontier.node == adj.src)
            .select("root", F.col("dst").alias("node"))
            .distinct()
        )
        frontier = step.join(visited, ["root", "node"], "left_anti")
        visited = visited.unionAll(frontier)
        # lineage cut only once the plan tree is deep enough to matter —
        # k<=3 stays a single lazy plan (one job, no materializations)
        if k > 3 and i < k - 1:
            frontier = local_cut(frontier)
            visited = local_cut(visited)
    return (
        frontier.where(F.col("root") < F.col("node"))
        .select(F.col("root").alias("u"), F.col("node").alias("v"))
    )


def threshold_by_score(predictions: DataFrame, min_score: float) -> DataFrame:
    """LinkThresholder::byScore (``LinkThresholder.cpp:15-31``): keep
    pairs with score >= minScore (reference drops ``< minScore``)."""
    return predictions.where(F.col("score") >= min_score).select("u", "v")


def threshold_by_count(predictions: DataFrame, num_links: int) -> DataFrame:
    """LinkThresholder::byCount (``LinkThresholder.cpp:33-47``): the
    numLinks highest-scored pairs (score desc, ties by ascending pair —
    ``PredictionsSorter.cpp`` ConcreteScoreComp)."""
    ranked = predictions.orderBy(
        F.desc("score"), F.asc("u"), F.asc("v")
    ).limit(num_links)
    return ranked.select("u", "v")


def threshold_by_percentage(predictions: DataFrame, pct: float) -> DataFrame:
    """LinkThresholder::byPercentage (``LinkThresholder.cpp:50-55``)."""
    if pct < 0 or pct > 1:
        raise ValueError("percentage not in [0, 1]")
    n = predictions.count()
    return threshold_by_count(predictions, int(pct * n))


def random_link_sample(graph: Graph, num_links: int, seed: int = 42) -> DataFrame:
    """RandomLinkSampler (``linkprediction.pyx:689-740``): a uniform
    random subset of numLinks edges. Deterministic here: edges ranked
    by a seeded hash — same seed, same sample, any cluster size."""
    canon = graph.canonical().select("src", "dst")
    return (
        canon.orderBy(F.xxhash64("src", "dst", F.lit(seed)))
        .limit(num_links)
        .select("src", "dst")
    )


def roc_points(predictions: DataFrame, test_edges: DataFrame) -> DataFrame:
    """ROCMetric (``cpp/linkprediction/ROCMetric.cpp``): sweep the
    predictions from highest to lowest score; one point per threshold
    index with ``(fpr, tpr)`` cumulative rates against the test edge
    set. Window cumulative sums — no driver loop.
    """
    te = test_edges.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"),
        F.lit(1).alias("is_pos"),
    ).distinct()
    labeled = (
        predictions.join(te, ["u", "v"], "left")
        .select(
            "u", "v", "score", F.coalesce("is_pos", F.lit(0)).alias("is_pos")
        )
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.desc("score"), F.asc("u"), F.asc("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = labeled.agg(
        F.sum("is_pos").alias("P"), F.sum(1 - F.col("is_pos")).alias("N")
    ).collect()[0]
    pos, neg = totals["P"] or 0, totals["N"] or 0
    return labeled.select(
        (F.sum(1 - F.col("is_pos")).over(w) / F.lit(max(neg, 1))).alias("fpr"),
        (F.sum("is_pos").over(w) / F.lit(max(pos, 1))).alias("tpr"),
    )


def precision_recall_points(
    predictions: DataFrame, test_edges: DataFrame
) -> DataFrame:
    """PrecisionRecallMetric (``cpp/linkprediction/PrecisionRecallMetric
    .cpp``): ``(recall, precision)`` per threshold index, highest score
    first."""
    te = test_edges.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"),
        F.lit(1).alias("is_pos"),
    ).distinct()
    labeled = (
        predictions.join(te, ["u", "v"], "left")
        .select(
            "u", "v", "score", F.coalesce("is_pos", F.lit(0)).alias("is_pos")
        )
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.desc("score"), F.asc("u"), F.asc("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = labeled.agg(F.sum("is_pos").alias("P")).collect()[0]
    pos = totals["P"] or 0
    tp = F.sum("is_pos").over(w)
    k = F.count(F.lit(1)).over(w)
    return labeled.select(
        (tp / F.lit(max(pos, 1))).alias("recall"),
        (tp / k).alias("precision"),
    )


def algebraic_distance_scores(
    graph: Graph,
    pairs: DataFrame,
    num_systems: int = 10,
    num_iterations: int = 30,
    omega: float = 0.5,
    norm: int = 2,
    seed: int = 42,
    normalize_loads: bool = False,
) -> DataFrame:
    """AlgebraicDistanceIndex (``cpp/linkprediction/AlgebraicDistance
    Index.cpp:18-70``): smooth ``num_systems`` random load vectors by
    ``load[u] ← (1−ω)·load[u] + ω·Σ_v w·load[v] / wdeg(u)`` for
    ``num_iterations`` Jacobi rounds; the index of a pair is the
    p-norm (or max-norm for ``norm=0``) of the endpoint load
    differences across systems.

    Differences from the reference, by design: initial loads come from
    a seeded hash (``xxhash64(id, sys, seed)``) instead of a global
    RNG — bit-reproducible at any parallelism/cluster size, which the
    reference's shared-memory ``Aux::Random`` is not.

    Spark plan: state = (id, sys, load) rows; per round ONE gather
    join against the static normalized message matrix (w/wdeg, with
    flagged self-rows carrying the (1−ω) term — single state reference
    per round, plans/iterate.py), lineage cut per round.
    """
    from networkit_spark.plans.iterate import local_cut

    sym = graph.symmetrized().select("src", "dst", "weight")
    wdeg = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("wdeg")
    )
    # normalize by the GATHERING endpoint's weighted degree: the round
    # computes load[dst] ← (1−ω)·load[dst] + ω·Σ_src w·load[src]/wdeg(dst)
    msg = (
        sym.join(wdeg, sym.dst == wdeg.id)
        .select(
            "src", "dst",
            (F.lit(omega) * F.col("weight") / F.col("wdeg")).alias("frac"),
            F.lit(False).alias("is_self"),
        )
        .unionAll(
            graph.vertices.select(
                F.col("id").alias("src"), F.col("id").alias("dst"),
                F.lit(1.0 - omega).alias("frac"), F.lit(True).alias("is_self"),
            )
        )
        .persist()
    )
    systems = msg.sparkSession.range(num_systems).select(
        F.col("id").alias("sys")
    )
    # uniform [0,1) from the sign-normalized 64-bit hash
    loads = graph.vertices.crossJoin(systems).select(
        "id", "sys",
        (
            (F.xxhash64("id", "sys", F.lit(seed)).cast("double")
             / F.lit(float(2**63))) / 2.0 + 0.5
        ).alias("load"),
    )
    loads = local_cut(loads)
    for _ in range(num_iterations):
        loads = local_cut(
            msg.join(
                loads.hint("shuffle_hash"),
                (msg.src == loads.id),
            )
            .groupBy(F.col("dst").alias("out_id"), "sys")
            .agg(F.sum(F.col("frac") * F.col("load")).alias("load"))
            .select(F.col("out_id").alias("id"), "sys", "load")
        )
    if normalize_loads:
        # distance.AlgebraicDistance's final per-system min-max remap
        # ``(min − load)/(min − max)`` (AlgebraicDistance.cpp:88-97) —
        # the variant MaxentStress consumes; the linkprediction index
        # (AlgebraicDistanceIndex.cpp) skips it
        span = loads.groupBy("sys").agg(
            F.min("load").alias("lo"), F.max("load").alias("hi")
        )
        loads = loads.join(span, "sys").select(
            "id", "sys",
            (
                (F.col("lo") - F.col("load"))
                / F.when(
                    F.col("lo") != F.col("hi"), F.col("lo") - F.col("hi")
                ).otherwise(F.lit(1.0))
            ).alias("load"),
        )
    lu = loads.select(
        F.col("id").alias("u"), "sys", F.col("load").alias("lu")
    )
    lv = loads.select(
        F.col("id").alias("v"), "sys", F.col("load").alias("lv")
    )
    per_sys = (
        pairs.select("u", "v")
        .join(lu, "u")
        .join(lv, ["v", "sys"])
        .select("u", "v", F.abs(F.col("lu") - F.col("lv")).alias("d"))
    )
    if norm == 0:  # MAX_NORM (AlgebraicDistanceIndex.cpp:52-58)
        agg = per_sys.groupBy("u", "v").agg(F.max("d").alias("score"))
    else:
        agg = per_sys.groupBy("u", "v").agg(
            F.pow(F.sum(F.pow("d", norm)), 1.0 / norm).alias("score")
        )
    return (
        pairs.select("u", "v")
        .join(agg, ["u", "v"], "left")
        .select("u", "v", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def katz_index_scores(
    graph: Graph,
    pairs: DataFrame,
    max_path_length: int = 5,
    damping: float = 0.005,
) -> DataFrame:
    """Katz link-prediction index (``cpp/linkprediction/KatzIndex.cpp:
    16-75``, ``include/networkit/linkprediction/KatzIndex.hpp:25-66``):
    ``score(u, v) = Σ_{ℓ=1..L} β^ℓ · walks_ℓ(u, v)`` — WALK counts (the
    reference's per-round ``hits`` multiset accumulates revisits).

    Spark plan: one batched frontier loop from every distinct pair
    left-endpoint — state ``(source, id, cnt)``, one join-agg gather
    per length ℓ; each round joins the pair list to harvest that
    length's counts. The reference's "start at the lower-degree
    endpoint" is a sequential cache trick, not a semantic: on
    undirected graphs walk counts are symmetric, so batching from the
    left endpoints computes the same scores. Returns
    ``(u, v, walks array<long>, score)`` — the integer per-length walk
    counts are the exact cross-engine comparable; the damped sum is
    their deterministic fold.
    """
    from networkit_spark.plans.iterate import local_cut

    if max_path_length < 1:
        raise ValueError("max_path_length must be >= 1")
    adj = _adjacency(graph)
    sources = pairs.select(F.col("u").alias("source")).distinct()
    state = sources.select(
        "source", F.col("source").alias("id"), F.lit(1.0).alias("cnt")
    )
    per_level = []
    for _ in range(max_path_length):
        state = (
            adj.join(state.hint("shuffle_hash"), adj.src == state.id)
            .groupBy("source", F.col("dst").alias("nid"))
            .agg(F.sum("cnt").alias("cnt"))
            .select("source", F.col("nid").alias("id"), "cnt")
        )
        state = local_cut(state)
        hits = pairs.join(
            state.select(
                F.col("source").alias("u"), F.col("id").alias("v"), "cnt"
            ),
            ["u", "v"],
            "left",
        ).select(
            "u", "v", F.coalesce("cnt", F.lit(0.0)).cast("long").alias("c")
        )
        per_level.append(hits)
    out = pairs
    for i, lv in enumerate(per_level):
        out = out.join(
            lv.withColumnRenamed("c", f"c{i + 1}"), ["u", "v"]
        )
    walk_cols = [F.col(f"c{i + 1}") for i in range(max_path_length)]
    score = None
    for i in range(max_path_length):
        term = F.col(f"c{i + 1}").cast("double") * F.lit(damping ** (i + 1))
        score = term if score is None else score + term
    return out.select(
        "u", "v", F.array(*walk_cols).alias("walks"), score.alias("score")
    )
