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
