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
    """All four indices per pair:
    ``(u, v, common_neighbors, jaccard, adamic_adar, pref_attachment)``.

    - CommonNeighborsIndex: |N(u) ∩ N(v)| (``linkprediction.pyx``)
    - JaccardIndex: |∩| / |∪|
    - AdamicAdarIndex: Σ_w 1/ln(deg(w))
    - PreferentialAttachmentIndex: deg(u)·deg(v)
    """
    adj = _adjacency(graph)
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
        )
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v"))
    return (
        pairs.select("u", "v")
        .join(agg, ["u", "v"], "left")
        .join(du, "u", "left")
        .join(dv, "v", "left")
        .select(
            "u",
            "v",
            F.coalesce("common_neighbors", F.lit(0)).alias("common_neighbors"),
            F.round(
                F.coalesce("common_neighbors", F.lit(0))
                / F.greatest(
                    F.coalesce("deg_u", F.lit(0))
                    + F.coalesce("deg_v", F.lit(0))
                    - F.coalesce("common_neighbors", F.lit(0)),
                    F.lit(1),
                ),
                6,
            ).alias("jaccard"),
            F.round(F.coalesce("adamic_adar", F.lit(0.0)), 6).alias("adamic_adar"),
            (
                F.coalesce("deg_u", F.lit(0)) * F.coalesce("deg_v", F.lit(0))
            ).alias("pref_attachment"),
        )
    )
