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
