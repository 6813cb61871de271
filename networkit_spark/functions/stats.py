"""stats — the reference's Python-layer statistics helpers
(``networkit/stats.pyx:17-28``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def gini(df: DataFrame, col: str) -> float:
    """Gini coefficient of a column (``stats.gini``): the reference
    sorts the values and accumulates ``area = Σᵢ (Hᵢ − xᵢ/2)`` with
    ``Hᵢ`` the running sum, ``fair = Hₙ·n/2``, returning
    ``(fair − area)/fair``.

    The running sum collapses algebraically: ``Σᵢ Hᵢ = Σⱼ xⱼ·(n−j₀)``
    with j₀ the 0-based ascending position — so one distributed
    zipWithIndex over the range-sorted values and two aggregates
    replace the sequential scan (ties may take their positions in any
    order; the position-weight sum over a tie group is invariant)."""
    vals = df.select(F.col(col).cast("double").alias("v")).orderBy("v")
    spark = df.sparkSession
    rdd = vals.rdd.map(lambda r: r[0]).zipWithIndex()
    ranked = spark.createDataFrame(rdd, "v double, j long")
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    n, s = int(stats["n"]), float(stats["s"] or 0.0)
    if n == 0 or s == 0.0:
        return 0.0
    weighted = ranked.agg(
        F.sum(F.col("v") * (F.lit(n) - F.col("j"))).alias("w")
    ).collect()[0]["w"]
    area = float(weighted) - s / 2.0
    fair = s * n / 2.0
    return (fair - area) / fair
