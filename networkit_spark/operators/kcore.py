"""Core decomposition (k-core) — iterative peel as DataFrame rounds.

Reference: ``CoreDecomposition`` (``cpp/centrality/CoreDecomposition.cpp:
26-341``) — ParK-style parallel level-peeling: repeatedly remove all
nodes of degree < k, assigning ``coreness = k-1`` when a node is peeled
at level k. Result: per-node core numbers (``scores()``) plus
``maxCoreNumber``.

Spark plan: the peel is the loop the reference runs level by level —
each level is

    degrees ← groupBy over surviving symmetric edges
    peeled  ← vertices where deg < k          (filter)
    edges   ← anti-join both endpoints against peeled

with lineage cut per level. At web scale the surviving edge set shrinks
monotonically, so later rounds are cheap; the expensive early rounds are
plain hash aggregations with map-side combine. Matches the reference's
definition exactly on simple undirected graphs (self-loops removed, like
the reference's degree semantics for peeling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Centrality
from networkit_spark.plans.iterate import Materializer


class CoreDecomposition(Centrality):
    def __init__(self, graph: Graph, max_levels: int = 10_000) -> None:
        if graph.directed:
            raise ValueError(
                "CoreDecomposition requires an undirected graph "
                "(CoreDecomposition.cpp ctor precondition)"
            )
        super().__init__(graph)
        self.max_levels = max_levels
        self._max_core = 0

    def _run(self) -> None:
        g = self.graph
        mat = Materializer()
        # simple graph: canonical distinct edges, no self-loops
        canon = (
            g.canonical()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        sym = canon.unionAll(
            canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        sym = mat.cut(0, sym)
        alive = mat.cut(0, g.vertices)
        core: DataFrame | None = None
        spark = g.edges.sparkSession
        k = 0
        while k < self.max_levels:
            k += 1
            while True:
                deg = sym.groupBy(F.col("src").alias("id")).agg(
                    F.count(F.lit(1)).alias("deg")
                )
                with_deg = alive.join(deg, "id", "left").select(
                    "id", F.coalesce("deg", F.lit(0)).alias("deg")
                )
                # cut the peel set before reusing it in three places: a
                # fresh materialized frame may be referenced repeatedly,
                # but an in-flight derived plan may not (single-reference
                # rule, plans/iterate.py)
                peeled = mat.cut(k, with_deg.where(F.col("deg") < k).select("id"))
                n_peeled = peeled.count()
                if n_peeled == 0:
                    break
                assigned = peeled.select("id", F.lit(k - 1).alias("core"))
                core = assigned if core is None else core.unionAll(assigned)
                core = mat.cut(k, core)
                alive = mat.cut(k, with_deg.where(F.col("deg") >= k).select("id"))
                sym = mat.cut(
                    k,
                    sym.join(peeled.withColumnRenamed("id", "src"), "src", "left_anti")
                    .join(peeled.withColumnRenamed("id", "dst"), "dst", "left_anti")
                    .select("src", "dst"),
                )
            if alive.limit(1).count() == 0:
                break
        self._max_core = k - 1
        if core is None:
            core = spark.createDataFrame([], "id long, core long")
        self._scores = g.vertices.join(core, "id", "left").select(
            "id", F.coalesce(F.col("core"), F.lit(0)).cast("double").alias("score")
        )

    def max_core_number(self) -> int:
        """``CoreDecomposition::maxCoreNumber``."""
        self.assure_finished()
        return self._max_core

    def core_numbers(self) -> DataFrame:
        """``(id, core)`` integer core numbers."""
        self.assure_finished()
        return self._scores.select("id", F.col("score").cast("long").alias("core"))

    def shells(self) -> DataFrame:
        """``(core, size)`` — shell sizes (``getPartition`` analog)."""
        self.assure_finished()
        return self.core_numbers().groupBy("core").agg(
            F.count(F.lit(1)).alias("size")
        )
