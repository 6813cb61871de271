"""DegreeCentrality — the minimal end-to-end kernel.

Reference: ``cpp/centrality/DegreeCentrality.cpp:15-47`` — per-node
(in/out) degree, optionally normalized by ``n-1``, optionally ignoring
self-loops. Spark plan: one ``groupBy(...).count()`` with map-side
partial aggregation (hubs cost O(#partitions), not O(degree), on the
reduce side), then a scalar divide.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Centrality


class DegreeCentrality(Centrality):
    def __init__(
        self,
        graph: Graph,
        normalized: bool = False,
        out_deg: bool = True,
        ignore_self_loops: bool = True,
    ) -> None:
        super().__init__(graph)
        self.normalized = normalized
        self.out_deg = out_deg
        self.ignore_self_loops = ignore_self_loops

    def _run(self) -> None:
        g = self.graph
        base = g.edges if g.directed else g.symmetrized()
        if self.ignore_self_loops:
            base = base.where(F.col("src") != F.col("dst"))
        key = "src" if self.out_deg else "dst"
        counts = base.groupBy(F.col(key).alias("id")).agg(
            F.count(F.lit(1)).cast("double").alias("score")
        )
        scores = g.vertices.join(counts, "id", "left").select(
            "id", F.coalesce("score", F.lit(0.0)).alias("score")
        )
        if self.normalized:
            # maxDeg normalization uses n-1 (DegreeCentrality.cpp:37-46)
            n = g.number_of_nodes()
            denom = float(max(n - 1, 1))
            scores = scores.select("id", (F.col("score") / denom).alias("score"))
        self._scores = scores
