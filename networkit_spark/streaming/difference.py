"""GraphDifference (``cpp/dynamics/GraphDifference.cpp:18-140``):
compute the edit stream that turns G1 into G2 — edge removals first,
then node events, then edge additions/weight updates, exactly the
reference's emission order.

Divergence (documented): the reference operates on a dense node-id
space, so a node of G2 above G1's ``upperNodeIdBound`` is emitted as
anonymous ``NODE_ADDITION`` padding plus restorations
(``GraphDifference.cpp:36-60``). This engine's node sets are explicit
``(id)`` frames, so additions/removals carry their node id directly —
``NODE_RESTORATION`` collapses into ``NODE_ADDITION``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm


class GraphDifference(Algorithm):
    def __init__(self, g1: Graph, g2: Graph) -> None:
        if g1.directed != g2.directed:
            raise ValueError("graphs must share directedness")
        super().__init__(g1)
        self.g2 = g2
        self._edits: DataFrame | None = None
        self._counts: dict[str, int] | None = None

    @staticmethod
    def _keyed(g: Graph) -> DataFrame:
        base = g.edges if g.directed else g.canonical()
        return base.groupBy("src", "dst").agg(F.sum("weight").alias("w"))

    def _run(self) -> None:
        g1, g2 = self.graph, self.g2
        e1 = self._keyed(g1)
        e2 = self._keyed(g2)
        joined = e1.withColumnRenamed("w", "w1").join(
            e2.withColumnRenamed("w", "w2"), ["src", "dst"], "full_outer"
        ).localCheckpoint()
        removals = joined.where(F.col("w2").isNull()).select(
            F.lit("EDGE_REMOVAL").alias("etype"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            F.lit(0.0).alias("w"),
        )
        additions = joined.where(F.col("w1").isNull()).select(
            F.lit("EDGE_ADDITION").alias("etype"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            F.col("w2").alias("w"),
        )
        updates = joined.where(
            F.col("w1").isNotNull()
            & F.col("w2").isNotNull()
            & (F.col("w1") != F.col("w2"))
        ).select(
            F.lit("EDGE_WEIGHT_UPDATE").alias("etype"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            F.col("w2").alias("w"),
        )
        gone = g1.vertices.join(g2.vertices, "id", "left_anti").select(
            F.lit("NODE_REMOVAL").alias("etype"),
            F.col("id").alias("u"), F.lit(None).cast("long").alias("v"),
            F.lit(0.0).alias("w"),
        )
        new = g2.vertices.join(g1.vertices, "id", "left_anti").select(
            F.lit("NODE_ADDITION").alias("etype"),
            F.col("id").alias("u"), F.lit(None).cast("long").alias("v"),
            F.lit(0.0).alias("w"),
        )
        phase = F.when(F.col("etype") == "EDGE_REMOVAL", 0).when(
            F.col("etype").isin("NODE_REMOVAL", "NODE_ADDITION"), 1
        ).otherwise(2)
        edits = (
            removals.unionAll(gone).unionAll(new)
            .unionAll(additions).unionAll(updates)
            .withColumn("phase", phase)
        )
        self._edits = edits.select(
            "phase", "etype", "u", "v", "w"
        ).localCheckpoint()
        rows = self._edits.groupBy("etype").count().collect()
        self._counts = {r["etype"]: r["count"] for r in rows}

    # ------------------------------------------------------- accessors
    def get_edits(self) -> DataFrame:
        """``(phase, etype, u, v, w)`` — apply phases in ascending
        order (``GraphDifference::getEdits`` emission order)."""
        self.assure_finished()
        return self._edits

    def _count(self, key: str) -> int:
        self.assure_finished()
        return int(self._counts.get(key, 0))

    def get_number_of_edits(self) -> int:
        self.assure_finished()
        return int(sum(self._counts.values()))

    def get_number_of_node_additions(self) -> int:
        return self._count("NODE_ADDITION")

    def get_number_of_node_removals(self) -> int:
        return self._count("NODE_REMOVAL")

    def get_number_of_edge_additions(self) -> int:
        return self._count("EDGE_ADDITION")

    def get_number_of_edge_removals(self) -> int:
        return self._count("EDGE_REMOVAL")

    def get_number_of_weight_updates(self) -> int:
        return self._count("EDGE_WEIGHT_UPDATE")
