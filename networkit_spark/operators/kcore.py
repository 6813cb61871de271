"""Core decomposition (k-core) — h-index fixpoint as DataFrame rounds.

Reference: ``CoreDecomposition`` (``cpp/centrality/CoreDecomposition.cpp:
26-341``) — ParK-style parallel level-peeling: repeatedly remove all
nodes of degree < k, assigning ``coreness = k-1`` when a node is peeled
at level k. Result: per-node core numbers (``scores()``) plus
``maxCoreNumber``.

Spark plan: instead of translating the peel (whose round count is
O(max-core) — hundreds of driver rounds on a dense graph), we compute
the same numbers through the h-index fixpoint (Lü, Zhou, Zhang &
Stanley, "The H-index of a network node and its relation to degree and
coreness", Nat. Commun. 7:10168, 2016 — public result): start from
``h⁰(u) = deg(u)`` and iterate ``hᵗ⁺¹(u) = H({hᵗ(v) : v ∈ N(u)})``
where ``H`` is the h-index operator (largest h with ≥ h neighbors of
value ≥ h). The fixpoint equals coreness exactly, values are
monotonically non-increasing, and convergence typically takes a handful
of rounds rather than max-core of them.

Per round (all JVM-side):

    sym ⋈ values on src → groupBy(dst, h).count → per-dst cumulative
    count over descending h → h-index = max(min(h, #≥h))

The cumulative window runs over **distinct neighbor values** per vertex
(≤ max-core + 1 rows), not over neighbors — a hub with 10⁸ neighbors
contributes at most max-core rows to its window partition, so there is
no per-hub task skew; the heavy lifting is the partial-aggregated
``groupBy(dst, h)``. Exactness on golden graphs is pytest-verified
against the peel definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Centrality
from networkit_spark.plans.iterate import Materializer


class CoreDecomposition(Centrality):
    def __init__(
        self, graph: Graph, max_levels: int = 10_000, unroll: int = 1
    ) -> None:
        """``unroll=k`` chains k h-index rounds per materialized job.
        The operator is monotone non-increasing toward the fixpoint, so
        chunk-end equality implies no change happened inside the chunk —
        the convergence test every k rounds is exact, never early."""
        if graph.directed:
            raise ValueError(
                "CoreDecomposition requires an undirected graph "
                "(CoreDecomposition.cpp ctor precondition)"
            )
        if unroll < 1:
            raise ValueError("unroll must be >= 1")
        super().__init__(graph)
        self.max_levels = max_levels  # round budget for the fixpoint
        self.unroll = unroll
        self._max_core = 0
        self._iterations = 0

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        # simple graph: canonical distinct edges, no self-loops (the
        # reference peels on simple-degree semantics)
        canon = (
            g.canonical()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        # flagged self-row per vertex (single-reference pattern,
        # plans/iterate.py): keeps every vertex — including isolated
        # ones — in the round output without an outer join, and carries
        # the node's previous h through the same aggregation so the
        # change-count is a scan, not an old⋈new join. Safe inside the
        # h-index: for ANY candidate value v, min(v, #nbrs with h≥v) ≤
        # h-index, so the extra self candidate row never raises the max
        # (self rows contribute 0 to the cumulative count).
        sym = canon.unionAll(
            canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).select("src", "dst", F.lit(False).alias("is_self"))
        sym = sym.unionAll(
            g.vertices.select(
                F.col("id").alias("src"), F.col("id").alias("dst"),
                F.lit(True).alias("is_self"),
            )
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        sym = sym.repartition(shuffle_parts, "src").persist()

        vertices = g.vertices
        deg = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.when(~F.col("is_self"), F.lit(1))).alias("h")
        )
        vals = vertices.join(deg, "id", "left").select(
            "id", F.coalesce("h", F.lit(0)).alias("h")
        )
        vals = mat.cut(0, vals)

        def one_round(v_in):
            nbr = sym.join(
                v_in.hint("shuffle_hash"), sym.src == v_in.id
            ).select("dst", "h", "is_self")
            cnt = nbr.groupBy("dst", "h").agg(
                F.count(F.when(~F.col("is_self"), F.lit(1))).alias("c"),
                F.max(F.when(F.col("is_self"), 1).otherwise(0)).alias("own"),
            )
            w = (
                Window.partitionBy("dst")
                .orderBy(F.desc("h"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            return (
                cnt.withColumn("ge", F.sum("c").over(w))
                .groupBy(F.col("dst").alias("id"))
                .agg(
                    F.max(F.least(F.col("h"), F.col("ge"))).alias("h"),
                    F.max(F.when(F.col("own") == 1, F.col("h"))).alias("old_h"),
                )
            )

        it = 0
        while it < self.max_levels:
            steps = min(self.unroll, self.max_levels - it)
            new_vals = vals
            for _ in range(max(steps, 1)):
                new_vals = one_round(new_vals)
                it += 1
            new_vals = mat.cut(it, new_vals)
            # values only decrease; the h-index map is deterministic, so
            # "last round changed nothing" == fixpoint even under unroll
            changed = new_vals.where(F.col("h") != F.col("old_h")).count()
            vals = new_vals.select("id", "h")
            if changed == 0:
                break
        else:
            sym.unpersist()
            raise RuntimeError(
                f"core decomposition did not converge in {self.max_levels} "
                "rounds — raise max_levels"
            )
        self._iterations = it
        row = vals.agg(F.max("h").alias("m")).collect()[0]
        self._max_core = int(row["m"] or 0)
        self._scores = vals.select("id", F.col("h").cast("double").alias("score"))
        sym.unpersist()

    def max_core_number(self) -> int:
        """``CoreDecomposition::maxCoreNumber``."""
        self.assure_finished()
        return self._max_core

    def number_of_iterations(self) -> int:
        self.assure_finished()
        return self._iterations

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
