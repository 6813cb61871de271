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


class Sfigality(Centrality):
    """Fraction of a node's neighbors that have a HIGHER degree
    (``cpp/centrality/Sfigality.cpp:16-30``): per incident edge (u,v),
    count ``deg(u) < deg(v)``, divided by ``deg(u)``.

    Spark plan: degree table joined onto both endpoints of the
    symmetric edge view, one comparison + groupBy — two broadcast-able
    joins against an |V|-row table, no iteration.
    """

    def _run(self) -> None:
        g = self.graph
        sym = g.symmetrized().select("src", "dst")
        deg = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        du = deg.select(F.col("id").alias("src"), F.col("deg").alias("deg_u"))
        dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("deg_v"))
        per_node = (
            sym.join(du, "src")
            .join(dv, "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(
                (
                    F.sum(F.when(F.col("deg_u") < F.col("deg_v"), 1).otherwise(0))
                    / F.count(F.lit(1))
                ).alias("score")
            )
        )
        self._scores = g.vertices.join(per_node, "id", "left").select(
            "id", F.coalesce("score", F.lit(0.0)).alias("score")
        )


class LaplacianCentrality(Centrality):
    """Drop in Laplacian energy when removing each node
    (``cpp/centrality/LaplacianCentrality.cpp:16-45``):
    ``score(u) = floor(wdeg(u))^2 + Σ_{v∈N(u)} w·(w + 2·wdeg(v))``,
    optionally divided by the total energy
    ``Σ_u floor(wdeg(u))^2 + Σ_(u,v) w^2`` (both directions).

    The ``floor`` mirrors the reference verbatim: it stores
    ``weightedDegree`` into an integer ``count`` before squaring
    (``LaplacianCentrality.cpp:21``) — a no-op on unweighted or
    integer-weighted graphs.
    """

    def __init__(self, graph: Graph, normalized: bool = False) -> None:
        super().__init__(graph)
        self.normalized = normalized

    def _run(self) -> None:
        g = self.graph
        sym = g.symmetrized().select("src", "dst", "weight")
        wdeg = sym.groupBy(F.col("src").alias("id")).agg(
            F.sum("weight").alias("wdeg")
        )
        dv = wdeg.select(F.col("id").alias("dst"), F.col("wdeg").alias("wdeg_v"))
        nbr = (
            sym.join(dv, "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(
                F.sum(
                    F.col("weight")
                    * (F.col("weight") + 2.0 * F.col("wdeg_v"))
                ).alias("nbr_term")
            )
        )
        scores = (
            g.vertices.join(wdeg, "id", "left")
            .join(nbr, "id", "left")
            .select(
                "id",
                (
                    F.pow(F.floor(F.coalesce("wdeg", F.lit(0.0))), 2)
                    + F.coalesce("nbr_term", F.lit(0.0))
                ).alias("score"),
            )
        )
        if self.normalized:
            energy_row = (
                g.vertices.join(wdeg, "id", "left")
                .agg(
                    F.sum(
                        F.pow(F.floor(F.coalesce("wdeg", F.lit(0.0))), 2)
                    ).alias("deg_e")
                )
                .crossJoin(
                    sym.agg(F.sum(F.pow("weight", 2)).alias("edge_e"))
                )
                .collect()[0]
            )
            total_energy = (energy_row["deg_e"] or 0.0) + (
                energy_row["edge_e"] or 0.0
            )
            scores = scores.select(
                "id", (F.col("score") / F.lit(total_energy or 1.0)).alias("score")
            )
        self._scores = scores


class LocalPartitionCoverage(Centrality):
    """Weighted fraction of each node's edges staying inside its own
    partition subset (``cpp/centrality/LocalPartitionCoverage.cpp:11-29``).
    ``partition`` is an ``(id, label)`` DataFrame.
    """

    def __init__(self, graph: Graph, partition) -> None:
        super().__init__(graph)
        self.partition = partition

    def _run(self) -> None:
        g = self.graph
        sym = g.symmetrized().select("src", "dst", "weight")
        pu = self.partition.select(
            F.col("id").alias("src"), F.col("label").alias("label_u")
        )
        pv = self.partition.select(
            F.col("id").alias("dst"), F.col("label").alias("label_v")
        )
        per_node = (
            sym.join(pu, "src")
            .join(pv, "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(
                (
                    F.sum(
                        F.when(
                            F.col("label_u") == F.col("label_v"), F.col("weight")
                        ).otherwise(0.0)
                    )
                    / F.sum("weight")
                ).alias("score")
            )
        )
        self._scores = g.vertices.join(per_node, "id", "left").select(
            "id", F.coalesce("score", F.lit(0.0)).alias("score")
        )
