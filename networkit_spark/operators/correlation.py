"""Correlation — assortativity (``cpp/correlation/Assortativity.cpp``).

Two reference modes, both pure aggregations here:

- **numeric attribute** (``Assortativity(G, attribute)``,
  ``Assortativity.cpp:63-90``): Pearson correlation of the endpoint
  attribute pairs ``(x_u, y_v)`` over edges — means taken over edges,
  not nodes, exactly as the reference computes them.
- **nominal / partition** (``Assortativity.cpp:27-62``): mixing-matrix
  coefficient ``r = (Σ_i e_ii − Σ_i a_i b_i) / (1 − Σ_i a_i b_i)``
  where ``e_ij`` is the fraction of edges from type i to type j and
  ``a``/``b`` are its row/column sums.

Edges iterate once each (canonical direction for undirected graphs,
matching ``forEdges`` dedup, ``Graph.hpp:208-218``). Everything is a
handful of hash aggregations — no iteration, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.iterate import local_cut
from networkit_spark.operators.base import Algorithm


class Assortativity(Algorithm):
    def __init__(
        self,
        graph: Graph,
        attribute: DataFrame | None = None,
        partition: DataFrame | None = None,
    ) -> None:
        """``attribute``: (id, value double) per node — Pearson mode.
        ``partition``: (id, label) per node — nominal mode. Exactly one
        must be given (the reference's two constructors)."""
        if (attribute is None) == (partition is None):
            raise ValueError("give exactly one of attribute= or partition=")
        super().__init__(graph)
        self.attribute = attribute
        self.partition = partition
        self._coefficient: float | None = None

    def _edges_once(self) -> DataFrame:
        g = self.graph
        return g.edges if g.directed else g.canonical()

    def _run(self) -> None:
        e = self._edges_once().select("src", "dst")
        if self.attribute is not None:
            att = self.attribute.select(
                "id", F.col(self.attribute.columns[1]).cast("double").alias("x")
            )
            xs = att.select(F.col("id").alias("src"), F.col("x").alias("xu"))
            ys = att.select(F.col("id").alias("dst"), F.col("x").alias("xv"))
            pairs = e.join(xs, "src").join(ys, "dst")
            row = pairs.agg(
                F.avg("xu").alias("mx"),
                F.avg("xv").alias("my"),
                F.count(F.lit(1)).alias("m"),
            ).collect()[0]
            mx, my = row["mx"], row["my"]
            stats = pairs.agg(
                F.sum((F.col("xu") - mx) * (F.col("xv") - my)).alias("A"),
                F.sum(F.pow(F.col("xu") - mx, 2)).alias("B"),
                F.sum(F.pow(F.col("xv") - my, 2)).alias("C"),
            ).collect()[0]
            denom = (stats["B"] * stats["C"]) ** 0.5
            self._coefficient = float(stats["A"] / denom) if denom else 0.0
            return
        lab = self.partition.select("id", "label")
        ls = lab.select(F.col("id").alias("src"), F.col("label").alias("lu"))
        ld = lab.select(F.col("id").alias("dst"), F.col("label").alias("lv"))
        typed = e.join(ls, "src").join(ld, "dst")
        m = typed.count()
        if m == 0:
            self._coefficient = 0.0
            return
        eij = typed.groupBy("lu", "lv").agg(
            (F.count(F.lit(1)) / F.lit(float(m))).alias("e")
        ).transform(local_cut)
        diag = (
            eij.where(F.col("lu") == F.col("lv")).agg(F.sum("e")).collect()[0][0]
            or 0.0
        )
        a = eij.groupBy("lu").agg(F.sum("e").alias("a"))
        b = eij.groupBy("lv").agg(F.sum("e").alias("b"))
        ab = (
            a.join(b, a.lu == b.lv)
            .agg(F.sum(F.col("a") * F.col("b")))
            .collect()[0][0]
            or 0.0
        )
        self._coefficient = float((diag - ab) / (1.0 - ab)) if ab != 1.0 else 0.0

    def get_coefficient(self) -> float:
        """``Assortativity::getCoefficient``."""
        self.assure_finished()
        return self._coefficient


def degree_assortativity(graph: Graph) -> float:
    """Degree assortativity: Pearson mode with attribute = degree —
    the canonical web-graph mixing statistic."""
    deg = graph.degrees().select("id", F.col("out_deg").cast("double").alias("x"))
    return Assortativity(graph, attribute=deg).run().get_coefficient()
