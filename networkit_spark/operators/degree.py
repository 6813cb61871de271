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

    Documented divergence: isolated vertices score **0.0** here (left
    join + coalesce), where the reference computes ``0 / degree(u) =
    0/0 = NaN``. 0.0 is the more useful sentinel in a DataFrame (NaN
    poisons downstream aggregates and breaks the driver's value-hash
    stability), so we keep it deliberately.
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


class PermanenceCentrality(Centrality):
    """Permanence of each node w.r.t. a partition
    (``cpp/centrality/PermanenceCentrality.cpp:14-160``):

    ``perm(u) = I(u) / E_max(u) / deg(u) − (1 − c_in(u))`` where
    I(u) = #neighbors in u's community, E_max(u) = the largest
    neighbor count in any OTHER single community (1 if none —
    ``PermanenceCentrality.cpp:157``), and c_in(u) = clustering among
    u's same-community neighbors: triangles (u,y,z) with
    ``P[y]==P[z]==P[u]``, divided by I(I−1)/2 (0 when I < 2).

    Spark plan: one strength aggregation over the label-joined
    adjacency + the shared triangle enumeration exploded per corner —
    no iteration.
    """

    def __init__(self, graph: Graph, partition) -> None:
        if graph.directed:
            raise ValueError("PermanenceCentrality requires an undirected graph")
        super().__init__(graph)
        self.partition = partition

    def _run(self) -> None:
        from networkit_spark.operators.triangles import (
            _oriented_edges,
            triangle_rows,
        )

        g = self.graph
        part = self.partition.select("id", "label")
        adj = (
            g.symmetrized()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        lu = part.select(F.col("id").alias("src"), F.col("label").alias("lc"))
        lv = part.select(F.col("id").alias("dst"), F.col("label").alias("ln"))
        labeled = adj.join(lu, "src").join(lv, "dst")
        strength = labeled.groupBy(
            F.col("src").alias("id"), F.col("ln").alias("nl"), "lc"
        ).agg(F.count(F.lit(1)).alias("s"))
        per_node = strength.groupBy("id").agg(
            F.sum(F.when(F.col("nl") == F.col("lc"), F.col("s"))).alias("internal"),
            F.max(F.when(F.col("nl") != F.col("lc"), F.col("s"))).alias("emax"),
            F.sum("s").alias("deg"),
        )

        canon, oriented, _ = _oriented_edges(g)
        tris = triangle_rows(g, oriented.persist(), strategy="auto")
        corners = tris.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), F.col("b").alias("y"),
                             F.col("c").alias("z")),
                    F.struct(F.col("b").alias("u"), F.col("a").alias("y"),
                             F.col("c").alias("z")),
                    F.struct(F.col("c").alias("u"), F.col("a").alias("y"),
                             F.col("b").alias("z")),
                )
            ).alias("t")
        ).select("t.u", "t.y", "t.z")
        pc = part.select(F.col("id").alias("u"), F.col("label").alias("l_u"))
        py = part.select(F.col("id").alias("y"), F.col("label").alias("l_y"))
        pz = part.select(F.col("id").alias("z"), F.col("label").alias("l_z"))
        tri_in = (
            corners.join(pc, "u").join(py, "y").join(pz, "z")
            .where((F.col("l_y") == F.col("l_u")) & (F.col("l_z") == F.col("l_u")))
            .groupBy(F.col("u").alias("id"))
            .agg(F.count(F.lit(1)).alias("tri"))
        )

        internal = F.coalesce("internal", F.lit(0)).cast("double")
        emax = F.coalesce("emax", F.lit(1)).cast("double")
        tri = F.coalesce("tri", F.lit(0)).cast("double")
        c_in = F.when(
            internal >= 2,
            tri / (0.5 * internal * (internal - 1.0)),
        ).otherwise(0.0)
        scores = (
            g.vertices.join(per_node, "id", "left")
            .join(tri_in, "id", "left")
            .select(
                "id",
                F.when(
                    F.coalesce("deg", F.lit(0)) > 0,
                    internal / emax / F.col("deg").cast("double")
                    - (F.lit(1.0) - c_in),
                ).otherwise(0.0).alias("score"),
            )
        )
        self._scores = scores
