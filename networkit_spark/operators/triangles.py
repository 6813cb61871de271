"""Triangle counting via degree-ordered wedge joins.

Reference (``cpp/centrality/LocalClusteringCoefficient.cpp:6-93``): for
per-vertex triangle counts the reference orients edges by degree —
``isOutEdge(u,v) = deg(u)>deg(v) or (deg(u)==deg(v) and u<v)``
(``LocalClusteringCoefficient.cpp:20-22``) — then closes wedges against
the oriented adjacency. The orientation bounds per-vertex oriented
degree by O(√m) (arboricity), which **is** the skew handling: hub
vertices of a power-law web graph get low oriented out-degree, so the
wedge self-join never explodes on them. ``TriangleEdgeScore``
(``cpp/edgescores/TriangleEdgeScore.cpp:19-111``) counts common
neighbors per edge with the same orientation.

Preconditions mirrored from the reference: undirected input and **no
self-loops** (ctor throws otherwise, ``LocalClusteringCoefficient.cpp:
6-9``); callers run ``Graph.remove_self_loops()`` first. Multi-edges are
collapsed to simple edges before counting (triangles are a simple-graph
notion; the explicit dedup mirrors ``removeMultiEdges``,
``Graph.hpp:1310``).

Spark plan — pure joins/aggs, one triangle row per triangle:

    E_c   = distinct canonical edges (u<v)
    E_o   = E_c oriented low→high in the (deg, id) total order
    wedge = E_o ⋈ E_o on shared apex a, (deg,id)-ordered legs b<c
    tri   = wedge ⋈ E_o on the closing edge (b,c)

Per-vertex counts = explode the 3 corners → groupBy(id).count.
LCC ``c(u) = 2·T(u)/(d(u)(d(u)−1))``
(``LocalClusteringCoefficient.cpp:81-82``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm, Centrality


def _oriented_edges(graph: Graph):
    """Returns (E_c canonical simple edges, E_o oriented edges with the
    destination's (deg,id) key, degrees df). Orientation: low (deg,id)
    endpoint → high (deg,id) endpoint."""
    canon = (
        graph.canonical()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # simple degree over the deduped canonical edge set
    deg = (
        canon.select(F.col("src").alias("id"))
        .unionAll(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    d_src = deg.select(F.col("id").alias("src"), F.col("deg").alias("d_src"))
    d_dst = deg.select(F.col("id").alias("dst"), F.col("deg").alias("d_dst"))
    with_deg = canon.join(d_src, "src").join(d_dst, "dst")
    src_first = (F.col("d_src") < F.col("d_dst")) | (
        (F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst"))
    )
    oriented = with_deg.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("b"),
        F.when(src_first, F.col("d_dst")).otherwise(F.col("d_src")).alias("d_b"),
    )
    return canon, oriented, deg


def triangle_rows(graph: Graph, oriented: DataFrame | None = None) -> DataFrame:
    """One row ``(a, b, c)`` per triangle, apex ``a`` = min (deg,id).

    Callers that already hold the oriented edge table pass it in
    (persisted!) — the wedge self-join plus the closing semi-join read it
    three times, so recomputing it per branch triples the scan cost.
    """
    if graph.directed:
        raise ValueError(
            "triangle counting requires an undirected graph "
            "(LocalClusteringCoefficient.cpp:6-9)"
        )
    if oriented is None:
        _, oriented, _ = _oriented_edges(graph)
    e1 = oriented.select(
        F.col("a"), F.col("b").alias("v1"), F.col("d_b").alias("d_v1")
    )
    e2 = oriented.select(
        F.col("a"), F.col("b").alias("v2"), F.col("d_b").alias("d_v2")
    )
    leg_order = (F.col("d_v1") < F.col("d_v2")) | (
        (F.col("d_v1") == F.col("d_v2")) & (F.col("v1") < F.col("v2"))
    )
    wedges = e1.join(e2, "a").where(leg_order)
    closing = oriented.select(
        F.col("a").alias("v1"), F.col("b").alias("v2")
    )
    tris = wedges.join(closing, ["v1", "v2"], "left_semi").select(
        "a", F.col("v1").alias("b"), F.col("v2").alias("c")
    )
    return tris


class LocalClusteringCoefficient(Centrality):
    """Per-vertex triangle counts + local clustering coefficient
    (``centrality.LocalClusteringCoefficient`` in the reference;
    ``LocalClusteringCoefficient.cpp:47-93``). ``triangles()`` exposes the
    raw counts; ``scores()`` the coefficients."""

    def __init__(self, graph: Graph, turbo: bool = False) -> None:
        if graph.directed:
            raise ValueError(
                "LCC requires an undirected graph (LocalClusteringCoefficient.cpp:6-9)"
            )
        super().__init__(graph)
        self.turbo = turbo  # accepted for API parity; one plan here
        self._triangles: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        if g.number_of_self_loops() > 0:
            raise ValueError(
                "LCC requires no self-loops; call remove_self_loops() first "
                "(LocalClusteringCoefficient.cpp:8)"
            )
        _, oriented, deg = _oriented_edges(g)
        oriented = oriented.persist()
        deg = deg.persist()
        tris = triangle_rows(g, oriented)
        corners = tris.select(
            F.explode(F.array("a", "b", "c")).alias("id")
        )
        counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
        per_node = (
            g.vertices.join(counts, "id", "left")
            .join(deg, "id", "left")
            .select(
                "id",
                F.coalesce("triangles", F.lit(0)).alias("triangles"),
                F.coalesce("deg", F.lit(0)).alias("deg"),
            )
        )
        self._triangles = per_node.select("id", "triangles")
        self._scores = per_node.select(
            "id",
            F.when(
                F.col("deg") >= 2,
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(0.0)
            .alias("score"),
        )

    def triangles(self) -> DataFrame:
        """``(id, triangles)`` exact per-vertex triangle counts."""
        self.assure_finished()
        return self._triangles


class TriangleEdgeScore(Algorithm):
    """Per-edge triangle (common-neighbor) counts
    (``cpp/edgescores/TriangleEdgeScore.cpp:62-109``). Result keyed by the
    canonical edge ``(u<v)`` — the analog of requiring ``indexEdges()``
    (``TriangleEdgeScore.cpp:20-22``) is that scores attach to canonical
    edge keys rather than positional ids."""

    def __init__(self, graph: Graph) -> None:
        if graph.directed:
            raise ValueError("TriangleEdgeScore requires an undirected graph")
        super().__init__(graph)
        self._edge_scores: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        _, oriented, _ = _oriented_edges(g)
        tris = triangle_rows(g, oriented.persist())
        pairs = tris.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
                    ),
                    F.struct(
                        F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")
                    ),
                    F.struct(
                        F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")
                    ),
                )
            ).alias("e")
        ).select("e.u", "e.v")
        counts = pairs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("score"))
        canon = (
            g.canonical()
            .select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        self._edge_scores = canon.join(counts, ["u", "v"], "left").select(
            "u", "v", F.coalesce("score", F.lit(0)).alias("score")
        )

    def edge_scores(self) -> DataFrame:
        self.assure_finished()
        return self._edge_scores


class GlobalClusteringCoefficient(Algorithm):
    """Exact global + average-local clustering coefficients
    (``cpp/global/ClusteringCoefficient.cpp:19-219``):
    ``exactGlobal = Σ 2T(u) / Σ d(u)(d(u)−1)``; ``avgLocal`` averages
    ``c(u)`` over nodes with degree ≥ 2."""

    def __init__(self, graph: Graph) -> None:
        if graph.directed:
            raise ValueError("clustering coefficients require an undirected graph")
        super().__init__(graph)
        self._global: float | None = None
        self._avg_local: float | None = None

    def _run(self) -> None:
        lcc = LocalClusteringCoefficient(self.graph).run()
        tri = lcc.triangles()
        _, _, deg = _oriented_edges(self.graph)
        joined = tri.join(deg, "id", "left").select(
            "triangles", F.coalesce("deg", F.lit(0)).alias("deg")
        )
        row = joined.agg(
            F.sum(2.0 * F.col("triangles")).alias("closed"),
            F.sum(F.col("deg") * (F.col("deg") - 1)).alias("wedges"),
        ).collect()[0]
        self._global = (row["closed"] or 0.0) / row["wedges"] if row["wedges"] else 0.0
        avg = (
            lcc.scores()
            .join(deg, "id", "left")
            .where(F.coalesce("deg", F.lit(0)) >= 2)
            .agg(F.avg("score").alias("a"))
            .collect()[0]["a"]
        )
        self._avg_local = avg or 0.0

    def exact_global(self) -> float:
        self.assure_finished()
        return self._global

    def avg_local(self) -> float:
        self.assure_finished()
        return self._avg_local
