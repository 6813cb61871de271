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


#: use the broadcast adjacency-intersection strategy when the oriented
#: edge count is at or below this (the whole oriented adjacency table —
#: ~8 bytes/edge as long arrays — must fit in one broadcast; 8M edges
#: ≈ 64 MB, the session's autoBroadcastJoinThreshold).
INTERSECT_EDGE_LIMIT = 8_000_000


def triangle_rows(
    graph: Graph,
    oriented: DataFrame | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """One row ``(a, b, c)`` per triangle, apex ``a`` = min (deg,id).

    Callers that already hold the oriented edge table pass it in
    (persisted!) — every strategy reads it more than once, so
    recomputing it per branch multiplies the scan cost.

    Two physical strategies, identical output:

    - ``wedge`` (the at-scale default): self-join on the shared apex +
      closing-edge semi-join — materializes O(Σ C(d_o,2)) wedge rows
      through a shuffle, but per-row state is constant, so it survives
      any degree distribution (the (deg,id) orientation bounds d_o by
      O(√m), ``LocalClusteringCoefficient.cpp:20-22``).
    - ``intersect``: group the oriented out-neighborhoods into arrays,
      broadcast-join them onto both endpoints of each oriented edge and
      ``explode(array_intersect(...))`` — no shuffle at all and no wedge
      materialization (each triangle is found at its lowest edge), the
      classic edge-iterator. Only legal while the WHOLE adjacency table
      broadcasts (≤ ``INTERSECT_EDGE_LIMIT`` oriented edges); dense
      derived graphs hit this path, a 10^12-edge web graph falls back
      to ``wedge``.
    """
    if graph.directed:
        raise ValueError(
            "triangle counting requires an undirected graph "
            "(LocalClusteringCoefficient.cpp:6-9)"
        )
    if oriented is None:
        _, oriented, _ = _oriented_edges(graph)
    if strategy == "auto":
        m = oriented.count()  # cheap on the persisted frame callers pass
        strategy = "intersect" if m <= INTERSECT_EDGE_LIMIT else "wedge"
    if strategy == "intersect":
        # persisted: read once per broadcast exchange below
        adj = oriented.groupBy("a").agg(
            F.collect_list("b").alias("nbrs")
        ).persist()
        adj_a = F.broadcast(adj.select(F.col("a"), F.col("nbrs").alias("nbrs_a")))
        adj_b = F.broadcast(
            adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nbrs_b"))
        )
        return (
            oriented.select("a", "b")
            .join(adj_a, "a")
            .join(adj_b, "b")
            .select(
                "a",
                "b",
                F.explode(F.array_intersect("nbrs_a", "nbrs_b")).alias("c"),
            )
            .select("a", "b", "c")
        )
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


def _counts_by_intersect(canon: DataFrame, deg: DataFrame):
    """Per-edge common-neighbor COUNTS without enumerating triangles:
    ``(u, v, score = |N(u) ∩ N(v)|)`` via two broadcast joins of the full
    adjacency arrays + ``size(array_intersect(...))``. On graphs dense
    enough that the triangle count rivals the wedge count (derived /
    clustered graphs), this skips materializing the O(#triangles)
    row stream entirely — measured ~2x over enumerate-then-aggregate on
    a 1k-vertex/356k-edge graph. Returns None when the guards say no:
    the adjacency table must broadcast (m ≤ INTERSECT_EDGE_LIMIT) and
    the intersection work Σ d(u)+d(v) ≈ m·maxdeg must stay bounded —
    a hub vertex makes full-neighborhood intersection quadratic, which
    is exactly what the wedge path's (deg,id) orientation avoids, so
    hubby/web-scale graphs take the wedge path."""
    row = deg.agg(F.max("deg").alias("mx"), F.sum("deg").alias("s")).collect()[0]
    m = (row["s"] or 0) // 2
    mx = row["mx"] or 0
    if m > INTERSECT_EDGE_LIMIT or m * mx > 2_000_000_000:
        return None
    sym = canon.select("src", "dst").unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # persisted: each of the two broadcast exchanges below re-reads it
    adj = sym.groupBy("src").agg(F.collect_list("dst").alias("nbrs")).persist()
    a_u = F.broadcast(adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nu")))
    a_v = F.broadcast(adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nv")))
    return (
        canon.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(a_u, "u")
        .join(a_v, "v")
        .select(
            "u",
            "v",
            F.size(F.array_intersect("nu", "nv")).cast("long").alias("score"),
        )
    )


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
        canon, oriented, deg = _oriented_edges(g)
        deg = deg.persist()
        per_edge = _counts_by_intersect(canon.persist(), deg)
        if per_edge is not None:
            # T(u) = Σ_{v∈N(u)} |N(u)∩N(v)| / 2 — every triangle at u is
            # found on both of its u-incident edges
            counts = (
                per_edge.select(
                    F.explode(F.array("u", "v")).alias("id"), "score"
                )
                .groupBy("id")
                .agg((F.sum("score") / 2).cast("long").alias("triangles"))
            )
        else:
            tris = triangle_rows(g, oriented.persist(), strategy="wedge")
            corners = tris.select(
                F.explode(F.array("a", "b", "c")).alias("id")
            )
            counts = corners.groupBy("id").agg(
                F.count(F.lit(1)).alias("triangles")
            )
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
        canon, oriented, deg = _oriented_edges(g)
        canon = canon.persist()
        per_edge = _counts_by_intersect(canon, deg)
        if per_edge is not None:
            self._edge_scores = per_edge
            return
        tris = triangle_rows(g, oriented.persist(), strategy="wedge")
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
        canon = canon.select(F.col("src").alias("u"), F.col("dst").alias("v"))
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
