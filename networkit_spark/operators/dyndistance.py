"""Dynamic single-source distances — batch-incremental BFS.

Reference: ``cpp/distance/DynBFS.cpp`` (via the ``DynSSSP`` interface,
``cpp/distance/DynSSSP.hpp``): maintain hop distances from a fixed
source under edge insertions; any other event type is rejected
(``DynBFS.cpp:51`` "Graph update not allowed").

Spark re-expression: the initial distances come from the batched BFS
operator; an update seeds a relaxation frontier from the inserted
edges' endpoints (``dist[u]+1 < dist[v]`` in either allowed direction)
and runs standard frontier rounds restricted to strictly-improving
nodes — O(depth of the affected region) rounds, each one gather join,
instead of a full recompute. Contract (tested): distances equal a
fresh BFS on the updated graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.distance import BFS
from networkit_spark.plans.iterate import Materializer, local_cut
from networkit_spark.streaming.events import EDGE_ADDITION, apply_events


class DynBFS(Algorithm):
    def __init__(self, graph: Graph, source: int) -> None:
        super().__init__(graph)
        self.source = source
        self._dist: DataFrame | None = None

    def _run(self) -> None:
        bfs = BFS(self.graph, self.source).run()
        self._dist = bfs.distances()

    def distances(self) -> DataFrame:
        """``(id, dist)`` for reached nodes (``DynBFS`` via
        ``DynSSSP::getDistances``)."""
        self.assure_finished()
        return self._dist

    def update(self, events: DataFrame) -> None:
        """Apply an EDGE_ADDITION batch and relax distances
        incrementally. Non-insertion events raise, mirroring
        ``DynBFS.cpp:51``."""
        self.assure_finished()
        # DynBFS.cpp:51 rejects both non-insertion events AND weighted
        # insertions (edge.w != 1.0) — a weighted edge is not a hop-1
        # edge, so silently accepting it would corrupt hop distances
        others = events.where(
            (F.col("etype") != EDGE_ADDITION)
            | (F.col("w").isNotNull() & (F.col("w") != F.lit(1.0)))
        )
        if bool(others.limit(1).count()):
            raise RuntimeError("Graph update not allowed (DynBFS.cpp:51)")

        new_graph = apply_events(self.graph, events)
        g = new_graph
        nbrs = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst")
            .persist()
        )
        mat = Materializer()
        dist = self._dist
        # seed frontier: endpoints whose distance improves through an
        # inserted edge (both directions on undirected graphs)
        ins = events.where(F.col("etype") == EDGE_ADDITION).select("u", "v")
        dirs = ins
        if not g.directed:
            dirs = ins.unionAll(
                ins.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
        du = dist.select(F.col("id").alias("u"), F.col("dist").alias("du"))
        dv = dist.select(F.col("id").alias("v"), F.col("dist").alias("dv"))
        seed = (
            dirs.join(du, "u")
            .join(dv, "v", "left")
            .where(
                F.col("dv").isNull() | (F.col("du") + 1 < F.col("dv"))
            )
            .groupBy(F.col("v").alias("id"))
            .agg((F.min("du") + 1).alias("dist"))
        )
        it = 0
        frontier = mat.cut(it, seed)
        while bool(frontier.limit(1).count()):
            # merge improvements into dist
            dist = mat.cut(
                it,
                dist.unionAll(frontier)
                .groupBy("id")
                .agg(F.min("dist").alias("dist")),
            )
            it += 1
            cand = (
                nbrs.join(frontier, nbrs.src == frontier.id)
                .groupBy(F.col("dst").alias("id"))
                .agg((F.min("dist") + 1).alias("nd"))
            )
            frontier = mat.cut(
                it,
                cand.join(dist, "id", "left")
                .where(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
                .select("id", F.col("nd").alias("dist")),
            )
        nbrs.unpersist()
        self.graph = g
        self._dist = dist


class DynAPSP(Algorithm):
    """Dynamic all-pairs hop distances — insert-incremental.

    Reference: ``DynAPSP`` (``cpp/distance/DynAPSP.cpp:71-180``):
    accepts edge insertions (and weight decreases) only — other event
    types raise; per inserted edge (u, v) it finds affected sources by
    a truncated BFS and relaxes ``d(x, y) = min(d(x, y),
    d(x, u) + w + d(v, y))`` (both orientations when undirected).

    Spark re-expression: the affected-source BFS is a sequential-pruning
    trick; distributed, the same relaxation is ONE join per inserted
    -edge batch — ``dist(x, u) ⨝ dist(v, y)`` through the batch frame —
    iterated to a fixpoint (distances are monotone non-increasing; a
    path through k new edges settles within k rounds, so the loop is
    bounded by the batch size). State matches APSP's ``(source, id,
    dist)`` frame, including its landmark-subset (SPSP) mode — at scale
    you maintain the landmark rows, not n².

    NOTE: like the reference, NEW node pairs connected for the first
    time get rows only if a relaxation path through an inserted edge
    reaches them from existing state (hop graphs: the reference
    initializes unreachable pairs to infinity; our frame simply lacks
    the row, and the relaxation inserts it).
    """

    def __init__(self, graph: Graph, sources: DataFrame | None = None) -> None:
        super().__init__(graph)
        self.sources = sources
        self._dist: DataFrame | None = None

    def _run(self) -> None:
        from networkit_spark.operators.distance import APSP

        apsp = APSP(self.graph, sources=self.sources).run()
        self._dist = local_cut(apsp.distances())

    def distances(self) -> DataFrame:
        """``(source, id, dist)`` (``DynAPSP::getDistances``)."""
        self.assure_finished()
        return self._dist

    def update(self, events: DataFrame) -> None:
        """Apply an EDGE_ADDITION batch (hop semantics, weight 1) and
        relax all maintained pairs to the new shortest distances."""
        self.assure_finished()
        bad = events.where(
            (F.col("etype") != EDGE_ADDITION)
            | (F.col("w").isNotNull() & (F.col("w") != F.lit(1.0)))
        )
        if bool(bad.limit(1).count()):
            raise RuntimeError(
                "event type not allowed. Edge insertions only "
                "(DynAPSP.cpp:71-73, hop-distance variant)"
            )
        g = apply_events(self.graph, events)
        self.graph = g
        ins = events.select("u", "v")
        if not g.directed:
            ins = ins.unionAll(
                ins.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
        ins = local_cut(ins.distinct())
        dist = self._dist
        for _ in range(1 + ins.count()):
            left = dist.select(
                F.col("source").alias("x"), F.col("id").alias("u"),
                F.col("dist").alias("dxu"),
            )
            right = dist.select(
                F.col("source").alias("v2"), F.col("id").alias("y"),
                F.col("dist").alias("dvy"),
            )
            through = (
                left.join(ins.select(F.col("u"), F.col("v").alias("v2")), "u")
                .join(right, "v2")
                .select(
                    F.col("x").alias("source"), F.col("y").alias("id"),
                    (F.col("dxu") + 1 + F.col("dvy")).alias("cand"),
                )
                .groupBy("source", "id")
                .agg(F.min("cand").alias("cand"))
            )
            merged = (
                dist.join(through, ["source", "id"], "full_outer")
                .select(
                    "source", "id",
                    F.least(
                        F.coalesce("dist", F.lit(float("inf"))),
                        F.coalesce("cand", F.lit(float("inf"))),
                    ).alias("dist"),
                )
            )
            merged = local_cut(merged)
            changed = (
                merged.join(
                    dist.withColumnRenamed("dist", "old"),
                    ["source", "id"],
                    "left",
                )
                .where(
                    F.col("old").isNull() | (F.col("dist") < F.col("old"))
                )
                .count()
            )
            dist = merged
            if changed == 0:
                break
        self._dist = dist


class DynDijkstra(Algorithm):
    """Dynamic weighted SSSP — insert/decrease-incremental.

    Reference: ``DynDijkstra`` (``cpp/distance/DynDijkstra.cpp:40-100``):
    ``update`` accepts EDGE_ADDITION and EDGE_WEIGHT_UPDATE only (other
    event types raise, ``DynDijkstra.cpp:61``) and relaxes from the
    touched endpoints with a seeded priority queue — improvements only,
    so only weight DECREASES take effect (the reference has the same
    limitation, noted in its own TODO at ``DynDijkstra.cpp:63``).

    Spark re-expression: the seed set is every edge direction whose
    relaxation improves the stored distance; then the same weighted
    relaxation rounds as :class:`~networkit_spark.operators.distance.
    Dijkstra`, started from the seeds instead of the source — work is
    proportional to the affected region, not the graph.
    """

    def __init__(self, graph: Graph, source: int) -> None:
        super().__init__(graph)
        self.source = source
        self._dist: DataFrame | None = None

    def _run(self) -> None:
        from networkit_spark.operators.distance import Dijkstra

        algo = Dijkstra(self.graph, self.source).run()
        self._dist = local_cut(algo.distances())

    def distances(self) -> DataFrame:
        """``(id, dist)`` for reached nodes (``DynSSSP::getDistances``)."""
        self.assure_finished()
        return self._dist

    def update(self, events: DataFrame) -> None:
        """Apply an EDGE_ADDITION / EDGE_WEIGHT_UPDATE batch and relax."""
        from networkit_spark.streaming.events import EDGE_WEIGHT_UPDATE

        self.assure_finished()
        others = events.where(
            ~F.col("etype").isin(EDGE_ADDITION, EDGE_WEIGHT_UPDATE)
        )
        if bool(others.limit(1).count()):
            raise RuntimeError("Graph update not allowed (DynDijkstra.cpp:61)")
        new_graph = apply_events(self.graph, events)
        g = new_graph
        if g.edges.where(F.col("weight") < 0).limit(1).count():
            raise ValueError("Dijkstra requires non-negative edge weights")
        adj = (
            (g.edges if g.directed else g.symmetrized())
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.min("weight").alias("w"))
            .persist()
        )
        mat = Materializer()
        dist = self._dist
        touched = events.select("u", "v", "w")
        if not g.directed:
            touched = touched.unionAll(
                touched.select(
                    F.col("v").alias("u"), F.col("u").alias("v"), "w"
                )
            )
        du = dist.select(F.col("id").alias("u"), F.col("dist").alias("du"))
        dv = dist.select(F.col("id").alias("v"), F.col("dist").alias("dv"))
        seed = (
            touched.join(du, "u")
            .join(dv, "v", "left")
            .where(
                F.col("dv").isNull() | (F.col("du") + F.col("w") < F.col("dv"))
            )
            .groupBy(F.col("v").alias("id"))
            .agg(F.min(F.col("du") + F.col("w")).alias("dist"))
        )
        it = 0
        frontier = mat.cut(it, seed)
        while bool(frontier.limit(1).count()):
            dist = mat.cut(
                it,
                dist.unionAll(frontier)
                .groupBy("id")
                .agg(F.min("dist").alias("dist")),
            )
            it += 1
            cand = (
                adj.join(
                    frontier.withColumnRenamed("id", "src").hint(
                        "shuffle_hash"
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
            )
            frontier = mat.cut(
                it,
                cand.join(dist, "id", "left")
                .where(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
                .select("id", F.col("nd").alias("dist")),
            )
        adj.unpersist()
        self.graph = g
        self._dist = dist
