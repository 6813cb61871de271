"""DynTopHarmonicCloseness — top-k harmonic closeness maintained under
edge insertions and removals.

Reference: ``DynTopHarmonicCloseness``
(``include/networkit/centrality/DynTopHarmonicCloseness.hpp:26-100``,
``cpp/centrality/DynTopHarmonicCloseness.cpp``; Borassi/Bergamini et
al. static algorithms + per-event affected-node updates driven by
Dyn(Weakly)ConnectedComponents). The reference's machinery — per-node
upper bounds, pruned BFS cones, component bookkeeping — exists to
avoid sequentially re-running n BFSs per event. Distributed, the same
information lives in the maintained all-pairs hop-distance frame:

- insertions relax the pair frame in ONE broadcast-join pass (a new
  shortest path uses the new edge exactly once — the DynAPSP
  closed form, shared machinery in
  :class:`networkit_spark.operators.dynbetweenness._DynPairsState`);
- removals rebuild the frame with one batched all-sources BFS (the
  reference walks the affected component per event; batched, the
  recompute costs the same O(diameter) join-agg rounds regardless of
  how many sources it carries — there is no sequential cone to save);
- harmonic scores are one ``groupBy(s).sum(1/d)`` over the frame and
  the top-k/trail selection is one ordered limit.

O(n²) state is inherent to exact dynamic distance maintenance (the
reference stores the same); fixture/medium scale, like DynAPSP.
Unweighted hop graphs; directed graphs maintain the TRANSPOSED frame so
``h(u) = Σ 1/d(·→u)`` matches ``HarmonicCloseness`` (reverse-BFS
convention of ``harmonic_closeness``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.dynbetweenness import _DynPairsState
from networkit_spark.plans.iterate import local_cut
from networkit_spark.streaming.events import (
    EDGE_ADDITION,
    EDGE_REMOVAL,
    apply_events,
)


class DynTopHarmonicCloseness:
    def __init__(self, graph: Graph, k: int = 1, use_bfs_bound: bool = False) -> None:
        if k < 1:
            raise ValueError("k must be at least 1")
        self.k = int(k)
        # use_bfs_bound selects between the reference's two sequential
        # pruning strategies; the batched plan computes exact scores
        # either way, so it is accepted and ignored (documented above)
        self._graph = graph
        self._work = graph.transpose() if graph.directed else graph
        self._state = _DynPairsState(self._work)
        self._pairs: DataFrame | None = None
        self._scores: DataFrame | None = None

    @property
    def graph(self) -> Graph:
        return self._graph

    def run(self) -> "DynTopHarmonicCloseness":
        self._pairs = self._state.build()
        self._recompute_scores()
        return self

    def _recompute_scores(self) -> None:
        h = (
            self._pairs.where(F.col("d") > 0)
            .groupBy(F.col("s").alias("id"))
            .agg(F.sum(F.lit(1.0) / F.col("d")).alias("score"))
        )
        self._scores = local_cut(
            self._work.vertices.join(h, "id", "left").select(
                "id", F.coalesce("score", F.lit(0.0)).alias("score")
            )
        )

    # ------------------------------------------------------- updates
    def update(self, events: DataFrame) -> None:
        """``updateBatch``: edge additions apply the one-pass
        relaxation per event; any removal triggers the batched
        rebuild. Other event types raise, like the reference."""
        bad = events.where(
            ~F.col("etype").isin(EDGE_ADDITION, EDGE_REMOVAL)
        )
        if bool(bad.limit(1).count()):
            raise RuntimeError(
                "event type not allowed. Edge insertions and removals "
                "only (DynTopHarmonicCloseness.hpp:90-100)"
            )
        has_removal = bool(
            events.where(F.col("etype") == EDGE_REMOVAL).limit(1).count()
        )
        rows = events.select("etype", "u", "v").collect()
        spark = self._graph.edges.sparkSession
        for r in rows:
            u, v = int(r["u"]), int(r["v"])
            ev = spark.createDataFrame(
                [(r["etype"], u, v, 1.0)],
                "etype string, u long, v long, w double",
            )
            self._graph = apply_events(self._graph, ev)
            work_new = (
                self._graph.transpose() if self._graph.directed else self._graph
            )
            if r["etype"] == EDGE_ADDITION and not has_removal:
                wu, wv = (v, u) if self._graph.directed else (u, v)
                self._pairs, _ = self._state.insert_edge(self._pairs, wu, wv)
            self._work = work_new
            self._state.graph = work_new
        if has_removal:
            self._pairs = self._state.build()
        self._recompute_scores()

    # ----------------------------------------------------- accessors
    def _ranked(self, include_trail: bool) -> list:
        rows = (
            self._scores.orderBy(F.desc("score"), F.asc("id")).collect()
        )
        if len(rows) <= self.k:
            return rows
        if not include_trail:
            return rows[: self.k]
        kth = rows[self.k - 1]["score"]
        out = rows[: self.k]
        for r in rows[self.k :]:
            if r["score"] == kth:
                out.append(r)
            else:
                break
        return out

    def ranking(self, include_trail: bool = False) -> list[tuple[int, float]]:
        """``ranking(includeTrail)`` — (node, score) pairs, score desc,
        id asc; trail = past-k nodes tied with the k-th score."""
        return [(r["id"], r["score"]) for r in self._ranked(include_trail)]

    def topk_nodes_list(self, include_trail: bool = False) -> list[int]:
        return [r["id"] for r in self._ranked(include_trail)]

    def topk_scores_list(self, include_trail: bool = False) -> list[float]:
        return [r["score"] for r in self._ranked(include_trail)]

    def reset(self) -> None:
        """``reset`` — drop maintained state (rerun required)."""
        self._pairs = None
        self._scores = None
