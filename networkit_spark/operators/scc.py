"""Strongly connected components — trim + forward-backward reachability.

Reference: ``StronglyConnectedComponents`` (``cpp/components/
StronglyConnectedComponents.cpp:28-159``) is iterative Tarjan — DFS with
lowlinks, inherently sequential (SURVEY §2.9 marked it out of scope for
a first cut). This module adds the parallel-friendly formulation
instead: repeated **trim** (a node with no in- or no out-neighbor among
the unassigned set is its own SCC) plus **forward-backward** pivoting
(FW-BW: the SCC of a pivot is forward-reachable ∩ backward-reachable).

The result — the partition into SCCs — is identical to Tarjan's; labels
are canonicalized to the minimum node id in each component.

Scale notes: trim rounds are joins/aggs and run fully distributed; each
pivot round costs two BFS frontier loops. Web graphs are one giant SCC
plus tendrils, which this handles in O(trim rounds) + 1 pivot; a graph
that is a long chain of medium SCCs degenerates to one pivot per SCC
(``max_pivots`` guards it) — the multi-pivot coloring algorithm is the
future fix for that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer, local_cut


def _reachable(edges: DataFrame, seed: DataFrame, mat: Materializer, tag: int) -> DataFrame:
    """Set of nodes reachable from ``seed`` over ``edges`` (frontier BFS)."""
    visited = mat.cut(tag, seed)
    frontier = visited
    hop = 0
    while True:
        hop += 1
        nxt = (
            edges.join(frontier, edges.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
        )
        nxt = mat.cut(tag + hop, nxt)
        if nxt.limit(1).count() == 0:
            return visited
        visited = mat.cut(tag + hop, visited.unionAll(nxt))
        frontier = nxt


class StronglyConnectedComponents(Algorithm):
    def __init__(self, graph: Graph, max_pivots: int = 64) -> None:
        if not graph.directed:
            raise ValueError(
                "StronglyConnectedComponents requires a directed graph "
                "(StronglyConnectedComponents.cpp ctor)"
            )
        super().__init__(graph)
        self.max_pivots = max_pivots
        self._labels: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        edges = mat.cut(0, g.edges.select("src", "dst").distinct())
        remaining = mat.cut(0, g.vertices.select("id"))
        labels: DataFrame | None = None
        pivots = 0
        tag = 0

        def assign(nodes: DataFrame, label_col) -> None:
            nonlocal labels
            chunk = nodes.select("id", label_col.alias("label"))
            labels = chunk if labels is None else labels.unionAll(chunk)
            labels = labels.transform(local_cut)

        while True:
            # ---- trim: peel nodes with no in- or out-edge among remaining
            while True:
                tag += 100
                has_out = edges.select(F.col("src").alias("id")).distinct()
                has_out = mat.cut(tag, has_out)
                has_in = edges.select(F.col("dst").alias("id")).distinct()
                has_in = mat.cut(tag, has_in)
                keep = mat.cut(
                    tag,
                    remaining.join(has_out, "id", "left_semi").join(
                        has_in, "id", "left_semi"
                    ),
                )
                trimmed = remaining.join(keep, "id", "left_anti")
                trimmed = trimmed.transform(local_cut)
                n_trimmed = trimmed.count()
                if n_trimmed == 0:
                    break
                # every trimmed node is its own SCC
                assign(trimmed, F.col("id"))
                remaining = keep
                edges = mat.cut(
                    tag,
                    edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
                    .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi"),
                )
            if remaining.limit(1).count() == 0:
                break
            pivots += 1
            if pivots > self.max_pivots:
                raise RuntimeError(
                    f"SCC exceeded max_pivots={self.max_pivots}; graph has "
                    "too many non-trivial SCCs for FW-BW — raise max_pivots "
                    "or use the coloring variant"
                )
            # ---- forward-backward from the min-id pivot
            pivot = remaining.agg(F.min("id").alias("id"))
            seed = spark.createDataFrame(
                [(pivot.collect()[0]["id"],)], "id long"
            )
            tag += 100
            fwd = _reachable(edges, seed, mat, tag)
            tag += 100
            rev_edges = edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
            bwd = _reachable(rev_edges, seed, mat, tag)
            scc = fwd.join(bwd, "id", "left_semi").transform(local_cut)
            min_id = scc.agg(F.min("id")).collect()[0][0]
            assign(scc, F.lit(min_id).cast("long"))
            remaining = mat.cut(tag, remaining.join(scc, "id", "left_anti"))
            edges = mat.cut(
                tag,
                edges.join(scc.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(scc.withColumnRenamed("id", "dst"), "dst", "left_anti"),
            )
        self._labels = (
            labels
            if labels is not None
            else spark.createDataFrame([], "id long, label long")
        )

    def get_partition(self) -> DataFrame:
        """``(id, label)``, label = min node id in the SCC."""
        self.assure_finished()
        return self._labels

    def number_of_components(self) -> int:
        self.assure_finished()
        return self._labels.select("label").distinct().count()
