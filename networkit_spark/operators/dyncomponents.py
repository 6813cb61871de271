"""Dynamic connected components — batch-incremental updates.

Reference: ``DynConnectedComponents``
(``cpp/components/DynConnectedComponents.cpp``, 308 LoC): maintains the
component partition under ``GraphEvent`` batches — an edge addition
merges the endpoints' components; an edge removal triggers a search for
a replacement path and splits the component if none exists.

Spark re-expression (batch-at-a-time, like the reference's
``updateBatch``):

- **Additions** (edges and nodes): each added edge whose endpoints carry
  different labels yields a label pair to merge. The label-merge
  relation is at most one pair per added edge — O(batch), not O(graph)
  — so its transitive closure is resolved driver-side with union-find
  and broadcast back as a relabel map (one broadcast join over the
  vertex state; no full recompute).
- **Removals** (edges and nodes): a removal can split a component, which
  no purely local rule can decide (the reference runs a BFS replacement-
  path search, ``DynConnectedComponents.cpp`` update path). We rerun
  hash-min on the induced subgraph of the AFFECTED components only —
  every untouched component keeps its labels. Degrades to a full
  recompute only when removals hit the giant component, the same
  worst case as the reference's BFS search.

Labels keep the engine's canonical form (label = min node id in the
component), so results after any update sequence equal a fresh
:class:`~networkit_spark.operators.components.ConnectedComponents` run
on the updated snapshot — that equivalence is the pytest contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.iterate import local_cut
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.components import (
    ConnectedComponents,
    WeaklyConnectedComponents,
)
from networkit_spark.streaming.events import (
    EDGE_ADDITION,
    EDGE_REMOVAL,
    NODE_ADDITION,
    NODE_REMOVAL,
    apply_events,
)


def _fresh_components(graph: Graph):
    """Static-components dispatch for (re)computations inside the
    dynamic maintainers: weakly-connected kernel on directed graphs."""
    if graph.directed:
        return WeaklyConnectedComponents(graph)
    return ConnectedComponents(graph)


class DynConnectedComponents(Algorithm):
    def __init__(self, graph: Graph) -> None:
        if graph.directed:
            raise ValueError(
                "DynConnectedComponents requires an undirected graph "
                "(DynConnectedComponents.cpp ctor)"
            )
        super().__init__(graph)
        self._labels: DataFrame | None = None

    def _run(self) -> None:
        cc = _fresh_components(self.graph).run()
        self._labels = cc.get_partition().transform(local_cut)

    # ------------------------------------------------------------- updates
    def update(self, events: DataFrame) -> None:
        """Apply one event batch (``DynConnectedComponents::updateBatch``)
        and incrementally maintain the partition."""
        self.assure_finished()
        spark = self.graph.edges.sparkSession
        new_graph = apply_events(self.graph, events)

        removals = events.where(
            F.col("etype").isin(EDGE_REMOVAL, NODE_REMOVAL)
        )
        has_removals = bool(removals.limit(1).count())

        labels = self._labels
        if has_removals:
            # components touched by any removal: recompute only those
            touched_ids = removals.select(F.col("u").alias("id")).unionAll(
                removals.where(F.col("v").isNotNull()).select(
                    F.col("v").alias("id")
                )
            )
            affected = (
                labels.join(touched_ids, "id", "left_semi")
                .select("label")
                .distinct()
            )
            members = labels.join(
                F.broadcast(affected), "label", "left_semi"
            ).select("id")
            sub = new_graph.subgraph_from_nodes(members)
            sub_cc = _fresh_components(sub).run()
            labels = (
                labels.join(F.broadcast(affected), "label", "left_anti")
                # the key join moves "label" to column 0 — re-project
                # before the POSITIONAL unionAll
                .select("id", "label")
                .unionAll(sub_cc.get_partition().select("id", "label"))
            )

        # node additions become singletons unless an added edge merges them
        added_nodes = events.where(F.col("etype") == NODE_ADDITION).select(
            F.col("u").alias("id")
        )
        new_singletons = added_nodes.join(labels, "id", "left_anti").select(
            "id", F.col("id").alias("label")
        )
        adds = events.where(F.col("etype") == EDGE_ADDITION)
        endpoint_ids = adds.select(F.col("u").alias("id")).unionAll(
            adds.select(F.col("v").alias("id"))
        )
        edge_singletons = endpoint_ids.distinct().join(
            labels, "id", "left_anti"
        ).select("id", F.col("id").alias("label"))
        labels = labels.unionAll(new_singletons).unionAll(edge_singletons)
        labels = labels.dropDuplicates(["id"]).transform(local_cut)

        # label pairs to merge: one per added cross-component edge —
        # O(batch) rows, resolved driver-side with union-find
        lu = labels.select(F.col("id").alias("u"), F.col("label").alias("lu"))
        lv = labels.select(F.col("id").alias("v"), F.col("label").alias("lv"))
        pairs = (
            adds.join(lu, "u")
            .join(lv, "v")
            .where(F.col("lu") != F.col("lv"))
            .select("lu", "lv")
            .distinct()
            .collect()
        )
        if pairs:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent.get(x, x) != x:
                    parent[x] = parent.get(parent[x], parent[x])
                    x = parent[x]
                return x

            for r in pairs:
                a, b = find(r["lu"]), find(r["lv"])
                if a != b:
                    lo, hi = (a, b) if a < b else (b, a)
                    parent[hi] = lo
            remap = [(x, find(x)) for x in set(parent)]
            remap_df = spark.createDataFrame(remap, "label long, new_label long")
            labels = (
                labels.join(F.broadcast(remap_df), "label", "left")
                .select("id", F.coalesce("new_label", "label").alias("label"))
                .transform(local_cut)
            )

        self.graph = new_graph
        self._labels = labels

    # ----------------------------------------------------------- accessors
    def get_partition(self) -> DataFrame:
        self.assure_finished()
        return self._labels

    def number_of_components(self) -> int:
        self.assure_finished()
        return self._labels.select("label").distinct().count()

    def component_of_node(self, u: int) -> int:
        self.assure_finished()
        rows = self._labels.where(F.col("id") == u).collect()
        if not rows:
            raise KeyError(u)
        return rows[0]["label"]


class DynWeaklyConnectedComponents(DynConnectedComponents):
    """Directed batch-incremental weakly-connected components
    (``cpp/components/DynWeaklyConnectedComponents.cpp``): identical
    maintenance rules over the undirected view — any added arc weakly
    merges its endpoints' components; removals recompute only the
    affected components with the weakly-connected kernel."""

    def __init__(self, graph: Graph) -> None:
        if not graph.directed:
            raise ValueError(
                "DynWeaklyConnectedComponents requires a directed graph "
                "(DynWeaklyConnectedComponents.cpp ctor)"
            )
        Algorithm.__init__(self, graph)
        self._labels = None
