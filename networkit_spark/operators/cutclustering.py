"""CutClustering — Flake-Tarjan flow-based communities.

Reference: ``cpp/community/CutClustering.cpp:17-80`` (Flake, Tarjan,
Tsioutsiouliklis, "Graph Clustering and Minimum Cut Trees", Internet
Math. 2004 — public): augment the graph with an artificial sink ``t``
connected to every node with weight ``alpha``; walk the nodes in degree
order (the reference's bucket sort yields degree DESC, ties in node-id
order — mirrored exactly); for every still-unclustered node ``u`` run a
max-flow ``u → t`` and make the minimal source-side min cut
(``EdmondsKarp::getSourceSet``) u's cluster, absorbing any earlier
labels inside it. Source sides are nested, so the number of flows is
bounded by the number of final clusters, not n.

Scale notes: every flow is a distributed EdmondsKarp run over the
augmented edge table; the per-flow source set is collected to the
driver (it IS the cluster — CutClustering's use case is compact
communities whose size α controls). ``max_flows`` bounds the
degenerate large-α regime where every node becomes a singleton.
``getClusterHierarchy``'s α-breakpoint search
(``CutClustering.cpp:83-190``) is a driver loop of full runs — out of
scope v1 (documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.flow import EdmondsKarp


class CutClustering(Algorithm):
    def __init__(
        self, graph: Graph, alpha: float, max_flows: int = 1000
    ) -> None:
        if graph.directed:
            raise ValueError("CutClustering needs an undirected graph")
        if alpha <= 0:
            raise ValueError("alpha must be positive")
        super().__init__(graph)
        self.alpha = float(alpha)
        self.max_flows = max_flows
        self._partition: DataFrame | None = None
        self._flows = 0

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        nodes = [
            (r["id"], r["out_deg"])
            for r in g.degrees().select("id", "out_deg").collect()
        ]
        # bucket sort by (n - degree): degree DESC, node id ASC within
        # a degree bucket (CutClustering.cpp:38-62)
        nodes.sort(key=lambda p: (-p[1], p[0]))
        t = max(p[0] for p in nodes) + 1 if nodes else 0
        aug_edges = g.edges.select("src", "dst", "weight").unionAll(
            g.vertices.select(
                F.col("id").alias("src"),
                F.lit(t).alias("dst"),
                F.lit(self.alpha).alias("weight"),
            )
        )
        aug = Graph(aug_edges, directed=False, weighted=True)
        labels: dict[int, int] = {}
        flows = 0
        for u, _deg in nodes:
            if u in labels:
                continue
            if flows >= self.max_flows:
                raise RuntimeError(
                    f"more than {self.max_flows} flows — alpha "
                    "produces too many clusters for this budget"
                )
            flow = EdmondsKarp(aug, u, t).run()
            flows += 1
            for v in flow.get_source_set():
                if v != t:
                    labels[v] = u
        self._flows = flows
        self._partition = spark.createDataFrame(
            [(v, c) for v, c in labels.items()], "id long, label long"
        )

    # ------------------------------------------------------- accessors
    def get_partition(self) -> DataFrame:
        """``(id, label)`` — label = the node whose flow created the
        cluster (``CommunityDetectionAlgorithm::getPartition``)."""
        self.assure_finished()
        return self._partition

    def number_of_flows(self) -> int:
        """Max-flow computations performed (≤ number of clusters)."""
        self.assure_finished()
        return self._flows
