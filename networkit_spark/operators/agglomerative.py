"""ParallelAgglomerativeClusterer — matching-based agglomeration.

Reference: ``cpp/community/ParallelAgglomerativeClusterer.cpp:19-86``
(Staudt & Meyerhenke): repeat { compute a max-weight matching on the
current coarse graph, contract every matched pair, track the
fine→coarse hierarchy } until the contraction shrinks the graph by
less than ``REL_REPEAT_THRSH = 5e-3`` relative (or below
``MIN_NUM_COMMUNITIES = 2`` nodes, or not at all); the nodes of the
last ACCEPTED coarse graph are the communities, projected back to the
finest graph. A rejected final contraction is discarded exactly like
the reference (``Gcopy``/``mapHierarchy`` only update when ``repeat``).

Matching note: the reference constructs ``ModularityScoring`` but its
``scoreEdges`` is an empty TODO (``scoring/ModularityScoring.hpp:75-77``),
so ``PathGrowingMatcher`` actually matches on the coarse EDGE WEIGHTS
— this engine does the same via the distributed
:class:`~networkit_spark.operators.matching.LocalMaxMatcher`
(log-round local-max is the parallel ½-approximation family
PathGrowing also belongs to; the exact matched set may differ, which
is within the reference's own nondeterminism across matcher choices).

Every round is a LocalMaxMatcher run plus one label-contraction
(``ParallelPartitionCoarsening``) — all join/agg rounds; the hierarchy
projection is one label join per accepted level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.coarsening import ParallelPartitionCoarsening
from networkit_spark.operators.matching import LocalMaxMatcher
from networkit_spark.plans.iterate import Materializer


class ParallelAgglomerativeClusterer(Algorithm):
    MIN_NUM_COMMUNITIES = 2
    REL_REPEAT_THRSH = 5e-3

    def __init__(self, graph: Graph, max_levels: int = 64) -> None:
        if graph.directed:
            raise ValueError("community detection needs an undirected graph")
        super().__init__(graph)
        self.max_levels = max_levels
        self._partition: DataFrame | None = None
        self._levels = 0

    def _run(self) -> None:
        mat = Materializer()
        gc = Graph(
            self.graph.edges,
            directed=False,
            weighted=True,
            vertices=self.graph.vertices,
        )
        # fine node → current coarse node
        fine_map = mat.cut(0, self.graph.vertices.select(
            "id", F.col("id").alias("label")
        ))
        for level in range(1, self.max_levels + 1):
            n = gc.number_of_nodes()
            matcher = LocalMaxMatcher(gc).run()
            pairs = matcher.get_matching()
            # matched pair → min endpoint, unmatched → itself
            pair_labels = pairs.select(
                F.col("src").alias("id"), F.least("src", "dst").alias("lab")
            ).unionAll(
                pairs.select(
                    F.col("dst").alias("id"), F.least("src", "dst").alias("lab")
                )
            )
            labels = (
                gc.vertices.join(pair_labels, "id", "left")
                .select("id", F.coalesce("lab", F.col("id")).alias("label"))
            )
            ppc = ParallelPartitionCoarsening(gc, labels).run()
            coarse = ppc.get_coarse_graph()
            cn = coarse.number_of_nodes()
            diff = n - cn
            repeat = (
                diff > 0
                and cn >= self.MIN_NUM_COMMUNITIES
                and diff / n > self.REL_REPEAT_THRSH
            )
            if not repeat:
                break
            mapping = ppc.get_fine_to_coarse_node_mapping()
            fine_map = mat.cut(
                level,
                fine_map.join(
                    F.broadcast(
                        mapping.withColumnRenamed("id", "label")
                    ),
                    "label",
                ).select("id", F.col("super").alias("label")),
            )
            gc = coarse
            self._levels = level
        else:
            raise RuntimeError(
                f"agglomeration did not settle in {self.max_levels} levels"
            )
        self._partition = fine_map

    # ------------------------------------------------------- accessors
    def get_partition(self) -> DataFrame:
        """``(id, label)`` — communities of the finest graph
        (``CommunityDetectionAlgorithm::getPartition``); labels are the
        last accepted coarse graph's node ids."""
        self.assure_finished()
        return self._partition

    def number_of_levels(self) -> int:
        """Accepted contraction levels."""
        self.assure_finished()
        return self._levels
