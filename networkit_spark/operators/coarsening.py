"""Graph coarsening — contract a graph by a partition.

Reference: ``ParallelPartitionCoarsening``
(``cpp/coarsening/ParallelPartitionCoarsening.cpp:23-137``): each cluster
becomes a super-node; edge (u,v,w) becomes (super(u), super(v), Σw);
intra-cluster edges become self-loops on the super-node. Super-node ids
are the compacted (dense 0-based) cluster labels
(``Partition::compact`` precedent, ``cpp/structures/Partition.cpp:69-98``),
and ``getFineToCoarseNodeMapping`` exposes the node → super-node map.

Spark plan (SURVEY §2.4 row 4): two equi-joins of the edge table against
the labels table + one hash aggregation — the exact shape Catalyst
already optimizes (partial aggregation absorbs hub clusters). This is
also the accelerator step the reference's parallel CC uses after 8
rounds (``ParallelConnectedComponents.cpp:81-94``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph, zip_dense_rank
from networkit_spark.operators.base import Algorithm


class ParallelPartitionCoarsening(Algorithm):
    def __init__(self, graph: Graph, labels: DataFrame) -> None:
        super().__init__(graph)
        self.labels = labels.select("id", "label")
        self._coarse: Graph | None = None
        self._mapping: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        # compact labels to dense 0-based super-node ids — distributed
        # rank (no global single-partition window; runs once per PLM level)
        compact = zip_dense_rank(self.labels, "label", "super")
        mapping = self.labels.join(F.broadcast(compact), "label").select("id", "super")
        l_src = mapping.select(F.col("id").alias("src"), F.col("super").alias("s_src"))
        l_dst = mapping.select(F.col("id").alias("dst"), F.col("super").alias("s_dst"))
        base = g.edges if g.directed else g.canonical()
        contracted = (
            base.join(l_src, "src")
            .join(l_dst, "dst")
            .select(
                F.least("s_src", "s_dst").alias("src")
                if not g.directed
                else F.col("s_src").alias("src"),
                F.greatest("s_src", "s_dst").alias("dst")
                if not g.directed
                else F.col("s_dst").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
        self._coarse = Graph(
            contracted,
            directed=g.directed,
            weighted=True,
            vertices=mapping.select(F.col("super").alias("id")).distinct(),
        )
        self._mapping = mapping

    def get_coarse_graph(self) -> Graph:
        self.assure_finished()
        return self._coarse

    def get_fine_to_coarse_node_mapping(self) -> DataFrame:
        """``(id, super)`` node → super-node
        (``ParallelPartitionCoarsening::getFineToCoarseNodeMapping``)."""
        self.assure_finished()
        return self._mapping


def project_back(fine_to_coarse: DataFrame, zeta_coarse: DataFrame) -> DataFrame:
    """``ClusteringProjector::projectBack``
    (``cpp/coarsening/ClusteringProjector.cpp:14-26``): assign every
    fine node the cluster of its super-node — one hash join of the
    ``(id, super)`` mapping against the coarse ``(id, label)``
    partition. Returns the fine ``(id, label)`` frame."""
    coarse = zeta_coarse.select(F.col("id").alias("super"), "label")
    return fine_to_coarse.join(coarse, "super").select("id", "label")


def project_back_to_finest(
    zeta_coarse: DataFrame, maps: list[DataFrame]
) -> DataFrame:
    """``ClusteringProjector::projectBackToFinest``
    (``ClusteringProjector.cpp:28-61``): compose the per-level
    ``(id, super)`` mappings (finest → coarsest order, exactly the
    reference's ``maps`` vector) into one finest→coarsest mapping with
    a chain of hash joins, then project. With no levels the coarse
    partition IS the finest one (the reference's early return)."""
    if not maps:
        return zeta_coarse.select("id", "label")
    comp = maps[0].select("id", "super")
    for m in maps[1:]:
        nxt = m.select(F.col("id").alias("super"), F.col("super").alias("_up"))
        comp = comp.join(nxt, "super").select("id", F.col("_up").alias("super"))
    return project_back(comp, zeta_coarse)


class MatchingCoarsening(Algorithm):
    """Contract an undirected graph by a matching.

    Reference: ``MatchingCoarsening``
    (``cpp/coarsening/MatchingCoarsening.cpp:15-60``,
    ``include/networkit/coarsening/MatchingCoarsening.hpp``): each
    matched pair collapses into one super-node, unmatched nodes carry
    over; coarse ids are assigned sequentially in ascending fine-id
    order (a matched pair takes the id slot of its smaller endpoint),
    and edge weights sum. ``noSelfLoops`` drops the self-loop a
    matched pair's own edge would become
    (``MatchingCoarsening.cpp:47``).

    Spark plan: representative(v) = min(v, mate(v)) via one left join
    of the vertex set against the matching (both orientations), the
    reference's sequential idx = the 0-based ascending dense rank of
    the representatives (``zip_dense_rank`` — the same distributed
    compaction ``ParallelPartitionCoarsening`` uses), then the
    standard two-equi-join + hash-agg contraction. No driver-side
    iteration — the reference's "difficult in parallel" sequential
    id scan (``MatchingCoarsening.cpp:25``) is exactly an
    order-preserving dense rank.
    """

    def __init__(
        self, graph: Graph, matching: DataFrame, no_self_loops: bool = False
    ) -> None:
        if graph.directed:
            raise ValueError(
                "Only defined for undirected graphs. "
                "(MatchingCoarsening.cpp ctor)"
            )
        super().__init__(graph)
        self.matching = matching.select("src", "dst")
        self.no_self_loops = no_self_loops
        self._coarse: Graph | None = None
        self._mapping: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        # mate(v) for both orientations of each matched pair
        mates = self.matching.select(
            F.col("src").alias("id"), F.col("dst").alias("mate")
        ).unionAll(
            self.matching.select(
                F.col("dst").alias("id"), F.col("src").alias("mate")
            )
        )
        reps = (
            g.vertices.join(mates, "id", "left")
            .select(
                "id",
                F.least("id", F.coalesce("mate", F.col("id"))).alias("rep"),
            )
        )
        compact = zip_dense_rank(reps.select("rep"), "rep", "super")
        mapping = reps.join(F.broadcast(compact), "rep").select("id", "super")
        l_src = mapping.select(F.col("id").alias("src"), F.col("super").alias("s_src"))
        l_dst = mapping.select(F.col("id").alias("dst"), F.col("super").alias("s_dst"))
        contracted = (
            g.canonical()
            .join(l_src, "src")
            .join(l_dst, "dst")
            .select(
                F.least("s_src", "s_dst").alias("src"),
                F.greatest("s_src", "s_dst").alias("dst"),
                "weight",
            )
        )
        if self.no_self_loops:
            contracted = contracted.where(F.col("src") != F.col("dst"))
        contracted = contracted.groupBy("src", "dst").agg(
            F.sum("weight").alias("weight")
        )
        self._coarse = Graph(
            contracted,
            directed=False,
            weighted=True,
            vertices=mapping.select(F.col("super").alias("id")).distinct(),
        )
        self._mapping = mapping

    def get_coarse_graph(self) -> Graph:
        self.assure_finished()
        return self._coarse

    def get_fine_to_coarse_node_mapping(self) -> DataFrame:
        """``(id, super)`` node → super-node (``getFineToCoarseNodeMapping``)."""
        self.assure_finished()
        return self._mapping
