"""Group centrality — greedy group-degree maximization.

Reference: ``cpp/centrality/GroupDegree.cpp:43-127`` — greedy selection
of k nodes maximizing the group degree (number of nodes adjacent to the
group; optionally counting group members themselves via
``countGroupNodes``). The reference maintains a lazy bucket priority
queue with incremental gain updates; this engine recomputes the EXACT
marginal gain for every candidate each step as one join-agg (k driver
rounds, each a single distributed pass — no per-node queue state).

Deliberate divergences, documented:

- ties break toward the smallest node id (the reference inherits the
  unspecified extraction order of its bucket PQ);
- gains are exact every round; the reference's lazy recompute drops the
  "+1 for covering the candidate itself" term for
  ``countGroupNodes=true`` after the first extraction
  (``GroupDegree.cpp:97-126`` recomputes only neighbor coverage), so
  its selections can differ by that off-by-one on specific graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import local_cut


class GroupDegree(Algorithm):
    def __init__(
        self, graph: Graph, k: int = 5, count_group_nodes: bool = False
    ) -> None:
        if k <= 0:
            raise ValueError("k must be between 1 and n")
        super().__init__(graph)
        self.k = k
        self.count_group_nodes = count_group_nodes
        self._group: list[int] = []
        self._score = 0

    def _run(self) -> None:
        g = self.graph
        # the reference ctor (GroupDegree.cpp) also throws for k > n;
        # checked here (not in __init__) so construction stays lazy —
        # counting n is a Spark job
        if self.k > g.number_of_nodes():
            raise ValueError("k must be between 1 and n")
        spark = g.edges.sparkSession
        out_adj = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        group: list[int] = []
        # covered = group ∪ N_out(group), as (id) rows
        covered = spark.createDataFrame([], "id long")
        for _ in range(self.k):
            cand = out_adj.join(
                covered.withColumnRenamed("id", "dst"), "dst", "left_anti"
            ).groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("nbr_gain")
            )
            base = g.vertices.join(cand, "id", "left").select(
                "id", F.coalesce("nbr_gain", F.lit(0)).alias("nbr_gain")
            )
            if group:
                base = base.where(~F.col("id").isin(group))
            in_cov = covered.select(F.col("id"), F.lit(1).alias("cov"))
            base = base.join(in_cov, "id", "left").select(
                "id", "nbr_gain", F.coalesce("cov", F.lit(0)).alias("cov")
            )
            if self.count_group_nodes:
                gain = F.col("nbr_gain") + (1 - F.col("cov"))
            else:
                gain = F.col("nbr_gain") - F.col("cov")
            pick = (
                base.select("id", gain.alias("gain"))
                .orderBy(F.desc("gain"), F.asc("id"))
                .limit(1)
                .collect()
            )
            if not pick:
                break
            u = pick[0]["id"]
            group.append(u)
            newly = (
                out_adj.where(F.col("src") == u)
                .select(F.col("dst").alias("id"))
                .unionAll(spark.createDataFrame([(u,)], "id long"))
            )
            covered = local_cut(
                covered.unionAll(newly).distinct()
            )
        self._group = group
        n_cov = covered.count()
        # groupScore = |reachable| (− k when group members don't count:
        # GroupDegree.hpp:96-102)
        self._score = n_cov - (0 if self.count_group_nodes else len(group))
        out_adj.unpersist()

    def group_max_degree(self) -> list[int]:
        """``GroupDegree::groupMaxDegree`` (``GroupDegree.hpp:86-89``)."""
        self.assure_finished()
        return self._group

    def get_score(self) -> int:
        """``GroupDegree::getScore`` (``GroupDegree.hpp:91-94``)."""
        self.assure_finished()
        return self._score
