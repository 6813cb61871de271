"""PLP — synchronous label-propagation community detection.

Reference (``cpp/community/PLP.cpp:18-133``): labels init to singletons
(or a base clustering); per sweep each node adopts the **heaviest
neighbor label** — weighted label histogram with ties broken toward the
smallest label (``std::map`` ascending order + strict ``max_element``
comparator keeps the first maximum, ``PLP.cpp:78-90``); nodes with no
neighbors stay singletons (``PLP.cpp:48-59``); terminate when the number
of updated nodes ≤ ``updateThreshold`` (default ``n/1e5``,
``PLP.cpp:39-41``) or ``maxIterations`` is hit.

The reference sweep is asynchronous and OpenMP-racy (``PLP.cpp:75-105``)
— its exact labels are nondeterministic run-to-run. This engine uses the
**synchronous** variant (north_star: "synchronous label propagation,
PLP-equivalent"): all nodes update from the previous round's labels, so
results are deterministic given the input. Equivalence with the
reference is therefore asserted at the invariant level (proper
clustering, planted-partition recovery — SURVEY §5), not label-for-label.

Spark plan per round:

    sym_edges ⋈ labels on src
      → groupBy(dst, label).sum(weight)           # weighted histogram
      → row_number over (dst; weight desc, label asc) = 1   # heaviest, tie→smallest
      → compare to previous labels, count updates

The histogram groupBy absorbs hub skew via partial aggregation; the
window is per-dst and shuffles on dst only.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import CheckpointStore, Materializer


class PLP(Algorithm):
    def __init__(
        self,
        graph: Graph,
        update_threshold: int | None = None,
        max_iterations: int | None = 100,
        base_clustering: DataFrame | None = None,
        store: CheckpointStore | None = None,
    ) -> None:
        super().__init__(graph)
        self.update_threshold = update_threshold
        self.max_iterations = max_iterations
        self.base_clustering = base_clustering
        self.store = store
        self._labels: DataFrame | None = None
        self._iterations = 0
        self._timing: list[float] = []

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        n = g.number_of_nodes()
        # default updateThreshold = n/1e5 (PLP.cpp:39-41)
        threshold = (
            self.update_threshold
            if self.update_threshold is not None
            else max(int(n / 1e5), 0)
        )
        sym = g.symmetrized().select("src", "dst", "weight")
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        sym = sym.repartition(shuffle_parts, "src").persist()

        mat = Materializer(self.store)
        if self.base_clustering is not None:
            labels = self.base_clustering.select("id", "label")
        else:
            labels = g.vertices.select("id", F.col("id").alias("label"))
        labels = mat.cut(0, labels, {"phase": "init"})

        w = Window.partitionBy("dst").orderBy(F.desc("w"), F.asc("label"))
        it = 0
        while self.max_iterations is None or it < self.max_iterations:
            t0 = time.time()
            it += 1
            hist = (
                sym.join(labels, sym.src == labels.id)
                .groupBy("dst", "label")
                .agg(F.sum("weight").alias("w"))
            )
            heaviest = (
                hist.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(F.col("dst").alias("id"), F.col("label").alias("new_label"))
            )
            # materialize the winner table BEFORE merging it with the old
            # labels: the merge below references `labels` again, and the
            # round plan may reference the in-flight state only once
            # (single-reference rule, plans/iterate.py). Always an
            # in-memory checkpoint — it's intra-round, not a resume point.
            heaviest = heaviest.localCheckpoint(eager=True)
            # isolated nodes keep their label (PLP.cpp:48-59)
            cand = labels.join(heaviest, "id", "left").select(
                "id", F.coalesce("new_label", F.col("label")).alias("label")
            )
            cand = mat.cut(it, cand, None) if self.store is None else cand
            updated = (
                cand.alias("new")
                .join(labels.alias("old"), "id")
                .where(F.col("new.label") != F.col("old.label"))
                .count()
            )
            wall = round(time.time() - t0, 4)
            self._timing.append(wall)
            if self.store is not None:
                cand = mat.cut(
                    it, cand, {"algo": "plp", "updated": updated, "iter_wall_s": wall}
                )
            labels = cand
            if updated <= threshold:
                break
        self._iterations = it
        self._labels = labels
        sym.unpersist()

    def get_partition(self) -> DataFrame:
        self.assure_finished()
        return self._labels

    def number_of_iterations(self) -> int:
        """``PLP::numberOfIterations`` (``community.pyx:441-448``)."""
        self.assure_finished()
        return self._iterations

    def get_timing(self) -> list[float]:
        """Per-iteration wall seconds (``PLP::getTiming``)."""
        self.assure_finished()
        return self._timing
