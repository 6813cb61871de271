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

    (sym_edges ∪ zero-weight self rows) ⋈ labels on src
      → groupBy(dst, label).sum(weight)           # weighted histogram
      → row_number over (dst; weight desc, label asc) = 1   # heaviest, tie→smallest

The injected per-vertex self row (weight 0) makes the round plan
reference the label state exactly once (single-reference rule,
``plans/iterate.py``): it carries each node's own label into its
histogram, so isolated nodes keep their label without a second merge
join (a zero-weight candidate can never beat a positive neighbor sum),
and flagging the self row lets the same window pass emit a per-node
``changed`` bit — the update count is then a trivial scan of the
materialized round result instead of an old⋈new join. Two jobs per
round total. The histogram groupBy absorbs hub skew via partial
aggregation; both windows share the per-dst shuffle.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import CheckpointStore, Materializer, local_cut


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
        # zero-weight self row per vertex: carries the node's own label
        # into its histogram (single-reference rule — see module doc).
        sym = sym.unionAll(
            g.vertices.select(
                F.col("id").alias("src"),
                F.col("id").alias("dst"),
                F.lit(0.0).alias("weight"),
            )
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        sym = sym.repartition(shuffle_parts, "src").persist()

        mat = Materializer(self.store)
        if self.base_clustering is not None:
            labels = self.base_clustering.select("id", "label")
        else:
            labels = g.vertices.select("id", F.col("id").alias("label"))
        labels = mat.cut(0, labels, {"phase": "init"})

        it = 0
        while self.max_iterations is None or it < self.max_iterations:
            t0 = time.time()
            it += 1
            hist = (
                sym.join(labels.hint("shuffle_hash"), sym.src == labels.id)
                .groupBy("dst", "label")
                .agg(
                    F.sum("weight").alias("w"),
                    # marks the label group fed by the self row = old label
                    F.max(
                        F.when(F.col("src") == F.col("dst"), 1).otherwise(0)
                    ).alias("own"),
                )
            )
            # heaviest label, ties → smallest = lexicographic min of
            # (-w, label): a plain hash aggregation (map-side partial,
            # no per-dst sort — a row_number window here would re-sort
            # the histogram after its shuffle every round)
            cand = (
                hist.groupBy("dst")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("w")).alias("nw"), F.col("label").alias("lbl")
                        )
                    ).alias("pick"),
                    F.max(
                        F.when(F.col("own") == 1, F.col("label"))
                    ).alias("old_label"),
                )
                .select(
                    F.col("dst").alias("id"),
                    F.col("pick.lbl").alias("label"),
                    (F.col("pick.lbl") != F.col("old_label")).alias("changed"),
                )
            )
            # one materialization per round; the update count is a trivial
            # scan of the checkpointed result (no old⋈new join)
            cand = cand.transform(local_cut)
            updated = cand.where(F.col("changed")).count()
            wall = round(time.time() - t0, 4)
            self._timing.append(wall)
            labels = cand.select("id", "label")
            if self.store is not None:
                labels = mat.cut(
                    it,
                    labels,
                    {"algo": "plp", "updated": updated, "iter_wall_s": wall},
                )
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
