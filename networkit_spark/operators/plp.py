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


class LPDegreeOrdered(Algorithm):
    """Degree-ordered label propagation (``cpp/community/LPDegreeOrdered.cpp:18-88``).

    The reference visits nodes one at a time in increasing-degree order,
    asynchronously: each node adopts the *most frequent* neighbor label
    (unweighted counts, ``LPDegreeOrdered.cpp:37-48``), updates are
    immediately visible to later nodes, and a sweep repeats while more
    than ``theta = n/1e5`` nodes changed (``LPDegreeOrdered.cpp:77-84``).
    Its tie-break is the first maximum in ``unordered_map`` iteration
    order — nondeterministic even single-threaded.

    Distributed formulation (documented divergence, same spirit as PLP's
    sync-vs-async note): nodes are bucketed into ``batches`` contiguous
    degree ranks; one sweep processes the batches in increasing-degree
    order, synchronously *within* a batch and sequentially *across*
    batches, so low-degree nodes still commit their labels before
    high-degree nodes read them — the property the degree ordering
    exists for. Ties break toward the smallest label (deterministic;
    the reference makes no promise here at all). Isolated nodes never
    update (``degree(v) > 0`` guard in the reference).

    Plan per batch step: filter the persisted symmetrized edge table to
    rows whose dst falls in the batch (one scan, pruned by the
    precomputed ``dst_batch`` column), join current labels on src
    (shuffle-hash), unweighted label histogram via groupBy partial
    aggregation, lexicographic-min pick — identical shuffle shape to
    PLP, ``batches``× rounds per sweep.
    """

    def __init__(
        self,
        graph: Graph,
        batches: int = 4,
        update_threshold: int | None = None,
        max_sweeps: int | None = 50,
    ) -> None:
        super().__init__(graph)
        if batches < 1:
            raise ValueError("batches must be >= 1")
        self.batches = batches
        self.update_threshold = update_threshold
        self.max_sweeps = max_sweeps
        self._labels: DataFrame | None = None
        self._sweeps = 0

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        n = g.number_of_nodes()
        theta = (
            self.update_threshold
            if self.update_threshold is not None
            else max(int(n / 1e5), 0)
        )
        b_count = self.batches
        sym = g.symmetrized().select("src", "dst")
        deg = sym.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
        # increasing-degree batch rank; id tie-break keeps it deterministic
        verts = g.vertices.join(deg, "id", "left").select(
            "id", F.coalesce("deg", F.lit(0)).alias("deg")
        )
        # degree-quantile batch boundaries (a global ntile window would
        # sort all V rows through one partition; a percentile sketch +
        # range assignment is one aggregate and stays distributed)
        if b_count == 1:
            batched = verts.select("id", "deg", F.lit(1).alias("batch"))
        else:
            qs = [i / b_count for i in range(1, b_count)]
            bounds = verts.select(
                F.percentile_approx("deg", qs, 10_000).alias("b")
            ).collect()[0]["b"]
            expr = F.lit(b_count)
            for i in range(b_count - 2, -1, -1):
                expr = F.when(F.col("deg") <= bounds[i], F.lit(i + 1)).otherwise(expr)
            batched = verts.select("id", "deg", expr.alias("batch"))
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # messages: unit weight per neighbor + a zero-weight self row that
        # carries the node's own label (single-reference rule, as PLP)
        msgs = sym.select("src", "dst", F.lit(1.0).alias("w")).unionAll(
            g.vertices.select(
                F.col("id").alias("src"), F.col("id").alias("dst"), F.lit(0.0).alias("w")
            )
        )
        dst_batch = batched.select(
            F.col("id").alias("dst"), F.col("batch").alias("dst_batch")
        )
        msgs = (
            msgs.join(dst_batch.hint("shuffle_hash"), "dst")
            .repartition(shuffle_parts, "src")
            .persist()
        )
        msgs.count()

        labels = batched.select("id", "batch", F.col("id").alias("label"))
        labels = labels.transform(local_cut)

        sweeps = 0
        while self.max_sweeps is None or sweeps < self.max_sweeps:
            sweeps += 1
            updated = 0
            for b in range(1, b_count + 1):
                hist = (
                    msgs.where(F.col("dst_batch") == b)
                    .join(
                        labels.select("id", "label").hint("shuffle_hash"),
                        msgs.src == F.col("id"),
                    )
                    .groupBy("dst", "label")
                    .agg(
                        F.sum("w").alias("cnt"),
                        F.max(
                            F.when(F.col("src") == F.col("dst"), 1).otherwise(0)
                        ).alias("own"),
                    )
                )
                cand = (
                    hist.groupBy("dst")
                    .agg(
                        # zero-count groups (self row only / isolated or
                        # all-own-label) can never beat a positive count,
                        # and the deg>0 guard below keeps isolated nodes out
                        F.min(
                            F.when(
                                F.col("cnt") > 0,
                                F.struct(
                                    (-F.col("cnt")).alias("nc"),
                                    F.col("label").alias("lbl"),
                                ),
                            )
                        ).alias("pick"),
                        F.max(F.when(F.col("own") == 1, F.col("label"))).alias(
                            "old_label"
                        ),
                    )
                    .select(
                        F.col("dst").alias("id"),
                        F.coalesce(F.col("pick.lbl"), F.col("old_label")).alias(
                            "label"
                        ),
                        (
                            F.coalesce(F.col("pick.lbl"), F.col("old_label"))
                            != F.col("old_label")
                        ).alias("changed"),
                    )
                )
                cand = cand.transform(local_cut)
                updated += cand.where(F.col("changed")).count()
                # batch-b rows are fully replaced by cand (the self row
                # guarantees every batch member appears); others pass through
                labels = labels.where(F.col("batch") != b).unionByName(
                    cand.select("id", F.lit(b).alias("batch"), "label")
                )
                labels = labels.transform(local_cut)
            if updated <= theta:
                break
        self._sweeps = sweeps
        self._labels = labels.select("id", "label")
        msgs.unpersist()

    def get_partition(self) -> DataFrame:
        self.assure_finished()
        return self._labels

    def number_of_iterations(self) -> int:
        """``LPDegreeOrdered::numberOfIterations`` — sweeps over all batches."""
        self.assure_finished()
        return self._sweeps
