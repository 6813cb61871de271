"""Iterative-execution machinery: lineage truncation, checkpoint/resume.

The reference's algorithms are single-shot in-memory loops
(``Algorithm::run``, ``include/networkit/base/Algorithm.hpp:31``) with no
persistence. At cluster scale, iterative DataFrame programs need two
things the reference never did:

1. **Lineage truncation** — each round's plan references the previous
   round's; after k rounds the logical plan is O(k) deep and Catalyst
   analysis time blows up. Every round must be materialized and its
   lineage cut (``localCheckpoint`` in-memory, or a parquet/Iceberg
   round-trip).
2. **Resumability** (north_rule) — per-iteration durable checkpoints with
   per-partition lineage rows + metrics, so a killed run resumes from the
   latest complete iteration.

``CheckpointStore`` implements (2) on Parquet + JSONL; on a production
cluster the same layout maps 1:1 onto an Iceberg table partitioned by
``(run_id, iter)`` with the metrics JSONL as a metrics table — the store
isolates that choice behind ``save``/``latest``.

**History — the "single-reference rule" and its real root cause.**
Round 1 measured per-round wall time doubling (~×2.3/round from ~round
15) whenever a round's materialized plan referenced the previous round's
checkpointed frame more than once, and attributed it to checkpoint-block
reuse failure; every kernel was therefore restructured so each round
references the chained state frame exactly once. Round 2 found the true
mechanism: ``Dataset.localCheckpoint`` copies the origin plan's
*estimated statistics* onto the new ``LogicalRDD``, and size-only
estimation multiplies child ``sizeInBytes`` (exact ``BigInteger``s)
across every join — k references to a frame whose stat already has B
bits yields ≥ kB bits, so bit-length grows geometrically per round and
the driver ends up in million-digit Toom-Cook multiplication inside the
next checkpoint (see :func:`local_cut`). With ``local_cut`` stripping
inherited stats at every cut, multi-reference round plans are flat
(measured: 25 rounds of a 4-reference plan, ~0.5 s/round, vs >200 s
climbing with plain ``localCheckpoint``). The single-reference shapes
below are KEPT — they are good plans (fewer joins, map-side aggs) — but
the rule is no longer a correctness/viability constraint on new
operators:

- extra lookups of the old state run as SEPARATE queries on the already-
  materialized frames (PageRank's delta join, CC's changed count);
- "self + neighbors" aggregations add explicit self-loop rows to the
  static edge side instead of re-joining the state (CC hash-min, ANF);
- multi-stage rounds materialize each stage before the next references
  it (PLP's histogram winner).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def local_cut(df: DataFrame) -> DataFrame:
    """Eager in-memory lineage cut with BOUNDED plan statistics.

    ``Dataset.localCheckpoint`` truncates lineage but copies the origin
    plan's estimated ``Statistics`` onto the new ``LogicalRDD`` leaf
    (``sql/core/.../ExistingRDD.scala`` ``rewriteStatsAndConstraints``).
    Size-only estimation MULTIPLIES child ``sizeInBytes`` across every
    join (``SizeInBytesOnlyStatsPlanVisitor.visitJoin``), so an iterative
    kernel whose round plan contains j joins over checkpointed frames
    makes the stat's BIT-LENGTH grow ~j× per round. The numbers are exact
    ``BigInteger``s: after ~20 rounds of a multi-join round plan the
    driver spends minutes per checkpoint inside Toom-Cook multiplication
    on million-digit integers (observed stack:
    ``BigInteger.multiplyToomCook3`` under ``Dataset.checkpoint``) — the
    wall-time-per-round "exponential blow-up" previously mis-attributed
    to checkpoint-block reuse (see PLANS.md round-2 findings; measured:
    25 multi-join rounds flat at ~0.5 s with this cut vs >200 s and
    climbing with plain ``localCheckpoint``).

    Fix: checkpoint eagerly (materializes copied ``InternalRow``s), then
    re-wrap the checkpointed RDD as a FRESH ``LogicalRDD`` carrying no
    inherited stats (planner falls back to ``defaultSizeInBytes``). Our
    iterative kernels always broadcast / ``SHUFFLE_HASH``-hint the state
    side explicitly, and AQE re-plans from true runtime shuffle sizes, so
    losing the (absurdly inflated) estimate costs nothing.
    ``internalCreateDataFrame`` is ``private[sql]`` but stable across
    Spark 3.x/4.x and callable through py4j (Scala access modifiers are
    not enforced in bytecode).
    """
    ck = df.localCheckpoint(eager=True)
    try:
        jdf = ck._jdf
        jspark = df.sparkSession._jsparkSession
        new_jdf = jspark.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, df.sparkSession)
    except Exception:  # pragma: no cover — private-API drift fallback
        return ck


class CheckpointStore:
    """Durable per-iteration state for a single algorithm run.

    Layout::

        {base_dir}/{run_id}/iter={k}/           parquet snapshot of state
        {base_dir}/{run_id}/metrics.jsonl       one JSON line per iteration
        {base_dir}/{run_id}/lineage.jsonl       per-partition rows per iter

    Metrics lines carry ``run_id, iter, wall_s, rows`` plus
    algorithm-specific fields (delta norm, changed count, ...).
    """

    def __init__(self, base_dir: str, run_id: str | None = None) -> None:
        self.base_dir = base_dir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.run_dir = os.path.join(base_dir, self.run_id)
        os.makedirs(self.run_dir, exist_ok=True)

    def _iter_path(self, it: int) -> str:
        return os.path.join(self.run_dir, f"iter={it}")

    def save(
        self,
        it: int,
        state: DataFrame,
        metrics: dict | None = None,
        lineage: bool = True,
    ) -> DataFrame:
        """Write iteration state, append metrics + per-partition lineage,
        and return the re-read (lineage-free) DataFrame."""
        t0 = time.time()
        path = self._iter_path(it)
        state.write.mode("overwrite").parquet(path)
        spark = state.sparkSession
        fresh = spark.read.parquet(path)
        if lineage:
            parts = (
                fresh.groupBy(F.spark_partition_id().alias("partition_id"))
                .count()
                .collect()
            )
            with open(os.path.join(self.run_dir, "lineage.jsonl"), "a") as f:
                for row in parts:
                    f.write(
                        json.dumps(
                            {
                                "run_id": self.run_id,
                                "iter": it,
                                "partition_id": row["partition_id"],
                                "rows": row["count"],
                            }
                        )
                        + "\n"
                    )
        rec = {
            "run_id": self.run_id,
            "iter": it,
            "checkpoint_wall_s": round(time.time() - t0, 4),
        }
        rec.update(metrics or {})
        with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        # mark completeness only after metrics are durable
        with open(os.path.join(path, "_COMMITTED"), "w") as f:
            f.write("1")
        return fresh

    def append_metrics(self, it: int, metrics: dict) -> None:
        """Append a metrics record for an already-saved iteration (used
        when a metric — e.g. the convergence delta — is computed from the
        materialized snapshot after the save)."""
        rec = {"run_id": self.run_id, "iter": it}
        rec.update(metrics)
        with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def completed_iters(self) -> list[int]:
        if not os.path.isdir(self.run_dir):
            return []
        out = []
        for name in os.listdir(self.run_dir):
            if name.startswith("iter="):
                it = int(name.split("=", 1)[1])
                if os.path.exists(os.path.join(self.run_dir, name, "_COMMITTED")):
                    out.append(it)
        return sorted(out)

    def latest(self, spark: SparkSession) -> tuple[int, DataFrame] | None:
        """Latest committed iteration (the resume point), or None."""
        iters = self.completed_iters()
        if not iters:
            return None
        it = iters[-1]
        return it, spark.read.parquet(self._iter_path(it))

    def metrics(self) -> list[dict]:
        path = os.path.join(self.run_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]


class Materializer:
    """Per-round lineage cut: fast in-memory path or durable store path.

    ``localCheckpoint(eager=True)`` truncates lineage without disk I/O —
    right for converged inner loops on a healthy cluster. Passing a
    ``CheckpointStore`` upgrades every round to a durable, resumable
    snapshot (slower; parquet round-trip) — right for long multi-hour runs
    at the 10^12-document scale where preemption is routine.
    """

    def __init__(self, store: CheckpointStore | None = None) -> None:
        self.store = store

    def cut(self, it: int, df: DataFrame, metrics: dict | None = None) -> DataFrame:
        if self.store is not None:
            return self.store.save(it, df, metrics)
        # Eager checkpoint: materializes now and truncates lineage NOW.
        # (eager=False defers truncation until some later action, and a
        # derived plan that runs first re-plans the full parent lineage.
        # Do not "optimize" this to lazy.) Blocks are MEMORY_AND_DISK:
        # accumulated rounds spill rather than evict. local_cut also
        # strips inherited plan statistics — see its docstring.
        return local_cut(df)
