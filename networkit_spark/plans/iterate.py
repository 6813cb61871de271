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

**SINGLE-REFERENCE RULE (measured, load-bearing):** the plan that a
round materializes must reference the previous round's checkpointed
frame **exactly once**. Referencing it twice (e.g. joining the old state
back in for a fused convergence delta, or a pointer-doubling self-join)
silently defeats checkpoint-block reuse — each round's job then
recomputes the full history and per-round wall time doubles (~×2.3/round
from ~round 15, measured on Spark 4.1 with and without AQE, with eager
and lazy localCheckpoint). Patterns that satisfy the rule:

- extra lookups of the old state run as SEPARATE queries on the already-
  materialized frames (PageRank's delta join, CC's changed count);
- "self + neighbors" aggregations add explicit self-loop rows to the
  static edge side instead of re-joining the state (CC hash-min, ANF);
- multi-stage rounds materialize each stage before the next references
  it (PLP's histogram winner);
- a FRESH frame derived this round and then cut/materialized may be
  referenced any number of times afterwards (measured flat over 30
  rounds — k-core's peel set); the hazard is specific to the
  round-over-round chained state frame.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
        # derived plan that runs first re-plans the full parent lineage —
        # measured to go exponential past ~15 rounds. Do not "optimize"
        # this to lazy.) Blocks are MEMORY_AND_DISK: accumulated rounds
        # spill rather than evict.
        return df.localCheckpoint(eager=True)
