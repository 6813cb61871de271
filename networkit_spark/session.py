"""SparkSession factory with scale-aware defaults.

The reference is a single shared-memory process (OpenMP); all distribution
policy here is new engineering. Defaults chosen for iterative graph
message-passing at cluster scale:

- AQE on (runtime coalesce + skew-join splitting — the analog of the
  reference's ``schedule(guided)`` balanced loops,
  ``include/networkit/graph/Graph.hpp:1754-1763``),
- Arrow enabled for the vectorized extraction UDFs (the only Python UDFs
  in the engine; algorithm inner loops are pure DataFrame ops),
- session timezone pinned to UTC so timestamps compare exactly against
  DuckDB oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "networkit_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default policy.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster callers pass no master and let spark-submit decide.
    ``shuffle_partitions`` defaults to the parallelism level — for local
    runs that is the core count; on a 1000-executor cluster this must be
    set to ~2-3× total cores by the submitter.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; local[*] → cpu count; otherwise leave a sane default.
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = cpus if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # Coalescing is OFF by default: iterative kernels run the same
        # shuffle shape hundreds of times, and letting AQE shrink those
        # shuffles to a handful of post-coalesce partitions serializes
        # the per-round join-agg (measured 3.1x slower per round on a
        # 38M-edge PageRank at local[32]). Skew-join splitting stays on.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Iterative algorithms re-plan per round; keep driver plans cheap.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_all() -> None:
    """Stop the active session (used by the bench harness to switch masters)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
