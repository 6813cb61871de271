"""Explicit skew handling — hub-key salting utilities.

The north rule calls for explicit skew handling on the link graph's
power-law keys. Three mechanisms cover the engine, in order of
preference:

1. **Partial (map-side) aggregation** — free for algebraic aggs
   (sum/count/min/max): a 10^8-in-degree hub's rows combine inside each
   map partition, so the reducer sees at most one row per partition per
   key. Every iterative gather in this engine (PageRank/CC/PLP/k-core)
   is shaped this way on purpose; no salt needed.
2. **AQE skew-join splitting** — on by default for the sort-merge joins
   Catalyst picks at scale.
3. **Explicit salting** (this module) — for the cases neither covers:
   non-algebraic aggregations (exact distinct counts over a hub key)
   and shuffle joins with a hot build key where AQE is unavailable
   (e.g. inside ``foreachBatch`` micro-batches, or when a deterministic
   plan is required round-over-round).

Each helper is semantics-preserving: results equal the unsalted plan
(tested in ``tests/test_round2_ops.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    n_salts: int = 32,
) -> DataFrame:
    """Exact ``count(DISTINCT value)`` per key, hub-safe.

    Plain ``countDistinct`` shuffles every (key, value) pair of a hub
    key to ONE reducer. Salting by ``hash(value) % n_salts`` partitions
    the *value space*: per-(key, salt) distinct counts are disjoint, so
    their sum is the exact global distinct count — two shuffles, both
    with per-key fan-out ``n_salts``.

    Returns ``keys + [distinct_count]``.
    """
    salt = (F.xxhash64(F.col(value)) % n_salts).alias("_salt")
    per_salt = (
        df.select(*keys, F.col(value), salt)
        .groupBy(*keys, "_salt")
        .agg(F.countDistinct(value).alias("_dc"))
    )
    return per_salt.groupBy(*keys).agg(F.sum("_dc").alias("distinct_count"))


def salted_gather_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join ``big ⋈ small`` on a hot key.

    The small side is replicated ``n_salts``× (one copy per salt); the
    big side gets a per-row salt from a cheap deterministic hash of its
    partition-local position, so a hot key's rows spread over
    ``n_salts`` reducers instead of one. Output columns = both inputs'
    columns (join keys merged), exactly as the unsalted join.

    Use when AQE skew splitting is unavailable (streaming micro-batches,
    deterministic iterative plans); cost = ``n_salts``× duplication of
    the small side's shuffle.
    """
    exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    salted_big = big.withColumn(
        "_salt",
        (
            F.abs(F.xxhash64(F.monotonically_increasing_id())) % n_salts
        ).cast("int"),
    )
    joined = salted_big.join(
        exploded,
        (salted_big[big_key] == exploded[small_key])
        & (salted_big["_salt"] == exploded["_salt"]),
    )
    return joined.drop("_salt")


#: Engage the salted layout when ONE key's row share exceeds this many
#: average partitions' worth of data (share > HUB_PARTITION_SHARE / P).
#: Below it, the straggler task costs less than the salting shuffle
#: overhead (state replication + wider key). Set from the round-5
#: microbench (`scripts/skew_microbench.py`, BENCH/skew_microbench.md):
#: at 76M edges / 32 partitions, a 10%-share hub src (= 3.2 average
#: partitions) costs ~3.6x per round unsalted (median 8.98s vs 2.48s)
#: and is fully recovered by n_salts=32 salting, while AQE cannot help — the
#: skew is baked into the persisted iterate layout, and there is no
#: exchange left for OptimizeSkewedJoin to split. A key at ~2 average
#: partitions is round-time-neutral. Policy: engage between 2 and 3
#: average partitions of share — 2.0 is the conservative default.
HUB_PARTITION_SHARE = 2.0


def hub_keys(
    df: DataFrame,
    key: str,
    num_partitions: int,
    share: float = HUB_PARTITION_SHARE,
) -> DataFrame:
    """Keys whose row count exceeds ``share`` average partitions of
    ``df`` — the candidates for :func:`salted_iterate_layout`. One
    aggregation over the frame (map-side combined), run ONCE at ingest
    time, not per round. Returns ``(key)``."""
    total = df.count()
    cap = share * total / num_partitions
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") > cap)
        .select(key)
    )


def salted_iterate_layout(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    hubs: DataFrame,
    salt_from: str,
    n_salts: int = 32,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame, list]:
    """Skew-proof layout for the iterative gather join
    ``big ⋈ small ON big_key = small_key`` when a hub value of
    ``big_key`` (e.g. a 10^7-out-degree vertex) is baked into the
    persisted big-side partitioning.

    Why AQE cannot do this: iterative kernels persist the big side
    pre-partitioned and reuse it every round, so the round join has NO
    exchange on the big side for ``OptimizeSkewedJoin`` to split — the
    hub's rows sit in one cached partition and its task straggles every
    round. Salting must therefore happen ONCE, in the layout itself:

    - big rows of hub keys get ``_salt = xxhash64(salt_from) % n_salts``
      (``salt_from`` = any per-row-varying column, e.g. the edge's other
      endpoint), non-hub rows ``_salt = 0``;
    - small rows of hub keys are replicated ``n_salts``× (one per
      salt), non-hub rows carry ``_salt = 0`` only;
    - both sides partition on ``(key, _salt)`` and the round join uses
      ``[big_key = small_key, _salt = _salt]``.

    Results are row-identical to the unsalted join; extra cost is
    ``(n_salts - 1) x |hubs|`` small-side rows per round. Returns
    ``(big_salted, small_salted, join_condition_keys)`` where the big
    side is already repartitioned (persist it, as you would the
    unsalted layout) and the caller must apply the same
    ``_salt``-attach + replicate transform to each round's fresh state
    (:func:`salted_state` does it)."""
    hub_flag = hubs.select(F.col(big_key).alias("_hub_key")).withColumn(
        "_is_hub", F.lit(True)
    )
    big_s = (
        big.join(
            F.broadcast(hub_flag),
            big[big_key] == hub_flag["_hub_key"],
            "left",
        )
        .withColumn(
            "_salt",
            F.when(
                F.col("_is_hub"),
                (F.abs(F.xxhash64(F.col(salt_from))) % n_salts).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hub_key", "_is_hub")
    )
    parts = num_partitions or big.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    big_s = big_s.repartition(int(parts), big_key, "_salt")
    small_s = salted_state(small, small_key, hubs, big_key, n_salts)
    return big_s, small_s, [big_key, small_key, "_salt"]


def salted_state(
    state: DataFrame,
    state_key: str,
    hubs: DataFrame,
    hub_key: str,
    n_salts: int,
) -> DataFrame:
    """Replicate hub-key state rows across all salts (non-hub rows get
    salt 0) — apply to EVERY round's fresh state before the salted
    gather join."""
    hub_flag = hubs.select(F.col(hub_key).alias("_hub_key")).withColumn(
        "_is_hub", F.lit(True)
    )
    return (
        state.join(
            F.broadcast(hub_flag),
            state[state_key] == hub_flag["_hub_key"],
            "left",
        )
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_is_hub"),
                    F.sequence(F.lit(0), F.lit(n_salts - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("_hub_key", "_is_hub")
    )


def salt_column(key: Column, n_salts: int) -> Column:
    """Deterministic salt 0..n_salts-1 for composing salted groupBys:
    ``df.groupBy(key, salt_column(other_col, 32))`` — the two-level
    aggregation pattern for non-algebraic aggs."""
    return (F.abs(F.xxhash64(key)) % n_salts).cast("int")
