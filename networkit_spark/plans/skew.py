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


def salt_column(key: Column, n_salts: int) -> Column:
    """Deterministic salt 0..n_salts-1 for composing salted groupBys:
    ``df.groupBy(key, salt_column(other_col, 32))`` — the two-level
    aggregation pattern for non-algebraic aggs."""
    return (F.abs(F.xxhash64(key)) % n_salts).cast("int")
