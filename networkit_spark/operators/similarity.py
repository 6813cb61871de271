"""Similarity search over embedding columns — brute-force cosine top-k
and a random-hyperplane LSH-bucketed approximate variant.

Training-data-pipeline operators (no reference counterpart). The dot
products run JVM-side via ``F.zip_with`` + ``F.aggregate`` higher-order
functions — no Python, no UDF — so the kernels stay inside codegen and
scale with partition count.

Scale design:
- **Brute force** is the oracle path: |Q| query vectors broadcast against
  the full corpus (one scan, no shuffle of the big side), per-query top-k
  by window. Right answer, O(|Q|·N) — use for small |Q| or validation.
- **LSH (random hyperplane)** is the scale path: ``planes`` deterministic
  pseudo-random hyperplanes (hash-derived, no RNG state) map each vector
  to a sign-bit bucket; candidates = bucket collisions under any of
  ``tables`` independent banded tables; exact cosine re-rank on the
  (tiny) candidate set. Probe cost O(N·planes) map-side + a bucket join.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two ``array<float|double>`` columns, JVM-side."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def topk_cosine(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``(query_id, neighbor_id, cos)`` — query set is broadcast (small
    side); corpus scanned once; per-query top-k via window ranked on the
    **rounded** cosine with id tie-break, so results are stable across
    summation orders and engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_emb")
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("c_emb")
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.where(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("q_emb"), F.col("c_emb")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rn").alias("rank"))
    )


def _hyperplane(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane: components from
    md5 bytes mapped to [-1, 1]. Pure function of (table, plane, dim)."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"lsh:{table}:{plane}:{d}".encode()).hexdigest()
        v = int(h[:8], 16) / float(1 << 32)  # [0, 1)
        out.append(2.0 * v - 1.0)
    return out


def lsh_bucket_col(vec: Column, table: int, planes: int, dim: int) -> Column:
    """Sign-bit bucket id of ``vec`` under ``planes`` hyperplanes."""
    bucket = F.lit(0)
    for p in range(planes):
        hp = F.array(*[F.lit(x) for x in _hyperplane(table, p, dim)])
        bit = F.when(_dot(vec, hp) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def topk_cosine_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = bucket collisions in any table,
    exact cosine re-rank on candidates only. Recall grows with
    ``tables``; cost per table is a hash-partitioned equi-join on
    ``(table, bucket)`` instead of a cross join."""
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("c_emb")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_emb")
    )
    c_b, q_b = [], []
    for t in range(tables):
        c_b.append(
            c.select(
                "neighbor_id",
                "c_emb",
                F.lit(t).alias("t"),
                lsh_bucket_col(F.col("c_emb"), t, planes, dim).alias("bucket"),
            )
        )
        q_b.append(
            q.select(
                "query_id",
                "q_emb",
                F.lit(t).alias("t"),
                lsh_bucket_col(F.col("q_emb"), t, planes, dim).alias("bucket"),
            )
        )
    cb = c_b[0]
    for x in c_b[1:]:
        cb = cb.unionAll(x)
    qb = q_b[0]
    for x in q_b[1:]:
        qb = qb.unionAll(x)
    cand = (
        cb.join(F.broadcast(qb), ["t", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_emb", "c_emb")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("q_emb"), F.col("c_emb")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rn").alias("rank"))
    )
