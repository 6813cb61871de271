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
    # norms precomputed per vector at the scan (same expression tree as
    # cosine_col, so values are identical) — the pair loop then does one
    # array fold instead of three
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_emb"),
    ).withColumn("q_nrm", _norm(F.col("q_emb")))
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_emb"),
    ).withColumn("c_nrm", _norm(F.col("c_emb")))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.where(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q_emb"), F.col("c_emb"))
            / (F.col("q_nrm") * F.col("c_nrm")),
            6,
        ).alias("cos"),
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


def _bucketed(
    df: DataFrame, out_id: str, tables: int, planes: int, dim: int
) -> DataFrame:
    """``(out_id, t, bucket)`` for every (row, table) pair — ONE scan of
    ``df`` producing all tables via an inline array-explode, instead of a
    union of per-table re-scans (at corpus scale a T-way union re-reads
    the source T times).

    The T×P×dim sign-bit computation is ONE vectorized Arrow UDF
    (``mapInPandas``): per record batch a numpy accumulation
    ``acc += E[:, d] ⊗ W[:, d]`` over ascending ``d`` — the exact
    left-to-right term order of the ``zip_with``+``aggregate`` fold it
    replaces, so bucket values are BIT-IDENTICAL (same IEEE products,
    same ``0.0`` init, same ``>= 0`` sign rule, same ``1 << p`` bit
    weights; the emb_ann_lsh/emb_near_dup DuckDB oracles stay
    hash-exact). History of this hot path: T×P unrolled literal dot
    products cost ~4s of driver-side Catalyst analysis (4096 literal
    nodes); the nested higher-order-function rewrite fixed analysis time
    but evaluated interpreted per row (~1.8 ms/row = 3.5 s for the sf0.1
    corpus, dwarfing the scan); the Arrow kernel does the same
    arithmetic batch-at-a-time and emits the exploded ``(id, t,
    bucket)`` rows directly."""
    import numpy as np
    import pandas as pd

    W = np.array(
        [
            _hyperplane(t, p, dim)
            for t in range(tables)
            for p in range(planes)
        ],
        dtype=np.float64,
    )  # (T*P, dim)
    bitw = np.array([1 << p for p in range(planes)], dtype=np.int64)
    T, P = tables, planes

    def compute(batches):
        for b in batches:
            if len(b) == 0:
                continue
            E = np.asarray(b["emb"].tolist(), dtype=np.float64)
            acc = np.zeros((len(b), T * P))
            for d in range(dim):  # ascending d = the HOF fold order
                acc += E[:, d, None] * W[None, :, d]
            bits = acc >= 0.0
            buckets = (bits.reshape(len(b), T, P) * bitw).sum(axis=2)
            yield pd.DataFrame(
                {
                    out_id: np.repeat(b[out_id].to_numpy(), T),
                    "t": np.tile(np.arange(T), len(b)),
                    "bucket": buckets.ravel(),
                }
            )

    return df.select(out_id, "emb").mapInPandas(
        compute, schema=f"{out_id} long, t int, bucket int"
    )


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
    ``(table, bucket)`` instead of a cross join.

    Plan shape: one corpus scan emits all T buckets (inline explode);
    candidate pairs deduplicate as bare ``(query_id, neighbor_id)``
    longs (hash aggregate — no array column rides through the shuffle),
    then embeddings re-attach via equi-joins for the exact re-rank."""
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("c_emb")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_emb")
    )
    cb = _bucketed(c.withColumnRenamed("c_emb", "emb"), "neighbor_id", tables, planes, dim)
    qb = _bucketed(q.withColumnRenamed("q_emb", "emb"), "query_id", tables, planes, dim)
    cand = (
        cb.join(F.broadcast(qb), ["t", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(q.withColumn("q_nrm", _norm(F.col("q_emb")))), "query_id")
        .join(c.withColumn("c_nrm", _norm(F.col("c_emb"))), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rn").alias("rank"))
    )


def cosine_near_dup(
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: ``(id_a, id_b, cos)``
    for every unordered pair with ``cos >= threshold`` (``id_a < id_b``).

    This is the VERIFICATION path — an O(N²) upper-triangle comparison
    (nested-loop join under the ``<`` condition) that is the DuckDB
    oracle's twin. At corpus scale use :func:`cosine_near_dup_lsh`,
    which generates candidates through a bucketed equi-join and calls
    the same exact cosine only on collisions.

    The threshold is applied to the ROUNDED (6 dp) cosine in both this
    engine and the SQL oracle so float summation-order noise cannot
    flip membership at the boundary.
    """
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("a_emb")
    ).withColumn("a_nrm", _norm(F.col("a_emb")))
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("b_emb")
    ).withColumn("b_nrm", _norm(F.col("b_emb")))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("a_emb"), F.col("b_emb"))
                / (F.col("a_nrm") * F.col("b_nrm")),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def cosine_near_dup_lsh(
    vectors: DataFrame,
    threshold: float = 0.4,
    planes: int = 4,
    tables: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Corpus×corpus near-duplicate pairs at scale: LSH-bucketed
    candidate generation + exact cosine verification.

    Unlike :func:`topk_cosine_lsh` (broadcast query set), BOTH sides
    here are the full corpus, so candidates come from a self equi-join
    on ``(table, bucket)`` — each bucket's pairs are generated inside
    one hash partition, never a cross join across buckets. Collisions
    across the ``tables`` independent tables are deduplicated before the
    exact verify, and every surviving pair is exact-cosine checked, so
    precision is 1.0; recall grows with ``tables`` (pytest measures it
    against :func:`cosine_near_dup`).

    Scale guard: a degenerate bucket (all-near-identical embeddings,
    e.g. zero-vector padding) would quadratic-blow one reducer, so
    buckets are sized FIRST with a map-side-combined ``COUNT`` and any
    bucket over ``max_bucket`` members is dropped from pairing — the
    same count-before-pair cap as MinHash LSH
    (:func:`networkit_spark.operators.dedup.minhash_candidates`). At
    web scale such buckets are boilerplate/padding clusters handled as
    groups, not pairs; a dropped bucket in one table does not drop the
    pair globally (it can still surface via the other ``tables-1``
    independent tables).
    """
    v = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("emb")
    )
    vb = _bucketed(v, "vid", tables, planes, dim)
    # size first with a COUNT (safe for any bucket size), never
    # collect_list: a degenerate bucket would otherwise materialize its
    # whole member array in one reducer before the guard could drop it.
    # The count is a window over (t, bucket) fused into the SAME
    # exchange the pair self-join needs — one shuffle sizes the buckets,
    # applies the cap, and leaves rows hash-partitioned on the join key
    # (vs. the previous separate groupBy-count + join-back, which paid
    # an extra aggregation exchange over the full bucket frame).
    kept = (
        vb.withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("t", "bucket"))
        )
        .where((F.col("sz") > 1) & (F.col("sz") <= max_bucket))
        .select("t", "bucket", "vid")
        .persist()
    )
    left = kept.select("t", "bucket", F.col("vid").alias("id_a"))
    right = kept.select("t", "bucket", F.col("vid").alias("id_b"))
    # dedupe bare id pairs (hash aggregate on two longs), THEN re-attach
    # embeddings — arrays never ride through the dedup shuffle
    cand = (
        left.join(right, ["t", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vn = v.withColumn("nrm", _norm(F.col("emb")))
    scored = (
        cand.join(
            vn.select(
                F.col("vid").alias("id_a"),
                F.col("emb").alias("a_emb"),
                F.col("nrm").alias("a_nrm"),
            ),
            "id_a",
        )
        .join(
            vn.select(
                F.col("vid").alias("id_b"),
                F.col("emb").alias("b_emb"),
                F.col("nrm").alias("b_nrm"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("a_emb"), F.col("b_emb"))
                / (F.col("a_nrm") * F.col("b_nrm")),
                6,
            ).alias("cos"),
        )
    )
    return scored.where(F.col("cos") >= threshold)


def topk_cosine_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    lloyd_rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: float | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine — the
    partition-then-probe scale path.

    Index build:
      1. ``nlist`` deterministic seed centroids — the corpus rows with
         the smallest ``portable_hash32(id)`` (a seeded uniform sample
         with no RNG state, reproducible across runs/partitionings AND
         bit-identical in ANSI SQL: md5-prefix, not a JVM-only hash).
      2. ``lloyd_rounds`` of Lloyd refinement: assign every vector to
         its nearest centroid by cosine — one vectorized Arrow kernel
         per round (``E @ Cᵀ`` against the driver-collected nlist×dim
         centroid matrix; no shuffle, no per-row Python) — then
         recompute each centroid as the element-wise mean via
         ``posexplode`` + ``groupBy(cid, pos)``, one narrow shuffle per
         round keyed on (centroid, dimension).
      3. Final assignment = the inverted lists, hash-partitioned by
         centroid id.

    Probe: each query scores the centroids (broadcast), keeps its
    ``nprobe`` nearest lists, joins candidates on ``cid`` (equi-join,
    never a cross join against the corpus), exact cosine re-rank, top-k
    per query. Recall grows with ``nprobe``/``nlist`` ratio; pytest
    measures it against :func:`topk_cosine`.

    ``quantize`` (e.g. ``1e6``): fixed-point mode — every embedding
    component is snapped to the integer lattice ``floor(x·q + 0.5)``
    (held as integer-valued doubles) and Lloyd means are
    ``floor(Σ/n + 0.5)``. Every sum the index then computes is a sum
    of integers below 2^53, which IEEE doubles accumulate EXACTLY in
    any order — so the whole index (assignments, centroids, inverted
    lists, probe ranking) is bit-reproducible across partitionings,
    engines, and summation orders, and a DuckDB oracle can rebuild it
    value-for-value. Cosine is scale-invariant, so ranking quality is
    unchanged up to the 1/q quantization noise (far below embedding
    noise at q = 1e6).
    """
    from networkit_spark.operators.dedup import portable_hash32

    raw = vectors.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("emb")
    )
    if quantize is not None:
        c = raw.select(
            "nid",
            F.transform(
                "emb", lambda x: F.floor(x * F.lit(quantize) + F.lit(0.5)).cast("double")
            ).alias("emb"),
        )
    else:
        c = raw
    seed_key = portable_hash32(F.col("nid").cast("string"), "ivf")
    centroids = (
        c.orderBy(seed_key, F.col("nid"))
        .limit(nlist)
        .select(
            F.row_number()
            .over(Window.orderBy(seed_key, F.col("nid")))
            .alias("cid"),
            F.col("emb").alias("c_emb"),
        )
    )

    def _assign(cent: DataFrame) -> DataFrame:
        # nearest centroid (max sim, ties → smallest cid) as ONE
        # vectorized Arrow kernel: the nlist×dim centroid matrix is
        # driver-collected (nlist is small by construction) and each
        # record batch scores E @ Cᵀ in numpy — the corpus never
        # shuffles for assignment at all. The previous form (crossJoin
        # on broadcast centroids + interpreted HOF cosine + min-struct
        # agg) evaluated ~nlist interpreted 64-dim folds per row and
        # was the hot path of the index build.
        import numpy as np
        import pandas as pd

        rows = cent.orderBy("cid").collect()
        cids = np.array([int(r["cid"]) for r in rows], dtype=np.int64)
        C = np.array([list(r["c_emb"]) for r in rows], dtype=np.float64)
        Cn = np.sqrt((C * C).sum(axis=1))

        def pick(batches):
            for b in batches:
                if len(b) == 0:
                    continue
                E = np.asarray(b["emb"].tolist(), dtype=np.float64)
                En = np.sqrt((E * E).sum(axis=1))
                sims = (E @ C.T) / (En[:, None] * Cn[None, :])
                # argmax keeps the FIRST max — cids ascend, so ties
                # resolve to the smallest cid like the (-sim, cid)
                # lexicographic min it replaces
                best = cids[np.argmax(sims, axis=1)]
                yield pd.DataFrame(
                    {"nid": b["nid"], "emb": b["emb"], "cid": best}
                )

        return c.mapInPandas(
            pick, schema="nid long, emb array<double>, cid int"
        )

    # fixed-point mode keeps centroids on the same integer lattice:
    # floor(Σ/n + 0.5) of exact integer sums is deterministic in any
    # engine; float mode keeps the plain (order-sensitive) mean
    if quantize is not None:
        mean_expr = F.floor(
            F.sum("val") / F.count(F.lit(1)) + F.lit(0.5)
        ).cast("double")
    else:
        mean_expr = F.avg("val")
    cent = centroids
    for _ in range(lloyd_rounds):
        assigned = _assign(cent)
        cent = (
            assigned.select("cid", F.posexplode("emb").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(mean_expr.alias("mean"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("mean")))
                ).alias("pm")
            )
            .select("cid", F.transform(F.col("pm"), lambda s: s["mean"]).alias("c_emb"))
        )
    lists = _assign(cent)

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_emb")
    )
    if quantize is not None:
        q = q.select(
            "query_id",
            F.transform(
                "q_emb",
                lambda x: F.floor(x * F.lit(quantize) + F.lit(0.5)).cast("double"),
            ).alias("q_emb"),
        )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cid"))
    probed = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "q_emb",
            "cid",
            cosine_col(F.col("q_emb"), F.col("c_emb")).alias("qsim"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", "cid")
    )
    cand = (
        lists.join(F.broadcast(probed), "cid")
        .where(F.col("nid") != F.col("query_id"))
        .select("query_id", "q_emb", F.col("nid").alias("neighbor_id"), "emb")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("q_emb"), F.col("emb")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rn").alias("rank"))
    )
