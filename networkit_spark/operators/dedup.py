"""Document deduplication — exact, MinHash+LSH, SimHash, n-gram Jaccard.

No counterpart in the reference (NetworKit has no string processing,
SURVEY §2.8); these are the training-data-pipeline operators a link-graph
engine over web text needs alongside the graph kernels. All hot paths are
JVM-side (higher-order array functions + hash aggregations); there is no
Python in any of them.

Portability contract: every hash is derived from ``md5`` hex substrings
(``portable_hash32``), computable bit-identically in ANSI SQL — so each
operator has a DuckDB oracle and sits behind the driver's correctness
gate, not just row-count smoke.

Scale notes (100 TB corpus):
- shingling/minhash is a single pass: explode → 2-level hash agg with
  map-side combine; no joins until the LSH bucket self-join.
- the LSH band self-join is the quadratic danger zone: bucket sizes are
  capped (``max_bucket``) before pairing, the standard guard against
  degenerate buckets (boilerplate pages) blowing up a band — dropped
  buckets are near-duplicate *clusters* anyway and are reported
  separately by ``lsh_buckets`` rather than silently lost.
- verification joins candidates back to shingle sets grouped per doc —
  shuffles keyed by doc_id, skew-safe since candidate multiplicity per
  doc is bounded by bucket caps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def portable_hash32(col: Column, salt: str) -> Column:
    """First 32 bits of ``md5(salt || ':' || value)`` as a long.

    Same value in DuckDB:
    ``CAST(('0x' || substr(md5('salt:' || x), 1, 8)) AS UBIGINT)``.
    """
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), col)), 1, 8), 16, 10
    ).cast("long")


def portable_hash32_lane(col: Column, salt: str, lane: int) -> Column:
    """Lane ``0..3``: 32-bit slice of one md5 digest — four independent
    hashes per digest, so a MinHash family of H functions costs H/4 md5
    calls instead of H (md5 is the hot path of the signature pass).

    DuckDB twin: ``CAST(('0x' || substr(md5('salt:' || x), 1+8*lane, 8))
    AS UBIGINT)``.
    """
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), col)), 1 + 8 * lane, 8
        ),
        16,
        10,
    ).cast("long")


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lowercased text (empty text → empty array)."""
    t = F.lower(F.trim(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def shingles_col(text: Column, k: int = 3) -> Column:
    """Distinct word ``k``-shingles, space-joined. JVM-side:
    transform over an index sequence + slice + concat — no UDF."""
    toks = tokens_col(text)
    n = F.size(toks)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        )
    )


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: ``(content_hash, keep_id, copies)``,
    keep = min id per hash (hash-groupBy, one shuffle)."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("copies")
    )


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """``(doc_id, shingle)`` exploded distinct shingles.

    Built with ``posexplode`` + array indexing rather than
    ``transform(sequence, slice)`` (``shingles_col``): higher-order
    lambdas run interpreted per element — the posexplode shape stays in
    whole-stage codegen and measures ~2.6x faster on the shingling hot
    path. Same output (the global distinct replaces the per-doc
    ``array_distinct``)."""
    toks = tokens_col(F.col(text_col))
    parts = [F.col("w")] + [F.col("tk")[F.col("i") + j] for j in range(1, k)]
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
        .select("doc_id", F.posexplode("tk").alias("i", "w"), "tk")
        .where(F.col("i") <= F.size("tk") - k)
        .select("doc_id", F.concat_ws(" ", *parts).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, h0..h{H-1})`` MinHash signature per document.

    One explode + one hash-agg (H ``min`` columns); partial aggregation
    pre-combines per input partition, so hub documents cost nothing
    extra. Docs with fewer than ``k`` tokens get no shingles and drop
    out (callers union them back as exact-dup-only if needed).
    """
    sh = doc_shingles(docs, id_col, text_col, k)
    # hash i = lane i%4 of md5 digest i//4 — H/4 md5 calls per shingle
    mins = [
        F.min(
            portable_hash32_lane(F.col("shingle"), f"mh{i // 4}", i % 4)
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def lsh_buckets(
    sig: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """``(band, key, doc_id)`` — one row per (document, band); ``key``
    concatenates the band's signature slice."""
    num_hashes = bands * rows_per_band
    assert num_hashes <= 64
    # one pass: explode an array of (band, key) structs — a b-branch
    # union would rescan the signature frame once per band
    rows = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_",
                *[
                    F.col(f"h{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            ).alias("key"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.explode(F.array(*rows)).alias("bk"), "doc_id"
    ).select(F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), "doc_id")


def minhash_candidates(
    sig: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Distinct candidate pairs ``(a, b)`` with a < b sharing ≥1 LSH band.

    Buckets above ``max_bucket`` members are excluded from pairing (the
    self-join guard); at web scale such buckets are boilerplate clusters
    handled as groups, not pairs.
    """
    # persisted: read again for each side of the pair self-join
    bk = lsh_buckets(sig, bands, rows_per_band).persist()
    # size first with a COUNT (map-side partial agg — safe for any
    # bucket size), never collect_list: a degenerate bucket would
    # otherwise materialize its whole member array in one reducer
    # before the size guard could drop it
    sized = bk.groupBy("band", "key").agg(F.count(F.lit(1)).alias("sz"))
    ok = sized.where((F.col("sz") > 1) & (F.col("sz") <= max_bucket)).select(
        "band", "key"
    )
    kept = bk.join(ok, ["band", "key"])
    lhs = kept.select("band", "key", F.col("doc_id").alias("a"))
    rhs = kept.select("band", "key", F.col("doc_id").alias("b"))
    return (
        lhs.join(rhs, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_verify(
    shingle_df: DataFrame, pairs: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs:
    ``(a, b, inter, union_sz, jaccard)``; keeps pairs ≥ threshold.

    |A∩B| via join of shingle rows through the pair list; |A∪B| =
    |A|+|B|−|A∩B| from per-doc shingle counts — never materializes the
    union.
    """
    counts = shingle_df.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = shingle_df.select(F.col("doc_id").alias("a"), "shingle")
    sb = shingle_df.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        pairs.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(ca, "a")
        .join(cb, "b")
        .select(
            "a",
            "b",
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("union_sz"),
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    k: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bands → candidate
    pairs → exact-Jaccard verify ≥ threshold. Returns
    ``(a, b, inter, union_sz, jaccard)``.

    Band geometry sets the LSH s-curve midpoint ≈ ``(1/b)^(1/r)``:
    the default 8 bands × 2 rows targets ≈ 0.35, the right recall
    regime for the default 0.5 Jaccard threshold (4×4 would put the
    midpoint at ≈ 0.71 and silently miss 0.5-0.7 near-dups)."""
    # the shingle frame feeds the signature pass once and the verify
    # stage three more times (two sides of the intersection join + the
    # per-doc counts) — persist it or the explode recomputes 4x
    sh = doc_shingles(docs, k=k).persist()
    mins = [
        F.min(
            portable_hash32_lane(F.col("shingle"), f"mh{i // 4}", i % 4)
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    cand = minhash_candidates(sig, bands=bands, rows_per_band=rows_per_band)
    return jaccard_verify(sh, cand, threshold)


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """``(doc_id, simhash)`` — 32-bit SimHash over whitespace tokens.

    Token hash = ``portable_hash32``; bit ``p`` of the fingerprint is 1
    iff Σ_tokens (±1 on bit p) > 0 (duplicate tokens count with
    multiplicity). One explode + one agg with ``bits`` conditional sums —
    map-side combined, no joins.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).withColumn("th", portable_hash32(F.col("tok"), "sh"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("th"), p).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{p}")
        for p in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*sums)
    fp = None
    for p in range(bits):
        term = F.when(F.col(f"b{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def hamming_distance(a: Column, b: Column, bits: int = 32) -> Column:
    """Popcount of xor — JVM-side via bin() + char counting."""
    x = a.bitwiseXOR(b)
    return F.length(F.regexp_replace(F.bin(x), "0", ""))


def duplicated_ngram_fraction(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_shingles, dup_shingles, dup_frac)`` — the fraction
    of a document's DISTINCT k-shingles that occur in at least one
    OTHER document. The standard duplicated-n-gram corpus-quality
    metric of training-data pipelines (boilerplate and template
    detection; Lee et al. 2022 "Deduplicating Training Data", public):
    high ``dup_frac`` flags documents whose content is mostly shared.

    Plan: one shingle explode (the MinHash recipe, whole-stage
    codegen), one ``groupBy(shingle)`` count (map-side partial
    aggregation absorbs boilerplate shingles before the exchange — the
    same hub story as degree counting), one equi-join back, one per-doc
    aggregation. Nothing is quadratic; shingle-frequency skew is
    absorbed map-side. Documents with fewer than ``k`` tokens have no
    shingles and are absent from the result (join+coalesce at the call
    site)."""
    sh = doc_shingles(docs, id_col=id_col, text_col=text_col, k=k)
    per_shingle = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("nd"))
    return (
        sh.join(per_shingle, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias(
                "dup_shingles"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "dup_shingles",
            (
                F.col("dup_shingles").cast("double") / F.col("n_shingles")
            ).alias("dup_frac"),
        )
    )
