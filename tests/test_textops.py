"""Dedup / similarity / text-analysis / multimodal operator tests."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.dedup import (
    exact_duplicates,
    hamming_distance,
    minhash_near_duplicates,
    minhash_signatures,
    shingles_col,
    simhash,
)
from networkit_spark.operators.similarity import topk_cosine, topk_cosine_lsh
from networkit_spark.operators.textstats import language_id, quality_scores, token_counts
from networkit_spark.operators.multimodal import (
    assets_from_documents,
    extract_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base, "en"),
        (1, base, "en"),  # exact dup of 0
        (2, base.replace("dog", "cat"), "en"),  # near dup of 0
        (3, "der hund und die katze sind nicht da ist der hund", "de"),
        (4, "completely different words about spark shuffles and joins", "en"),
        (5, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string").persist()


def test_exact_duplicates(docs):
    d = exact_duplicates(docs)
    dup = d.where(F.col("copies") == 2).collect()
    assert len(dup) == 1 and dup[0]["keep_id"] == 0


def test_shingles(spark):
    row = (
        spark.createDataFrame([("a b c d",)], "text string")
        .select(shingles_col(F.col("text")).alias("s"))
        .collect()[0]
    )
    assert sorted(row["s"]) == ["a b c", "b c d"]
    short = (
        spark.createDataFrame([("a b",), ("",)], "text string")
        .select(F.size(shingles_col(F.col("text"))).alias("n"))
        .collect()
    )
    assert [r["n"] for r in short] == [0, 0]


def test_minhash_identical_signatures(docs):
    sig = minhash_signatures(docs, num_hashes=8)
    rows = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(8)) for r in sig.collect()}
    assert rows[0] == rows[1]  # identical text, identical signature
    assert 5 not in rows  # empty doc has no shingles
    # deterministic across runs
    rows2 = {
        r["doc_id"]: tuple(r[f"h{i}"] for i in range(8))
        for r in minhash_signatures(docs, num_hashes=8).collect()
    }
    assert rows == rows2


def test_minhash_near_duplicates(docs):
    nd = minhash_near_duplicates(docs, threshold=0.5, num_hashes=16)
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in nd.collect()}
    assert pairs[(0, 1)] == 1.0  # exact dup pair found
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5  # near-dup found
    assert all(a < b for a, b in pairs)
    assert (3, 4) not in pairs


def test_simhash_close_for_near_dups(docs, spark):
    fp = simhash(docs)
    vals = {r["doc_id"]: r["simhash"] for r in fp.collect()}
    pair = spark.createDataFrame(
        [(vals[0], vals[2]), (vals[0], vals[4])], "x long, y long"
    ).select(hamming_distance(F.col("x"), F.col("y")).alias("d"))
    d_near, d_far = [r["d"] for r in pair.collect()]
    assert d_near < d_far  # near-dup is closer in hamming space
    assert vals[0] == vals[1]


def test_language_id(docs):
    pred = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert pred[0] == "en"
    assert pred[3] == "de"


def test_token_and_quality(docs):
    toks = {r["doc_id"]: r["n_tokens"] for r in token_counts(docs).collect()}
    assert toks[0] == 13 and toks[5] == 0
    q = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert q[0]["n_chars"] == 65
    assert q[0]["stopword_ratio"] > 0


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for i in range(64):
        angle = (i % 16) * math.pi / 32
        rows.append((i, [math.cos(angle), math.sin(angle)] + [0.0] * 6))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").persist()


def test_topk_cosine_exact(vectors):
    res = topk_cosine(vectors, vectors.where(F.col("vec_id") == 0), k=3)
    rows = res.orderBy("rank").collect()
    # vectors 16, 32, 48 share angle 0 with vector 0 → cos 1.0
    assert [r["neighbor_id"] for r in rows] == [16, 32, 48]
    assert all(r["cos"] == 1.0 for r in rows)


def test_lsh_recall(vectors):
    exact = topk_cosine(vectors, vectors.where(F.col("vec_id") < 4), k=3)
    approx = topk_cosine_lsh(
        vectors, vectors.where(F.col("vec_id") < 4), k=3, planes=4, tables=8, dim=8
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5  # identical-direction vectors always collide


def test_multimodal_features(docs):
    assets = assets_from_documents(docs.where(F.col("doc_id") <= 1))
    feats = extract_features(assets).collect()
    assert len(feats) == 2
    r = feats[0]
    assert r["n_bytes"] == 65
    assert r["byte_sum"] == sum("the quick brown fox jumps over the lazy dog again and again today".encode())
    assert len(r["feature"]) == 8
    assert abs(sum(r["feature"]) - 1.0) < 1e-9


def test_frame_sample(docs):
    assets = assets_from_documents(docs.where(F.col("doc_id") == 0))
    frames = frame_sample(assets, every_n_bytes=16, max_frames=8).collect()
    # 65 bytes → ceil(65/16) = 5 frames
    assert len(frames) == 5
    assert sorted(f["frame_no"] for f in frames) == [0, 1, 2, 3, 4]
    assert len(bytes(frames[0]["frame_bytes"])) == 16


def test_cosine_near_dup_exact(vectors):
    from networkit_spark.operators.similarity import cosine_near_dup

    pairs = cosine_near_dup(vectors, threshold=0.999).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # 4 copies of each of 16 directions → C(4,2)=6 identical pairs per angle
    assert len(got) == 16 * 6
    assert (0, 16) in got and (0, 32) in got and (16, 48) in got
    assert all(r["cos"] == 1.0 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_cosine_near_dup_lsh_recall(vectors):
    from networkit_spark.operators.similarity import (
        cosine_near_dup,
        cosine_near_dup_lsh,
    )

    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup(vectors, threshold=0.999).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_lsh(
            vectors, threshold=0.999, planes=4, tables=8, dim=8
        ).collect()
    }
    # identical-direction vectors collide in every table → full recall,
    # and exact verification makes precision 1.0 by construction
    assert approx <= exact
    assert len(approx & exact) / len(exact) == 1.0


def test_cosine_near_dup_lsh_bucket_cap(spark):
    from networkit_spark.operators.similarity import cosine_near_dup_lsh

    # degenerate corpus: every embedding identical → one bucket per
    # table holds the whole corpus. With the count-first cap the pair
    # self-join must yield zero candidates instead of C(n,2) in one
    # reducer.
    n = 40
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(n)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = cosine_near_dup_lsh(
        vecs, threshold=0.5, planes=2, tables=4, dim=4, max_bucket=n - 1
    )
    assert capped.count() == 0
    # raising the cap above the corpus size restores all pairs
    full = cosine_near_dup_lsh(
        vecs, threshold=0.5, planes=2, tables=4, dim=4, max_bucket=n
    )
    assert full.count() == n * (n - 1) // 2


def test_topk_cosine_ivf_recall(vectors):
    from networkit_spark.operators.similarity import topk_cosine, topk_cosine_ivf

    q = vectors.where(F.col("vec_id") < 4)
    exact = {(r["query_id"], r["neighbor_id"]) for r in topk_cosine(vectors, q, k=3).collect()}
    approx = topk_cosine_ivf(vectors, q, k=3, nlist=8, nprobe=4, lloyd_rounds=2).collect()
    a = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(a & exact) / len(exact) >= 0.5
    # ranks are dense 1..k per query
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_duplicated_ngram_fraction(spark):
    from networkit_spark.operators.dedup import duplicated_ngram_fraction

    docs = spark.createDataFrame(
        [
            # doc 0 and 1 share the shingle "a b c"; everything else is
            # unique to its document
            (0, "a b c d e"),     # shingles: "a b c", "b c d", "c d e"
            (1, "x a b c y"),     # shingles: "x a b", "a b c", "b c y"
            (2, "p q r"),         # shingle:  "p q r" (unique)
            (3, "p q"),           # too short for k=3 — no shingles
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["dup_shingles"], r["dup_frac"])
        for r in duplicated_ngram_fraction(docs, k=3).collect()
    }
    assert got[0] == (3, 1, 1.0 / 3.0)
    assert got[1] == (3, 1, 1.0 / 3.0)
    assert got[2] == (1, 0, 0.0)
    assert 3 not in got  # absent, not zero — caller joins+coalesces


def test_duplicated_ngram_fraction_identical_docs(spark):
    from networkit_spark.operators.dedup import duplicated_ngram_fraction

    docs = spark.createDataFrame(
        [(0, "the same text here"), (1, "the same text here")],
        "doc_id long, text string",
    )
    rows = duplicated_ngram_fraction(docs, k=3).collect()
    assert all(r["dup_frac"] == 1.0 for r in rows)
