"""Property-based invariants for the LLM-pipeline dedup operators:
hypothesis draws small random corpora (with deliberate exact
duplicates) and checks the guarantees the pipeline design promises.

- Exact duplicates (identical text) collide in EVERY MinHash band, so
  the LSH near-dup path must recover every exact-dup pair regardless
  of band geometry — recall 1.0 on Jaccard-1 pairs, deterministically.
- The exact-Jaccard verify stage makes precision exact: every reported
  pair's true shingle-Jaccard (recomputed independently in Python)
  must be ≥ the threshold, and every reported jaccard value must equal
  the Python recomputation.
- SimHash is a pure function of the token multiset: identical texts
  hash identically, and token order does not change the signature.
"""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from networkit_spark.operators.dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    simhash,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "web", "page"]

texts = st.lists(
    st.integers(min_value=0, max_value=len(WORDS) - 1),
    min_size=4,
    max_size=12,
).map(lambda idx: " ".join(WORDS[i] for i in idx))

corpora = st.lists(texts, min_size=2, max_size=6)

PROP = settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _shingles(text: str, k: int = 3) -> set:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _corpus_df(spark, corpus):
    # duplicate every even-indexed doc so exact-dup pairs always exist
    rows = []
    for i, t in enumerate(corpus):
        rows.append((i, t))
    base_n = len(rows)
    for i, t in enumerate(corpus):
        if i % 2 == 0:
            rows.append((base_n + i, t))
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


@given(corpus=corpora)
@PROP
def test_minhash_near_dup_recall_and_precision(spark, corpus):
    docs, rows = _corpus_df(spark, corpus)
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_near_duplicates(docs, threshold=0.5).collect()
    }
    texts_by_id = dict(rows)
    # recall: every identical-text pair must be reported (jaccard 1.0)
    for (i, ti), (j, tj) in itertools.combinations(rows, 2):
        if ti == tj:
            pair = (min(i, j), max(i, j))
            assert pair in got, f"exact-dup pair {pair} missed"
            assert got[pair] == pytest.approx(1.0)
    # precision: every reported pair's true Jaccard ≥ threshold, and the
    # reported value equals an independent Python recomputation
    for (a, b), jac in got.items():
        sa, sb = _shingles(texts_by_id[a]), _shingles(texts_by_id[b])
        want = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
        assert jac == pytest.approx(want, abs=1e-6)
        assert want >= 0.5


@given(corpus=corpora)
@PROP
def test_exact_duplicates_groups_match_python(spark, corpus):
    docs, rows = _corpus_df(spark, corpus)
    out = exact_duplicates(docs).collect()
    # contract: one (content_hash, keep_id, copies) row per distinct
    # text, keep = min doc_id, copies = group size
    by_text = {}
    for i, t in rows:
        by_text.setdefault(t, set()).add(i)
    got = sorted((r["keep_id"], r["copies"]) for r in out)
    want = sorted((min(s), len(s)) for s in by_text.values())
    assert got == want


@given(corpus=corpora)
@PROP
def test_simhash_is_token_multiset_function(spark, corpus):
    docs, rows = _corpus_df(spark, corpus)
    # append order-shuffled twins: same token multiset, different order
    extra = [
        (10_000 + i, " ".join(reversed(t.split())))
        for i, t in rows
    ]
    all_docs = docs.sparkSession.createDataFrame(
        rows + extra, "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(all_docs).collect()}
    for i, t in rows:
        assert sigs[i] == sigs[10_000 + i], "SimHash must ignore token order"
    by_text = {}
    for i, t in rows:
        by_text.setdefault(t, []).append(i)
    for ids in by_text.values():
        assert len({sigs[i] for i in ids}) == 1, "identical text, one signature"
