"""Text analysis over the documents/pages tables — language ID, quality
scoring, token counting, fingerprinting.

Training-data-pipeline operators (no reference counterpart — NetworKit
has no string functions, SURVEY §2.8). Everything is built-in
``pyspark.sql.functions`` inside whole-stage codegen; the formulas are
chosen to be expressible verbatim in ANSI SQL so each has a DuckDB
oracle behind the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: marker stopwords per language for the n-gram/stopword language ID
#: heuristic; alphabetical language order is the documented tie-break.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "nicht", "ist"],
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "que", "de", "es"],
    "fr": ["le", "la", "et", "les", "est"],
}


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of `` needle `` in `` text `` (word-boundary via space
    padding), by replace-length arithmetic — portable to any SQL engine.
    Plain-string ``replace`` (the pattern has no metacharacters), not a
    regex scan: the 20 marker probes were the hot path of language_id,
    and both engines define replace as the same non-overlapping
    left-to-right rule the regex version used."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    pat = f" {needle} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit(""))))
        / len(pat)
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over lowercased space-collapsed text."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    return {
        lang: sum(
            (_count_occurrences(norm, w) for w in words), F.lit(0).cast("long")
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_argmax(text: Column) -> tuple[Column, Column]:
    """``(pred_lang, score)`` columns — argmax marker count over
    `` LANG_MARKERS ``, ties to the alphabetically first language. The
    single definition of the tie-break shared by :func:`language_id`
    and the merged ``doc_textstats`` entry query."""
    scores = lang_scores(text)
    best, best_score = None, None
    for lang in sorted(scores):  # alphabetical = tie-break order
        cond = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), cond
        else:
            better = cond > best_score
            best = F.when(better, F.lit(lang)).otherwise(best)
            best_score = F.when(better, cond).otherwise(best_score)
    return best, best_score


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, pred_lang, score)`` — argmax marker count, ties to the
    alphabetically first language."""
    best, best_score = lang_argmax(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        best.alias("pred_lang"),
        best_score.alias("score"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, n_tokens)`` whitespace tokens; empty → 0."""
    t = F.trim(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+"))).alias("n_tokens"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: char length, punctuation ratio,
    mean token length, stopword ratio. Pure column expressions."""
    text = F.col(text_col)
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    t = F.trim(text)
    n_tok = F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    stop_hits = sum(
        (_count_occurrences(norm, w) for w in LANG_MARKERS["en"]),
        F.lit(0).cast("long"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_chars"),
        F.round(punct.cast("double") / F.greatest(n, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n.cast("double") / F.greatest(n_tok, F.lit(1)), 6).alias("mean_tok_len"),
        F.round(stop_hits.cast("double") / F.greatest(n_tok, F.lit(1)), 6).alias(
            "stopword_ratio"
        ),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, fingerprint)`` md5 of whitespace-normalized lowercase
    text — the canonicalized exact-dup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fingerprint"))
