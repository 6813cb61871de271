"""Frozen text/link extraction over web-page HTML — vectorized Arrow UDFs.

The reference has no string functions at all (SURVEY §2.8) — this module
is the engine-side realization of ``input_hint``: Common-Crawl-style
pages ``(url, warc_ts, html, text, lang)`` are turned into a link table
by **byte-identical, versioned** extraction. The per-row invariant
(north_star) is that ``extract_text(html)`` yields the same bytes for
the same url on every run, forever: the extractor is a pure function of
its input built only on the stdlib ``re`` module (no locale, no time, no
third-party parser whose minor version could shift output), and its
version is stamped into lineage metadata by the pipeline.

These are the ONLY Python UDFs in the engine; everything downstream of
``links(src_url, dst_url)`` is pure DataFrame ops ("no per-row Python"
per input_hint). They are Arrow-batched ``pandas_udf``s: each call moves
one Arrow record batch into pandas, applies a compiled-regex pipeline
column-at-a-time, and returns a batch — 10-100× faster than row-at-a-time
Python UDFs and the idiomatic Spark escape hatch for logic Catalyst
can't express.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

#: bump ONLY with a migration plan: changing extraction output invalidates
#: every downstream dictionary id and edge table.
EXTRACTOR_VERSION = "v1"

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")
# The five entities HTML 2.0 guarantees; anything rarer passes through
# verbatim so the function stays total and version-stable.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]

_HREF_RE = re.compile(r"""(?i)<a\b[^>]*?\bhref\s*=\s*["']([^"']*)["']""")


def extract_text(html: str) -> str:
    """Frozen v1 extractor: drop script/style/comments, strip tags,
    decode the 5 basic entities, collapse whitespace, strip ends."""
    if html is None:
        return None
    s = _SCRIPT_RE.sub(" ", html)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


def extract_links(html: str) -> list[str]:
    """All ``<a href="...">`` values, document order, raw (un-normalized)."""
    if html is None:
        return []
    return _HREF_RE.findall(html)


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text, na_action="ignore")


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_links, na_action="ignore")


def normalize_url_col(url: Column) -> Column:
    """URL normalization as a JVM-side column expression (hot path — runs
    once per extracted link, so it must stay inside whole-stage codegen):
    trim, lowercase scheme+host (everything before the first ``/`` after
    ``://``), drop the ``#fragment``, drop a trailing ``/`` on non-root
    paths."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    # scheme://host prefix (lowercased), path/query tail (case preserved)
    prefix = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    tail = F.regexp_replace(u.substr(F.length(prefix) + 1, F.lit(1_000_000)), r"/$", "")
    return F.when(
        F.length(prefix) > 0, F.concat(F.lower(prefix), tail)
    ).otherwise(F.regexp_replace(u, r"/$", ""))
