"""Deterministic synthetic Common-Crawl-style ``pages`` table.

``input_hint`` fixes the input shape: an Iceberg table
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)``. No external data is allowed in this sandbox, so tests
and benches synthesize the table at small scale — fully deterministic
(pure hash arithmetic on the page index, seeded), fully distributed
(``spark.range`` + JVM-side expressions only; no driver-side data, no
Python in the generator), so the same generator scales to any row count.

The reference's analog is its seeded generator suite used as test
fixtures (``cpp/generators/*.cpp``, seeded via ``Aux::Random::setSeed``;
SURVEY §2.9 Generators row).

Link structure: each page carries ``links_per_page`` anchors whose
targets mix preferential-attachment-style hub skew (targets drawn
``pmod(hash, id+1)`` concentrate on low ids) with uniform randomness —
giving the power-law-ish in-degree a web graph has, which is what the
salting/orientation machinery downstream must survive. A fraction of
urls appear twice with different ``warc_ts`` (recrawls) so the
latest-snapshot dedup stage is exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VOCAB = (
    "the web graph page link rank node edge crawl index spark shuffle "
    "partition cluster score label data scale query join"
).split()


def synthetic_pages(
    spark: SparkSession,
    n_pages: int,
    links_per_page: int = 8,
    n_hosts: int = 32,
    words_per_page: int = 24,
    recrawl_every: int = 7,
    seed: int = 42,
) -> DataFrame:
    """Build ``pages(url, warc_ts, html, text, lang)`` deterministically.

    ``html`` wraps ``text`` in a fixed template plus ``<a href>`` anchors
    and a ``<script>`` decoy, so the frozen extractor's output can be
    verified byte-for-byte against the ``text`` column. Every page-``i``
    quantity is ``xxhash64(i, seed, tag)``-derived: same args ⇒ same
    table, on any cluster, at any parallelism.
    """
    base = spark.range(n_pages).withColumnRenamed("id", "pid")

    def h(tag: int, *cols):
        return F.abs(F.xxhash64(F.lit(seed), F.lit(tag), *cols))

    host = h(1, F.col("pid")) % n_hosts
    url = F.concat(
        F.lit("https://host"),
        host.cast("string"),
        F.lit(".example.com/p/"),
        F.col("pid").cast("string"),
    )
    # words: vocab[hash(pid, j) % |vocab|] for j in 0..words-1
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_page - 1)),
        lambda j: F.element_at(vocab, (h(2, F.col("pid"), j) % len(_VOCAB) + 1).cast("int")),
    )
    text = F.array_join(words, " ")
    # link targets: half skewed toward low ids (hubs), half uniform
    tgt = F.transform(
        F.sequence(F.lit(0), F.lit(links_per_page - 1)),
        lambda j: F.when(
            j % 2 == 0,
            h(3, F.col("pid"), j) % F.greatest(F.lit(1), (h(4, j) % n_pages) + 1),
        ).otherwise(h(5, F.col("pid"), j) % n_pages),
    )
    anchors = F.array_join(
        F.transform(
            tgt,
            lambda t: F.concat(
                F.lit('<a href="https://host'),
                (h(1, t) % n_hosts).cast("string"),
                F.lit(".example.com/p/"),
                t.cast("string"),
                F.lit('"></a>'),
            ),
        ),
        "",
    )
    html_str = F.concat(
        F.lit("<html><head><script>var x=1;</script></head><body><p>"),
        text,
        F.lit("</p>"),
        anchors,
        F.lit("</body></html>"),
    )
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(
        secs=(h(6, F.col("pid")) % 86400).cast("double")
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("es"), F.lit("fr")),
        (h(7, F.col("pid")) % 4 + 1).cast("int"),
    )
    pages = base.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
    # recrawls: every k-th page appears again 1 day later with a decoy
    # extra word — latest-snapshot dedup must pick this second crawl
    re_base = base.where(F.col("pid") % recrawl_every == 0)
    re_pages = re_base.select(
        url.alias("url"),
        (ts + F.make_interval(days=F.lit(1))).alias("warc_ts"),
        F.concat(
            F.lit("<html><body><p>recrawl "),
            text,
            F.lit("</p>"),
            anchors,
            F.lit("</body></html>"),
        )
        .cast("binary")
        .alias("html"),
        F.concat(F.lit("recrawl "), text).alias("text"),
        lang.alias("lang"),
    )
    return pages.unionAll(re_pages)
