"""Pages → links → dictionary → edges: the engine's ingest pipeline.

This is the Spark-native analog of the reference's dict-encoding readers
(``cpp/io/EdgeListReader.cpp:60-78`` keeps ``map<string, node>`` for
``continuous=false`` input; ``GraphTools::getContinuousNodeIds`` compacts
arbitrary id spaces, ``include/networkit/graph/GraphTools.hpp:258-311``)
— re-expressed as declarative DataFrame stages over the web-page table
from ``input_hint``:

    pages ──latest_pages──▶ one row per url (recrawl dedup)
          ──pages_to_links─▶ links(src_url, dst_url)   [Arrow UDF + explode]
          ──assign_dense_ids▶ vertex_dict(url, id)     [deterministic]
          ──links_to_edges──▶ edges(src, dst, weight)  [two dict joins]

Every stage is a pure function of its input: rerunning the pipeline on
the same pages snapshot reproduces byte-identical edge tables, which is
what makes the downstream checkpoints resumable and the correctness
oracles meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.functions.extraction import (
    EXTRACTOR_VERSION,
    extract_links_udf,
    extract_text_udf,
    normalize_url_col,
)
from networkit_spark.graph import Graph


def latest_pages(pages: DataFrame) -> DataFrame:
    """One row per url: the most recent crawl wins.

    The recrawl-dedup pattern from SURVEY §2.10 — the only event-time
    logic the north_rule implies. Shuffles once on ``url``; at the
    10^12-document scale the same statement runs unchanged because
    row_number needs only a per-key sort, no global order.
    """
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        pages.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def pages_to_links(pages: DataFrame, normalize: bool = True) -> DataFrame:
    """``links(src_url, dst_url)`` — one row per anchor.

    The href scan is the engine's single Python touchpoint (Arrow-batched
    ``pandas_udf``, extractor version stamped below); everything after the
    explode is JVM-side. Self-links are kept — the reference keeps
    self-loops until an explicit ``removeSelfLoops`` (``Graph.hpp:1305``).
    """
    html_str = F.col("html").cast("string")
    links = (
        pages.select(F.col("url").alias("src_url"), html_str.alias("__html"))
        .select("src_url", F.explode(extract_links_udf(F.col("__html"))).alias("dst_url"))
    )
    if normalize:
        links = links.select(
            normalize_url_col(F.col("src_url")).alias("src_url"),
            normalize_url_col(F.col("dst_url")).alias("dst_url"),
        )
    return links.withColumn("extractor_version", F.lit(EXTRACTOR_VERSION))


def extracted_text(pages: DataFrame) -> DataFrame:
    """``(url, text)`` via the frozen extractor — the byte-identical
    per-url invariant surface (input_hint)."""
    return pages.select(
        "url", extract_text_udf(F.col("html").cast("string")).alias("text")
    )


def assign_dense_ids(urls: DataFrame, col: str = "url", prefix_len: int = 16) -> DataFrame:
    """``vertex_dict(url, id)`` with ids = global lexicographic rank, 0-based.

    Deterministic (pure function of the url set — unlike
    ``monotonically_increasing_id``) and scalable: instead of one global
    ``row_number() over (order by url)`` window (single-partition, dies at
    scale), urls are grouped by a fixed-length prefix — prefix order is
    consistent with full-string order, so

        id = offset(prefix) + rank_within_prefix − 1

    equals the global rank. Per-prefix ranks are ordinary partitioned
    windows; offsets are a driver-side cumulative sum over the (small)
    prefix histogram broadcast back. Equivalent SQL (the oracle):
    ``row_number() over (order by url) - 1``.
    """
    distinct = urls.select(F.col(col).alias("url")).distinct()
    pref = distinct.withColumn("__p", F.substring("url", 1, prefix_len))
    hist = pref.groupBy("__p").count().collect()
    hist.sort(key=lambda r: r["__p"])
    offsets, acc = [], 0
    for r in hist:
        offsets.append((r["__p"], acc))
        acc += r["count"]
    spark = urls.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(offsets, schema="__p string, __off long")
    )
    w = Window.partitionBy("__p").orderBy("url")
    return (
        pref.join(off_df, "__p")
        .select(
            "url",
            (F.row_number().over(w) - 1 + F.col("__off")).alias("id"),
        )
    )


def links_to_edges(
    links: DataFrame, vertex_dict: DataFrame, combine_multiplicity: bool = True
) -> DataFrame:
    """``edges(src, dst, weight)``; weight = link multiplicity.

    Two equi-joins against the dictionary (the reference's
    ``mapNodeIds`` lookups, ``EdgeListReader.cpp:66-78``). On a cluster
    the dictionary is the small side for broadcast up to ~100M urls;
    beyond that both joins shuffle on ``url`` — co-partitioned, since
    both sides hash the same key.
    """
    d_src = vertex_dict.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    d_dst = vertex_dict.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    e = links.join(d_src, "src_url").join(d_dst, "dst_url").select("src", "dst")
    if combine_multiplicity:
        return e.groupBy("src", "dst").agg(
            F.count(F.lit(1)).cast("double").alias("weight")
        )
    return e.withColumn("weight", F.lit(1.0))


def build_link_graph(pages: DataFrame, dedup_recrawls: bool = True) -> tuple[Graph, DataFrame]:
    """Full pipeline: pages snapshot → (directed weighted Graph, vertex_dict).

    Vertices = every url seen as a source or target (link targets never
    crawled still get ids — the ``continuous=false`` reader behavior,
    ``EdgeListReader.cpp:60-78``).
    """
    snap = latest_pages(pages) if dedup_recrawls else pages
    links = pages_to_links(snap)
    urls = links.select(F.col("src_url").alias("url")).unionAll(
        links.select(F.col("dst_url").alias("url"))
    )
    vertex_dict = assign_dense_ids(urls)
    edges = links_to_edges(links, vertex_dict)
    vertices = vertex_dict.select("id")
    return Graph(edges, directed=True, weighted=True, vertices=vertices), vertex_dict
