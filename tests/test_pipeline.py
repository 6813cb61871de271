"""Pages → links → dictionary → edges pipeline tests (SURVEY §7 step 1).

Covers the input_hint invariants: byte-identical extraction per url,
deterministic dictionary encoding, recrawl dedup, and the
``continuous=false``-style id assignment for never-crawled link targets
(``cpp/io/EdgeListReader.cpp:60-78`` precedent).
"""

import pytest
from pyspark.sql import functions as F

from networkit_spark.functions.extraction import (
    extract_links,
    extract_text,
    normalize_url_col,
)
from networkit_spark.sources import (
    assign_dense_ids,
    build_link_graph,
    latest_pages,
    synthetic_pages,
)
from networkit_spark.sources.linkgraph import extracted_text


def test_extract_text_pure_function():
    html = (
        "<html><head><script>var x = 'ignore<me>';</script>"
        "<style>p { color: red; }</style></head>"
        "<body><!-- comment --><p>Hello &amp; welcome to &lt;Spark&gt;</p>"
        "<a href=\"https://x.test/\">link text</a></body></html>"
    )
    assert extract_text(html) == "Hello & welcome to <Spark> link text"
    # frozen: same input, same bytes, every call
    assert extract_text(html) == extract_text(html)
    assert extract_text("") == ""
    assert extract_text(None) is None


def test_extract_links_document_order():
    html = (
        '<body><a href="https://a.test/1">x</a>'
        "<a class='z' HREF='https://b.test/2'></a>"
        '<a href="https://a.test/1"></a></body>'
    )
    assert extract_links(html) == [
        "https://a.test/1",
        "https://b.test/2",
        "https://a.test/1",
    ]


def test_normalize_url(spark):
    rows = (
        spark.createDataFrame(
            [
                ("HTTPS://Host3.Example.COM/p/7#frag",),
                ("https://host1.example.com/Path/",),
                ("https://host1.example.com",),
            ],
            "url string",
        )
        .select(normalize_url_col(F.col("url")).alias("u"))
        .collect()
    )
    assert [r["u"] for r in rows] == [
        "https://host3.example.com/p/7",
        "https://host1.example.com/Path",
        "https://host1.example.com",
    ]


@pytest.fixture(scope="module")
def pages(spark):
    return synthetic_pages(spark, 150, links_per_page=6, recrawl_every=5).persist()


def test_latest_pages_dedup(pages):
    snap = latest_pages(pages)
    assert snap.count() == 150
    assert snap.select("url").distinct().count() == 150
    # recrawled urls must surface the later snapshot (text starts "recrawl ")
    recrawled = snap.where(F.col("text").startswith("recrawl ")).count()
    assert recrawled == 30  # 150 / recrawl_every


def test_extraction_byte_identical(pages):
    snap = latest_pages(pages)
    joined = extracted_text(snap).join(
        snap.select("url", F.col("text").alias("want")), "url"
    )
    assert joined.where(F.col("text") != F.col("want")).count() == 0


def test_dense_ids_deterministic(spark):
    urls = spark.createDataFrame(
        [("u/%03d" % (i % 40),) for i in range(200)], "url string"
    )
    d1 = assign_dense_ids(urls)
    assert d1.count() == 40
    rows = d1.orderBy("id").collect()
    assert [r["id"] for r in rows] == list(range(40))
    # ids are the lexicographic rank
    assert [r["url"] for r in rows] == sorted({"u/%03d" % (i % 40) for i in range(200)})
    # rerun ⇒ identical assignment
    d2 = assign_dense_ids(urls)
    assert (
        d1.join(d2.withColumnRenamed("id", "id2"), "url")
        .where(F.col("id") != F.col("id2"))
        .count()
        == 0
    )


def test_build_link_graph(pages):
    g, vd = build_link_graph(pages)
    n = g.number_of_nodes()
    # dense 0-based ids covering every vertex
    row = vd.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi"), F.count(F.lit(1)).alias("c")
    ).collect()[0]
    assert row["lo"] == 0 and row["hi"] == n - 1 and row["c"] == n
    assert g.directed and g.weighted
    # weight = link multiplicity ≥ 1; total multiplicity = anchor count
    total = g.edges.agg(F.sum("weight")).collect()[0][0]
    assert total == 150 * 6
    # deterministic rebuild: same edges
    g2, _ = build_link_graph(pages)
    assert (
        g.edges.exceptAll(g2.edges).count() == 0
        and g2.edges.exceptAll(g.edges).count() == 0
    )
