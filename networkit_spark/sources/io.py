"""Graph file IO — edge-list / SNAP / METIS readers, writers, partition IO.

Reference surface (SURVEY §2.2): readers dispatched via the ``Format``
enum + ``readGraph`` (``networkit/graphio.pyx:724-769``). The ones users
actually hit are re-expressed as Spark reads:

- ``EdgeListReader(separator, firstNode, commentPrefix, continuous,
  directed)`` — whitespace/char-separated ``u v [w]`` lines, auto-detect
  weights, dictionary-encode non-continuous ids
  (``cpp/io/EdgeListReader.cpp:32-120``);
- ``SNAPGraphReader`` — ``#``-commented TSV with optional remap
  (``include/networkit/io/SNAPGraphReader.hpp:23-50``);
- ``METISGraphReader`` — 1-based adjacency lines with ``n m fmt`` header
  (``cpp/io/METISGraphReader.cpp``) — needed to load reference fixtures;
- writers (``EdgeListWriter``, partition writer/reader,
  ``graphio.pyx:891-908``) — Spark writes; the labels/scores tables ARE
  the partition files.

All readers return a :class:`~networkit_spark.graph.Graph`; the
dictionary path reuses :func:`assign_dense_ids` (deterministic
lexicographic rank — the ``getNodeMap()`` analog,
``EdgeListReader.cpp:25-30``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import DEFAULT_EDGE_WEIGHT, Graph
from networkit_spark.sources.linkgraph import assign_dense_ids


def read_edge_list(
    spark: SparkSession,
    path: str,
    separator: str = r"\s+",
    comment_prefix: str = "#",
    continuous: bool = True,
    first_node: int = 0,
    directed: bool = False,
) -> Graph | tuple[Graph, DataFrame]:
    """``EdgeListReader`` semantics. With ``continuous=True`` tokens are
    numeric ids shifted by ``first_node``; with ``continuous=False``
    arbitrary string tokens are dictionary-encoded and the ``(token, id)``
    map is returned alongside the graph (``getNodeMap()``).

    Weight auto-detection mirrors the reference: a third numeric column,
    when present, is the edge weight (``EdgeListReader.cpp:80-113``).
    """
    lines = spark.read.text(path).select(F.trim("value").alias("line"))
    lines = lines.where(
        (F.col("line") != "") & (~F.col("line").startswith(comment_prefix))
    )
    toks = lines.select(F.split("line", separator).alias("t"))
    parsed = toks.select(
        F.try_element_at("t", F.lit(1)).alias("su"),
        F.try_element_at("t", F.lit(2)).alias("sv"),
        F.try_element_at("t", F.lit(3)).alias("sw"),
    )
    if continuous:
        edges = parsed.select(
            (F.col("su").cast("long") - first_node).alias("src"),
            (F.col("sv").cast("long") - first_node).alias("dst"),
            F.coalesce(F.col("sw").cast("double"), F.lit(DEFAULT_EDGE_WEIGHT)).alias(
                "weight"
            ),
        )
        weighted = bool(parsed.where(F.col("sw").isNotNull()).limit(1).count())
        return Graph(edges, directed=directed, weighted=weighted)
    tokens = parsed.select(F.col("su").alias("url")).unionAll(
        parsed.select(F.col("sv").alias("url"))
    )
    node_map = assign_dense_ids(tokens).withColumnRenamed("url", "token")
    mu = node_map.select(F.col("token").alias("su"), F.col("id").alias("src"))
    mv = node_map.select(F.col("token").alias("sv"), F.col("id").alias("dst"))
    edges = (
        parsed.join(mu, "su")
        .join(mv, "sv")
        .select(
            "src",
            "dst",
            F.coalesce(F.col("sw").cast("double"), F.lit(DEFAULT_EDGE_WEIGHT)).alias(
                "weight"
            ),
        )
    )
    weighted = bool(parsed.where(F.col("sw").isNotNull()).limit(1).count())
    g = Graph(edges, directed=directed, weighted=weighted,
              vertices=node_map.select("id"))
    return g, node_map


def read_snap(
    spark: SparkSession, path: str, directed: bool = True, remap: bool = False
):
    """``SNAPGraphReader``: '#'-commented whitespace TSV
    (``SNAPGraphReader.hpp:23-50``); ``remap=True`` compacts ids."""
    if remap:
        return read_edge_list(
            spark, path, comment_prefix="#", continuous=False, directed=directed
        )
    return read_edge_list(
        spark, path, comment_prefix="#", continuous=True, directed=directed
    )


def read_metis(spark: SparkSession, path: str) -> Graph:
    """``METISGraphReader`` (``cpp/io/METISGraphReader.cpp``): line ``i``
    (1-based, after the ``n m [fmt]`` header) lists the neighbors of node
    ``i``; undirected, each edge appears in both lists. fmt=1 (weighted)
    not supported — the reference fixtures in scope are unweighted.

    Line numbering needs a file-order index: METIS is a small-fixture
    format (the reference ships ~50 tiny graphs), so a driver-side read
    is appropriate — NOT a scale path.
    """
    import re

    # Keep blank lines: in METIS a blank adjacency line IS a node (with
    # no neighbors) — dropping it would shift every later node id. Only
    # '%' comment lines are removed (METISGraphReader.cpp comment rule).
    with open(path) as f:
        raw = [ln.strip() for ln in f if not ln.lstrip().startswith("%")]
    header = re.split(r"\s+", raw[0])
    n = int(header[0])
    rows = []
    for u, line in enumerate(raw[1 : n + 1]):
        if not line:
            continue  # isolated node: contributes no edges
        for v in re.split(r"\s+", line):
            rows.append((u, int(v) - 1, DEFAULT_EDGE_WEIGHT))
    canon = [(u, v, w) for (u, v, w) in rows if u <= v]
    edges = spark.createDataFrame(canon, "src long, dst long, weight double")
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, weighted=False, vertices=vertices)


def write_edge_list(graph: Graph, path: str, separator: str = "\t") -> None:
    """``EdgeListWriter``: one ``u<sep>v[<sep>w]`` line per edge."""
    cols = [
        F.col("src").cast("string"),
        F.col("dst").cast("string"),
    ]
    if graph.weighted:
        cols.append(F.col("weight").cast("string"))
    graph.edges.select(F.concat_ws(separator, *cols).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def write_partition(labels: DataFrame, path: str) -> None:
    """Partition writer: the ``labels(id, label)`` table as parquet —
    the engine's native form of the reference's partition files."""
    labels.select("id", "label").write.mode("overwrite").parquet(path)


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("id", "label")
