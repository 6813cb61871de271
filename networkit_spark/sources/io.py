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


# --------------------------------------------------------------- long tail IO
# Fixture-interop formats (the reference ships them as single-threaded
# line parsers; they exist to exchange SMALL graphs with other tools).
# Readers parse headers driver-side and load bodies via Spark text reads
# where line order is irrelevant; writers collect to the driver — at
# engine scale the native persistence is parquet CSR (Graph.persist_csr),
# never these formats.


def read_konect(
    spark: SparkSession, path: str, remap: bool = False
) -> Graph | tuple[Graph, DataFrame]:
    """``KONECTGraphReader`` (``cpp/io/KONECTGraphReader.cpp:115-142``):
    first ``%`` property line declares ``sym|asym|bip`` (undirected /
    directed / bipartite-as-undirected) and an optional weight mode
    (``weighted|posweighted|signed|...`` → weighted); data lines are
    1-based ``u v [w]``."""
    with open(path) as f:
        first = f.readline().strip()
    fmt_tokens = first.lstrip("%").split()
    graph_format = fmt_tokens[0] if fmt_tokens else "asym"
    graph_type = fmt_tokens[1] if len(fmt_tokens) > 1 else "unweighted"
    directed = graph_format == "asym"
    weighted = graph_type in (
        "weighted", "posweighted", "signed",
        "multisigned", "multiweighted", "multiposweighted",
    )
    lines = spark.read.text(path).select(F.trim("value").alias("line"))
    lines = lines.where((F.col("line") != "") & (~F.col("line").startswith("%")))
    toks = lines.select(F.split("line", r"\s+").alias("t"))
    parsed = toks.select(
        F.try_element_at("t", F.lit(1)).alias("su"),
        F.try_element_at("t", F.lit(2)).alias("sv"),
        F.try_element_at("t", F.lit(3)).alias("sw"),
    )
    if not remap:
        edges = parsed.select(
            (F.col("su").cast("long") - 1).alias("src"),
            (F.col("sv").cast("long") - 1).alias("dst"),
            F.coalesce(F.col("sw").cast("double"), F.lit(DEFAULT_EDGE_WEIGHT)).alias(
                "weight"
            ),
        )
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
    g = Graph(edges, directed=directed, weighted=weighted,
              vertices=node_map.select("id"))
    return g, node_map


def read_matrix_market(spark: SparkSession, path: str) -> Graph:
    """``MatrixMarketReader`` (``cpp/io/MatrixMarketReader.cpp``):
    ``%%MatrixMarket matrix coordinate real|pattern [general|symmetric]``;
    after the (comment-skipping) ``nrows ncols nnz`` header, entries are
    1-based ``i j [w]``. A square adjacency matrix becomes a graph;
    ``symmetric`` → undirected."""
    with open(path) as f:
        first = f.readline().strip().lower()
    parts = first.split()
    if not first.startswith("%%matrixmarket") or len(parts) < 4:
        raise ValueError("not a MatrixMarket coordinate file")
    if parts[2] != "coordinate":
        raise ValueError(f"unsupported MatrixMarket format: {parts[2]}")
    weighted = parts[3] == "real"
    if parts[3] not in ("real", "pattern"):
        raise ValueError(f"unsupported MatrixMarket data type: {parts[3]}")
    symmetric = len(parts) > 4 and parts[4] == "symmetric"
    # the size row (nrows ncols nnz) is data-shaped, so the body needs a
    # line-order-aware parse — driver-side, like the reference (fixture
    # format, not a scale path)
    import re as _re

    n = 0
    rows = []
    with open(path) as f:
        state = 0
        for ln in f:
            t = ln.strip()
            if not t or t.startswith("%"):
                continue
            p = _re.split(r"\s+", t)
            if state == 0:
                state = 1  # size header consumed
                n = int(p[0])
                continue
            w = float(p[2]) if weighted and len(p) > 2 else DEFAULT_EDGE_WEIGHT
            rows.append((int(p[0]) - 1, int(p[1]) - 1, w))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(
        edges, directed=not symmetric, weighted=weighted, vertices=vertices
    )


def read_gml(spark: SparkSession, path: str) -> Graph:
    """``GMLGraphReader`` (``cpp/io/GMLGraphReader.cpp``): ``graph [
    directed 1 node [ id .. ] edge [ source .. target .. ] ]`` — a
    fixture format (driver-side parse)."""
    import re

    text = open(path).read()
    directed = bool(re.search(r"\bdirected\s+1\b", text))
    node_ids = [int(m) for m in re.findall(r"node\s*\[\s*id\s+(\d+)", text)]
    edge_pairs = re.findall(
        r"edge\s*\[\s*source\s+(\d+)\s+target\s+(\d+)", text
    )
    edges = spark.createDataFrame(
        [(int(u), int(v), DEFAULT_EDGE_WEIGHT) for u, v in edge_pairs],
        "src long, dst long, weight double",
    )
    vertices = spark.createDataFrame(
        [(i,) for i in node_ids], "id long"
    ) if node_ids else None
    return Graph(edges, directed=directed, weighted=False, vertices=vertices)


# Hard ceiling for the driver-collecting fixture writers below. They
# exist to exchange SMALL graphs with other tools (the reference's
# single-threaded line writers have the same role); pointing one at an
# engine-scale graph would OOM the driver, so fail fast instead.
FIXTURE_WRITER_MAX_EDGES = 10_000_000


def _guard_fixture_scale(graph: Graph, fmt: str) -> None:
    m = graph.number_of_edges()
    if m > FIXTURE_WRITER_MAX_EDGES:
        raise ValueError(
            f"{fmt} writer collects the graph to the driver and is for "
            f"fixture interop only: {m} edges > "
            f"{FIXTURE_WRITER_MAX_EDGES}. Persist engine-scale graphs "
            "with Graph.persist_csr (parquet CSR) instead."
        )


def _adjacency_lists(graph: Graph) -> list[list[int]]:
    """Driver-side 0..n-1 adjacency (fixture-scale writers only)."""
    _guard_fixture_scale(graph, "adjacency")
    n = graph.number_of_nodes()
    sym = graph.symmetrized() if not graph.directed else graph.edges
    adj: list[list[int]] = [[] for _ in range(n)]
    for r in sym.select("src", "dst").collect():
        adj[r["src"]].append(r["dst"])
    for lst in adj:
        lst.sort()
    return adj


def write_metis(graph: Graph, path: str) -> None:
    """``METISGraphWriter`` (``cpp/io/METISGraphWriter.cpp:16-30``):
    ``n m 0`` header then 1-based adjacency lines; undirected only."""
    if graph.directed:
        raise ValueError("METIS does not support directed graphs")
    adj = _adjacency_lists(graph)
    m = graph.number_of_edges()
    with open(path, "w") as f:
        f.write(f"{len(adj)} {m} 0\n")
        for nbrs in adj:
            f.write(" ".join(str(v + 1) for v in nbrs) + "\n")


def write_snap(graph: Graph, path: str) -> None:
    """``SNAPGraphWriter``: ``p n m u u 0`` problem line + edge lines."""
    _guard_fixture_scale(graph, "SNAP")
    n, m = graph.number_of_nodes(), graph.number_of_edges()
    with open(path, "w") as f:
        f.write(f"p {n} {m} u u 0\n")
        for r in graph.canonical().select("src", "dst").collect():
            f.write(f"{r['src']} {r['dst']}\n")


def write_dot(graph: Graph, path: str) -> None:
    """``DotGraphWriter``: ``graph { u -- v; }`` (undirected) or
    ``digraph { u -> v; }``."""
    _guard_fixture_scale(graph, "Dot")
    kw, arrow = ("digraph", "->") if graph.directed else ("graph", "--")
    base = graph.edges if graph.directed else graph.canonical()
    with open(path, "w") as f:
        f.write(kw + " {\n")
        for r in base.select("src", "dst").collect():
            f.write(f"{r['src']} {arrow} {r['dst']};\n")
        f.write("}\n")


def write_gml(graph: Graph, path: str) -> None:
    """``GMLGraphWriter`` (``cpp/io/GMLGraphWriter.cpp:21-40``)."""
    _guard_fixture_scale(graph, "GML")
    base = graph.edges if graph.directed else graph.canonical()
    with open(path, "w") as f:
        f.write("graph [\n")
        if graph.directed:
            f.write("  directed 1\n")
        for r in graph.vertices.orderBy("id").collect():
            f.write(f"  node [\n    id {r['id']}\n  ]\n")
        for r in base.select("src", "dst").collect():
            f.write(
                f"  edge [\n    source {r['src']}\n    target {r['dst']}\n  ]\n"
            )
        f.write("]\n")


def read_graphml(spark: SparkSession, path: str) -> Graph:
    """``GraphMLSAX`` reader (``networkit/GraphMLIO.py:10-90``): nodes
    mapped to dense 0-based ids in document order; ``edgedefault=
    "directed"`` sets directedness; a ``<key for="edge" attr.name=
    "weight" attr.type="double">`` declaration makes the graph weighted,
    with per-edge ``<data key=...>`` values (driver-side fixture parse,
    like the reference's pure-Python reader)."""
    import xml.etree.ElementTree as ET

    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}

    def _findall(root, tag):
        return root.findall(f"g:{tag}", ns) or root.findall(tag)

    tree = ET.parse(path)
    root = tree.getroot()
    weight_key = None
    for k in _findall(root, "key"):
        if (
            k.get("for") == "edge"
            and k.get("attr.name") == "weight"
            and k.get("attr.type") == "double"
        ):
            weight_key = k.get("id")
    graph_el = _findall(root, "graph")[0]
    directed = graph_el.get("edgedefault") == "directed"
    mapping: dict[str, int] = {}
    for node in _findall(graph_el, "node"):
        mapping[node.get("id")] = len(mapping)
    rows = []
    for edge in _findall(graph_el, "edge"):
        u = mapping[edge.get("source")]
        v = mapping[edge.get("target")]
        w = DEFAULT_EDGE_WEIGHT
        if weight_key is not None:
            for d in _findall(edge, "data"):
                if d.get("key") == weight_key and d.text:
                    w = float(d.text)
        rows.append((u, v, w))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    vertices = spark.createDataFrame(
        [(i,) for i in range(len(mapping))], "id long"
    ) if mapping else None
    return Graph(
        edges, directed=directed, weighted=weight_key is not None,
        vertices=vertices,
    )


def write_graphml(graph: Graph, path: str) -> None:
    """``GraphMLWriter`` (``networkit/GraphMLIO.py:93-140``): nodes as
    ``n{id}``, weight emitted via a ``d1`` key when weighted."""
    _guard_fixture_scale(graph, "GraphML")
    base = graph.edges if graph.directed else graph.canonical()
    kind = "directed" if graph.directed else "undirected"
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        if graph.weighted:
            f.write(
                '  <key id="d1" for="edge" attr.name="weight"'
                ' attr.type="double"/>\n'
            )
        f.write(f'  <graph id="G" edgedefault="{kind}">\n')
        for r in graph.vertices.orderBy("id").collect():
            f.write(f'    <node id="n{r["id"]}"/>\n')
        for r in base.select("src", "dst", "weight").collect():
            if graph.weighted:
                f.write(
                    f'    <edge source="n{r["src"]}" target="n{r["dst"]}">'
                    f'<data key="d1">{r["weight"]}</data></edge>\n'
                )
            else:
                f.write(
                    f'    <edge source="n{r["src"]}" target="n{r["dst"]}"/>\n'
                )
        f.write("  </graph>\n</graphml>\n")


def read_gexf(spark: SparkSession, path: str) -> Graph:
    """``GEXFReader`` (``networkit/GEXFIO.py``): ``<graph defaultedgetype
    ="directed">``; node ids mapped to dense 0-based ids in document
    order; per-edge ``weight`` attribute when present."""
    import xml.etree.ElementTree as ET

    tree = ET.parse(path)
    root = tree.getroot()

    def _local(el):
        return el.tag.rsplit("}", 1)[-1]

    graph_el = nodes_el = edges_el = None
    for el in root.iter():
        name = _local(el)
        if name == "graph" and graph_el is None:
            graph_el = el
        elif name == "nodes" and nodes_el is None:
            nodes_el = el
        elif name == "edges" and edges_el is None:
            edges_el = el
    directed = (
        graph_el is not None
        and graph_el.get("defaultedgetype") == "directed"
    )
    mapping: dict[str, int] = {}
    if nodes_el is not None:
        for node in nodes_el:
            if _local(node) == "node":
                mapping[node.get("id")] = len(mapping)
    rows, weighted = [], False
    if edges_el is not None:
        for edge in edges_el:
            if _local(edge) != "edge":
                continue
            u = mapping[edge.get("source")]
            v = mapping[edge.get("target")]
            w = edge.get("weight")
            if w is not None:
                weighted = True
            rows.append((u, v, float(w) if w is not None else DEFAULT_EDGE_WEIGHT))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    vertices = spark.createDataFrame(
        [(i,) for i in range(len(mapping))], "id long"
    ) if mapping else None
    return Graph(edges, directed=directed, weighted=weighted, vertices=vertices)


def write_gexf(graph: Graph, path: str) -> None:
    """``GEXFWriter`` (``networkit/GEXFIO.py``) — minimal static graph."""
    _guard_fixture_scale(graph, "GEXF")
    base = graph.edges if graph.directed else graph.canonical()
    kind = "directed" if graph.directed else "undirected"
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">\n')
        f.write(f'  <graph defaultedgetype="{kind}">\n    <nodes>\n')
        for r in graph.vertices.orderBy("id").collect():
            f.write(f'      <node id="{r["id"]}"/>\n')
        f.write("    </nodes>\n    <edges>\n")
        for i, r in enumerate(base.select("src", "dst", "weight").collect()):
            wattr = f' weight="{r["weight"]}"' if graph.weighted else ""
            f.write(
                f'      <edge id="{i}" source="{r["src"]}"'
                f' target="{r["dst"]}"{wattr}/>\n'
            )
        f.write("    </edges>\n  </graph>\n</gexf>\n")


def read_dgs(spark: SparkSession, path: str, mapped: bool = True,
             base_index: int = 0) -> DataFrame:
    """``DGSStreamParser`` (``cpp/dynamics/DGSStreamParser.cpp:17-140``):
    parse a DGS004 event file into an ordered event DataFrame
    ``(seq, etype, u, v, w)`` consumable by
    :func:`networkit_spark.streaming.events.apply_events` (one batch) or
    replayed in ``st``-delimited batches via
    :class:`~networkit_spark.streaming.events.GraphUpdater`.

    ``mapped=True`` maps arbitrary string keys to dense 0-based ids in
    first-seen order (the reference's mapped mode); otherwise ids are
    ``int(key) - base_index``.
    """
    key2id: dict[str, int] = {}

    def _map(key: str) -> int:
        if not mapped:
            return int(key) - base_index
        if key not in key2id:
            key2id[key] = len(key2id)
        return key2id[key]

    def _wval(tok: str) -> float:
        return float(tok.split("=", 1)[1])

    rows = []
    with open(path) as f:
        header = f.readline()
        if not header.startswith("DGS004"):
            raise ValueError("expected DGS004 cookie in first line")
        f.readline()  # stream description line
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "st":
                rows.append(("TIME_STEP", None, None, None))
            elif tag == "an":
                rows.append(("NODE_ADDITION", _map(parts[1]), None, None))
            elif tag == "dn":
                rows.append(("NODE_REMOVAL", _map(parts[1]), None, None))
            elif tag == "rn":
                rows.append(("NODE_RESTORATION", _map(parts[1]), None, None))
            elif tag == "ae":
                w = _wval(parts[4]) if len(parts) >= 5 else 1.0
                rows.append(
                    ("EDGE_ADDITION", _map(parts[2]), _map(parts[3]), w)
                )
            elif tag in ("ce", "ie", "de"):
                u_key, v_key = parts[1].split("-", 1)
                etype = {
                    "ce": "EDGE_WEIGHT_UPDATE",
                    "ie": "EDGE_WEIGHT_INCREMENT",
                    "de": "EDGE_REMOVAL",
                }[tag]
                w = _wval(parts[2]) if len(parts) >= 3 else None
                rows.append((etype, _map(u_key), _map(v_key), w))
            else:
                raise ValueError(f"malformed DGS line: {line!r}")
    return spark.createDataFrame(
        [(i,) + r for i, r in enumerate(rows)],
        "seq long, etype string, u long, v long, w double",
    )


# ------------------------------------------------- binary interop formats
# graph-tool "gt" and Thrill adjacency binaries. Like the other fixture
# writers these parse/emit on the driver (binary interop with external
# single-node tools is inherently fixture-scale); both writers run
# through _guard_fixture_scale.

_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])


def _gt_width(n: int) -> int:
    """Adjacency id byte-width by node count
    (``GraphToolBinaryReader.cpp:87-97``): 1/2/4/8 as n crosses 2^8/16/32."""
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


def read_graphtool_binary(spark: SparkSession, path: str) -> Graph:
    """``GraphToolBinaryReader`` (``cpp/io/GraphToolBinaryReader.cpp:15-135``):
    6-byte magic + version 0x01 + endianness byte, uint64-length comment,
    directed byte, uint64 n, then per node a uint64 out-degree and that
    many ids of width ``_gt_width(n)``. Undirected files store each edge
    once in the higher endpoint's list (writer invariant), so edges are
    added exactly as listed."""
    with open(path, "rb") as f:
        header = f.read(8)
        if len(header) < 8 or header[:6] != _GT_MAGIC or header[6] != 0x01:
            raise ValueError("gt header is broken")
        if header[7] not in (0x00, 0x01):
            raise ValueError("gt endianness byte is broken")
        bo = "little" if header[7] == 0x00 else "big"
        comment_len = int.from_bytes(f.read(8), bo)
        f.read(comment_len)
        directed = f.read(1) != b"\x00"
        n = int.from_bytes(f.read(8), bo)
        width = _gt_width(n)
        rows = []
        for u in range(n):
            deg = int.from_bytes(f.read(8), bo)
            buf = f.read(deg * width)
            for i in range(deg):
                v = int.from_bytes(buf[i * width : (i + 1) * width], bo)
                rows.append((u, v, 1.0))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    vertices = spark.range(n).select(F.col("id"))
    return Graph(edges, directed=directed, weighted=False, vertices=vertices)


def write_graphtool_binary(
    graph: Graph, path: str, little_endian: bool = True
) -> None:
    """``GraphToolBinaryWriter`` (``cpp/io/GraphToolBinaryWriter.cpp:18-112``):
    empty comment; undirected graphs store each edge once, in the list of
    the larger endpoint (``v <= u`` filter)."""
    _guard_fixture_scale(graph, "gt")
    bo = "little" if little_endian else "big"
    n = graph.number_of_nodes()
    width = _gt_width(n)
    if graph.directed:
        adj: list[list[int]] = [[] for _ in range(n)]
        for r in graph.edges.select("src", "dst").collect():
            adj[r["src"]].append(r["dst"])
        for lst in adj:
            lst.sort()
    else:
        adj = [[] for _ in range(n)]
        for r in graph.canonical().select("src", "dst").collect():
            u, v = r["src"], r["dst"]
            lo, hi = (u, v) if u <= v else (v, u)
            adj[hi].append(lo)  # v <= u invariant
        for lst in adj:
            lst.sort()
    with open(path, "wb") as f:
        f.write(_GT_MAGIC + bytes([0x01, 0x00 if little_endian else 0x01]))
        f.write((0).to_bytes(8, bo))  # empty comment
        f.write(b"\x01" if graph.directed else b"\x00")
        f.write(n.to_bytes(8, bo))
        for u in range(n):
            f.write(len(adj[u]).to_bytes(8, bo))
            for v in adj[u]:
                f.write(v.to_bytes(width, bo))


def _thrill_varint(value: int) -> bytes:
    """LEB128-ish variable-length encoding
    (``ThrillGraphBinaryWriter.cpp:35-44``): 7 data bits per byte,
    high bit = continuation; degree 0 is a single 0x00 byte."""
    if value == 0:
        return b"\x00"
    out = bytearray()
    while value:
        b = value & 0x7F
        value >>= 7
        out.append(b | (0x80 if value else 0))
    return bytes(out)


def read_thrill_binary(
    spark: SparkSession, paths: str | list[str], n: int | None = None
) -> Graph:
    """``ThrillGraphBinaryReader`` (``cpp/io/ThrillGraphBinaryReader.cpp:25-110``):
    a concatenated stream (optionally split across files) of per-node
    records — varint degree then degree little-endian uint32 neighbor
    ids; undirected half-edges stored with ``u <= v``. Node count grows
    with the stream; a neighbor id past the last record extends it
    (``max_id`` handling in the reference)."""
    if isinstance(paths, str):
        paths = [paths]
    data = b"".join(open(p, "rb").read() for p in paths)
    pos, u, max_id, rows = 0, 0, -1, []
    size = len(data)
    while pos < size:
        # varint degree
        deg, shift = 0, 0
        while True:
            byte = data[pos]
            pos += 1
            if shift == 63 and (byte & 0xFE):
                raise OverflowError("varint64 overflow in thrill stream")
            deg |= (byte & 0x7F) << shift
            if not (byte & 0x80):
                break
            shift += 7
        for _ in range(deg):
            v = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            max_id = max(max_id, v)
            rows.append((u, v, 1.0))
        u += 1
    total = max(u, max_id + 1, n or 0)
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    vertices = spark.range(total).select(F.col("id"))
    return Graph(edges, directed=False, weighted=False, vertices=vertices)


def write_thrill_binary(graph: Graph, path: str) -> None:
    """``ThrillGraphBinaryWriter`` (``cpp/io/ThrillGraphBinaryWriter.cpp:13-57``):
    per node the varint degree then the ``u <= v`` neighbors as
    little-endian uint32; rejects graphs past the uint32 id bound."""
    _guard_fixture_scale(graph, "thrill")
    n = graph.number_of_nodes()
    if n > (1 << 32) - 1:
        raise ValueError(
            "Thrill binary graphs only support graphs with up to 2^32-1 nodes."
        )
    adj: list[list[int]] = [[] for _ in range(n)]
    base = graph.edges if graph.directed else graph.canonical()
    for r in base.select("src", "dst").collect():
        u, v = r["src"], r["dst"]
        lo, hi = (u, v) if u <= v else (v, u)
        adj[lo].append(hi)  # u <= v invariant
    with open(path, "wb") as f:
        for u in range(n):
            adj[u].sort()
            f.write(_thrill_varint(len(adj[u])))
            for v in adj[u]:
                f.write(v.to_bytes(4, "little"))


def write_dgs(events: DataFrame, path: str, order_col: str | None = None) -> None:
    """``DGSWriter::write`` (``cpp/dynamics/DGSWriter.cpp:14-58``):
    serialize an event frame ``(etype, u, v, w)`` as a DGS004 stream —
    ``an``/``dn``/``ae``/``de``/``ce``/``ie``/``st`` lines with the
    reference's exact tokens (``ae u-v u v weight=w``). Driver-side
    like the other fixture writers; events are emitted in ``order_col``
    order when given (e.g. the ``seq`` column ``read_dgs`` produces, or
    ``GraphDifference``'s ``phase``)."""
    df = events
    if order_col is not None:
        df = df.orderBy(order_col)
    rows = df.collect()
    lines = ["DGS004", "noname 0 0"]
    for r in rows:
        t = r["etype"]
        if t == "NODE_ADDITION":
            lines.append(f"an {r['u']}")
        elif t == "NODE_REMOVAL":
            lines.append(f"dn {r['u']}")
        elif t == "EDGE_ADDITION":
            lines.append(
                f"ae {r['u']}-{r['v']} {r['u']} {r['v']} weight={r['w']}"
            )
        elif t == "EDGE_REMOVAL":
            lines.append(f"de {r['u']}-{r['v']}")
        elif t == "EDGE_WEIGHT_UPDATE":
            lines.append(f"ce {r['u']}-{r['v']} weight={r['w']}")
        elif t == "EDGE_WEIGHT_INCREMENT":
            lines.append(f"ie {r['u']}-{r['v']} weight={r['w']}")
        elif t == "TIME_STEP":
            lines.append("st")
        else:
            raise ValueError(f"unknown event type {t}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
