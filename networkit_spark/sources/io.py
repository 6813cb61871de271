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


def write_edge_list(
    graph: Graph, path: str, separator: str = "\t", first_node: int = 0
) -> None:
    """``EdgeListWriter``: one ``u<sep>v[<sep>w]`` line per edge; ids
    shifted by ``first_node`` (the reference writer's offset)."""
    cols = [
        (F.col("src") + first_node).cast("string"),
        (F.col("dst") + first_node).cast("string"),
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


# ------------------------------------------------------- partition/cover IO
# Text and binary partition/cover interop formats (reference `cpp/io/`).
# Same contract as the other fixture formats above: single files written
# and parsed driver-side (they exist to exchange SMALL labelings with
# other tools), with Spark frames on the engine side; the native
# engine-scale labeling form stays parquet (write_partition).

_NONE_SENTINEL = (1 << 64) - 1  # NetworKit's `none` (max index)


def _guard_fixture_rows(df: DataFrame, fmt: str) -> None:
    n = df.count()
    if n > FIXTURE_WRITER_MAX_EDGES:
        raise ValueError(
            f"{fmt} writer collects to the driver and is for fixture "
            f"interop only: {n} rows > {FIXTURE_WRITER_MAX_EDGES}. "
            "Persist engine-scale labelings as parquet (write_partition)."
        )


def read_partition_text(spark: SparkSession, path: str) -> DataFrame:
    """``PartitionReader`` (``cpp/io/PartitionReader.cpp:12-37``): line i
    holds the cluster id of node i; ``*``/``#`` lines skipped. Returns
    ``(id, label)``."""
    labels = []
    i = 0
    with open(path) as f:
        for line in f:
            if line[:1] in ("*", "#"):
                continue
            labels.append((i, int(line.strip() or 0)))
            i += 1
    return spark.createDataFrame(labels or [(0, 0)], "id long, label long").where(
        F.lit(bool(labels))
    )


def write_partition_text(labels: DataFrame, path: str) -> None:
    """``PartitionWriter`` (``include/networkit/io/PartitionWriter.hpp:26-29``):
    one cluster id per line in node-id order. Node ids must be dense
    0..n−1 (the format has no id column)."""
    _guard_fixture_rows(labels, "PartitionWriter")
    rows = labels.select("id", "label").orderBy("id").collect()
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r['label']}\n")


def read_edge_list_partition(
    spark: SparkSession, path: str, first_node: int = 1, sep: str = " "
) -> DataFrame:
    """``EdgeListPartitionReader`` (``cpp/io/EdgeListPartitionReader.cpp:
    16-44``): ``v<sep>c`` lines, node ids offset by ``first_node``,
    ``#`` comments skipped. Nodes the file never names are absent here
    (the reference back-fills them with the ``none`` sentinel)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(sep)
            if not parts or parts[0] == "#" or not parts[0]:
                continue
            out.append((int(parts[0]) - first_node, int(parts[1])))
    return spark.createDataFrame(out or [(0, 0)], "id long, label long").where(
        F.lit(bool(out))
    )


def read_binary_partition(spark: SparkSession, path: str, width: int = 8) -> DataFrame:
    """``BinaryPartitionReader`` (``cpp/io/BinaryPartitionReader.cpp:
    13-48``): little-endian fixed-``width`` (4 or 8) cluster ids, node
    id = record position. The ``none`` sentinel (all-ones) maps to NULL."""
    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    import os as _os

    if _os.path.getsize(path) % width:
        raise ValueError("length of partition file must be a multiple of the width")
    import numpy as _np

    raw = _np.fromfile(path, dtype="<u4" if width == 4 else "<u8")
    sentinel = (1 << (8 * width)) - 1
    rows = [
        (i, None if int(p) == sentinel else int(p)) for i, p in enumerate(raw)
    ]
    return spark.createDataFrame(rows or [(0, 0)], "id long, label long").where(
        F.lit(bool(rows))
    )


def write_binary_partition(labels: DataFrame, path: str, width: int = 8) -> None:
    """``BinaryPartitionWriter`` (``cpp/io/BinaryPartitionWriter.cpp:
    13-30``): cluster ids as little-endian ``width``-byte integers in
    node-id order; width-4 overflow raises like the reference."""
    if width not in (4, 8):
        raise ValueError("Only width 4 and 8 are supported")
    _guard_fixture_rows(labels, "BinaryPartitionWriter")
    import numpy as _np

    rows = labels.select("id", "label").orderBy("id").collect()
    vals = [(_NONE_SENTINEL if r["label"] is None else int(r["label"])) for r in rows]
    if width == 4:
        if any(v > 0xFFFFFFFF and v != _NONE_SENTINEL for v in vals):
            raise ValueError(
                "upper bound cannot be represented by width 4; use width 8"
            )
        arr = _np.array([v & 0xFFFFFFFF for v in vals], dtype="<u4")
    else:
        arr = _np.array(vals, dtype="<u8")
    arr.tofile(path)


def read_binary_edge_list_partition(
    spark: SparkSession,
    paths: str | list[str],
    first_node: int = 0,
    width: int = 8,
) -> DataFrame:
    """``BinaryEdgeListPartitionReader`` (``cpp/io/
    BinaryEdgeListPartitionReader.cpp:17-80``): a stream of
    ``(node, cluster)`` little-endian fixed-width pairs, possibly split
    across several files (read in order)."""
    if width not in (4, 8):
        raise ValueError("width must be 4 or 8")
    import numpy as _np

    if isinstance(paths, str):
        paths = [paths]
    out: list[tuple[int, int]] = []
    for p in paths:
        raw = _np.fromfile(p, dtype="<u4" if width == 4 else "<u8")
        if len(raw) % 2:
            raise ValueError(f"odd number of values in {p}")
        for u, c in raw.reshape(-1, 2):
            if int(u) < first_node:
                raise ValueError("node smaller than the given firstNode found")
            out.append((int(u) - first_node, int(c)))
    return spark.createDataFrame(out or [(0, 0)], "id long, label long").where(
        F.lit(bool(out))
    )


def write_binary_edge_list_partition(
    labels: DataFrame, path: str, first_node: int = 0, width: int = 8
) -> None:
    """``BinaryEdgeListPartitionWriter``: ``(node+first_node, cluster)``
    little-endian pairs in node order."""
    if width not in (4, 8):
        raise ValueError("width must be 4 or 8")
    _guard_fixture_rows(labels, "BinaryEdgeListPartitionWriter")
    import numpy as _np

    rows = labels.select("id", "label").orderBy("id").collect()
    flat: list[int] = []
    for r in rows:
        flat.append(int(r["id"]) + first_node)
        flat.append(_NONE_SENTINEL if r["label"] is None else int(r["label"]))
    arr = _np.array(flat, dtype="<u4" if width == 4 else "<u8")
    arr.tofile(path)


def read_cover(spark: SparkSession, path: str) -> DataFrame:
    """``CoverReader`` (``cpp/io/CoverReader.cpp:10-33``): non-comment
    line i lists the member node ids of cluster i. Returns the
    multi-membership ``(id, label)`` cover frame."""
    rows = []
    c = 0
    with open(path) as f:
        for line in f:
            if line[:1] == "#":
                continue
            for tok in line.split():
                rows.append((int(tok), c))
            c += 1
    return spark.createDataFrame(rows or [(0, 0)], "id long, label long").where(
        F.lit(bool(rows))
    )


def write_cover(cover: DataFrame, path: str) -> None:
    """``CoverWriter`` (``cpp/io/CoverWriter.cpp:9-26``): one line per
    cluster (ascending label), members space-separated."""
    _guard_fixture_rows(cover, "CoverWriter")
    rows = cover.select("label", "id").orderBy("label", "id").collect()
    clusters: dict[int, list[int]] = {}
    for r in rows:
        clusters.setdefault(int(r["label"]), []).append(int(r["id"]))
    hi = max(clusters, default=-1)
    with open(path, "w") as f:
        for c in range(hi + 1):
            f.write(" ".join(str(v) for v in clusters.get(c, [])) + " \n")


def read_edge_list_cover(
    spark: SparkSession, path: str, first_node: int = 1
) -> DataFrame:
    """``EdgeListCoverReader`` (``cpp/io/EdgeListCoverReader.cpp:12-47``):
    each line ``v c1 c2 ...`` lists the clusters of node v (ids offset
    by ``first_node``)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] == "#" or line[:1] == "#":
                continue
            v = int(parts[0]) - first_node
            for c in parts[1:]:
                rows.append((v, int(c)))
    return spark.createDataFrame(rows or [(0, 0)], "id long, label long").where(
        F.lit(bool(rows))
    )


def read_snap_cover(
    spark: SparkSession, path: str, node_map: DataFrame | None = None
) -> DataFrame:
    """``SNAPEdgeListPartitionReader`` (``cpp/io/
    SNAPEdgeListPartitionReader.cpp:21-98``): line k (1-based, comments
    and blanks count, as in the reference's line counter) lists the
    ORIGINAL node ids of community k; ids are remapped through
    ``node_map(orig_id, id)`` when given (unknown ids dropped with the
    reference's warning semantics), taken verbatim otherwise."""
    rows = []
    k = 0
    with open(path) as f:
        for line in f:
            k += 1
            if line[:1] == "#" or not line.strip():
                continue
            for tok in line.split():
                rows.append((int(tok), k))
    cover = spark.createDataFrame(
        rows or [(0, 0)], "orig_id long, label long"
    ).where(F.lit(bool(rows)))
    if node_map is None:
        return cover.select(F.col("orig_id").alias("id"), "label")
    return cover.join(node_map, "orig_id").select("id", "label")


def write_dot_partition(graph: Graph, labels: DataFrame, path: str) -> None:
    """``DotPartitionWriter`` (``cpp/io/DotPartitionWriter.cpp:8-52``):
    undirected dot with one filled node per NON-isolated vertex, hue =
    cluster's rank among the clusters of non-isolated vertices divided
    by their count, then the edge list."""
    _guard_fixture_scale(graph, "DotPartition")
    deg = graph.degrees().where(F.col("out_deg") > 0).select("id")
    lab = deg.join(labels.select("id", "label"), "id")
    rows = lab.orderBy("id").collect()
    unique = sorted({int(r["label"]) for r in rows})
    factor = 1.0 / len(unique) if unique else 0.0
    hue = {c: factor * i for i, c in enumerate(unique)}
    edges = (graph.edges if graph.directed else graph.canonical()).select(
        "src", "dst"
    ).collect()
    with open(path, "w") as f:
        f.write("graph {\n")
        for r in rows:
            c = int(r["label"])
            f.write(
                f'{r["id"]} [style=filled, color="{hue[c]},0.99,0.99", '
                f"label={c}];\n"
            )
        for e in edges:
            f.write(f"{e['src']} -- {e['dst']};\n")
        f.write("}\n")


# ------------------------------------------------------ NetworKit binary (nkb)
# The reference's own on-disk format (``cpp/io/NetworkitBinaryReader.cpp``,
# ``NetworkitBinaryWriter.cpp``, spec ``cpp/io/NetworkitBinaryGraph.md``,
# codec ``include/networkit/io/NetworkitBinaryGraph.hpp:33-139``): real
# interop — a user can hand this engine the .nkb files the reference
# wrote. Fixture-scale driver-side like the GraphTool/Thrill binaries;
# engine-scale persistence stays parquet CSR.

_NKB_MAGIC = b"nkbg002\x00"
_MASK64 = (1 << 64) - 1
# WEIGHT_FORMAT (NetworkitBinaryGraph.hpp:33-39)
_NKB_NONE, _NKB_VARINT, _NKB_SIGNED, _NKB_DOUBLE, _NKB_FLOAT = 0, 1, 2, 3, 4


def _nkb_varint_encode(value: int) -> bytes:
    """nkbg::varIntEncode (NetworkitBinaryGraph.hpp:74-106): the byte
    count is signalled by the position of the lowest set bit of the
    first byte (0 first byte = 8 data bytes)."""
    if value == 0:
        return b"\x01"
    if value >= (1 << 56):
        return b"\x00" + value.to_bytes(8, "little")
    data_bytes = (value.bit_length() - 1) // 7
    first = ((1 << data_bytes) | ((value << (data_bytes + 1)) & 0xFF)) & 0xFF
    rest = value >> (7 - data_bytes)
    out = bytearray([first])
    for _ in range(data_bytes):
        out.append(rest & 0xFF)
        rest >>= 8
    return bytes(out)


def _nkb_varint_decode(buf: bytes, pos: int) -> tuple[int, int]:
    b0 = buf[pos]
    if b0:
        n = (b0 & -b0).bit_length() - 1  # trailing zeros = extra bytes
        decoded = b0 >> (n + 1)
        bits = 7 - n
    else:
        n, decoded, bits = 8, 0, 0
    for i in range(n):
        decoded |= buf[pos + 1 + i] << bits
        bits += 8
    return decoded, pos + n + 1


def _nkb_zigzag_encode(v: int) -> int:
    return ((v << 1) & _MASK64) ^ (_MASK64 if v < 0 else 0)


def _nkb_zigzag_decode(u: int) -> int:
    x = (u >> 1) ^ (_MASK64 if (u & 1) else 0)
    return x - (1 << 64) if x >= (1 << 63) else x


def read_networkit_binary(spark: SparkSession, path: str) -> Graph:
    """``NetworkitBinaryReader`` (``cpp/io/NetworkitBinaryReader.cpp:
    19-230``): header → node flags → chunked varint adjacency (+ weight
    streams). Undirected files store each edge in the adjacency block
    as ``(u, v ≤ u)`` and again in the transpose block as ``(u, v ≥ u)``
    — only the adjacency block is materialized here (the transpose is a
    redundant view); directed files take out-edges + weights."""
    import struct

    with open(path, "rb") as f:
        buf = f.read()
    if buf[:8] != _NKB_MAGIC:
        raise ValueError("Reader expected another magic value")
    (_, features, nodes, chunks, off_base, off_adj, _off_transp,
     off_wght, _off_wght_t) = struct.unpack_from("<9Q", buf, 8)
    directed = bool(features & 0x1)
    wfmt = (features & 0xE) >> 1
    weighted = wfmt != _NKB_NONE
    # base data: node flags (bit0 set = node exists) + firstVertex
    existing = [
        i for i in range(nodes) if buf[off_base + i] & 0x1
    ]
    # adjacency block: (chunks-1) u64 prefix offsets, u64 edge count, data
    adj_data = off_adj + (chunks - 1) * 8 + 8
    pos = adj_data
    wpos = off_wght + (chunks - 1) * 8 if weighted else 0
    edges = []
    for u in range(nodes):
        cnt, pos = _nkb_varint_decode(buf, pos)
        for _ in range(cnt):
            v, pos = _nkb_varint_decode(buf, pos)
            w = DEFAULT_EDGE_WEIGHT
            if wfmt == _NKB_VARINT:
                raw, wpos = _nkb_varint_decode(buf, wpos)
                w = float(raw)
            elif wfmt == _NKB_SIGNED:
                raw, wpos = _nkb_varint_decode(buf, wpos)
                w = float(_nkb_zigzag_decode(raw))
            elif wfmt == _NKB_DOUBLE:
                (w,) = struct.unpack_from("<d", buf, wpos)
                wpos += 8
            elif wfmt == _NKB_FLOAT:
                (w,) = struct.unpack_from("<f", buf, wpos)
                wpos += 4
            edges.append((u, v, w))
    edge_df = spark.createDataFrame(
        edges or [(0, 0, 1.0)], "src long, dst long, weight double"
    ).where(F.lit(bool(edges)))
    verts = spark.createDataFrame([(i,) for i in existing] or [(0,)], "id long")
    if not existing:
        verts = verts.where(F.lit(False))
    return Graph(edge_df, directed=directed, weighted=weighted, vertices=verts)


def write_networkit_binary(
    graph: Graph, path: str, chunks: int = 32, weights: str = "auto"
) -> None:
    """``NetworkitBinaryWriter`` (``cpp/io/NetworkitBinaryWriter.cpp:
    21-345``): auto-detects the tightest weight format exactly like the
    reference (unsigned varint → zigzag varint → float → double);
    ``weights="none"`` forces an unweighted file. Chunk boundaries are
    the reference's ``nodes/chunks`` split."""
    import struct

    _guard_fixture_scale(graph, "NetworkitBinary")
    n = graph.number_of_nodes()
    chunks = min(chunks, n) or 1
    if graph.directed:
        out_rows = graph.edges.select("src", "dst", "weight").collect()
        out_adj: list[list[tuple[int, float]]] = [[] for _ in range(n)]
        in_adj: list[list[tuple[int, float]]] = [[] for _ in range(n)]
        for r in out_rows:
            out_adj[r["src"]].append((int(r["dst"]), float(r["weight"])))
            in_adj[r["dst"]].append((int(r["src"]), float(r["weight"])))
    else:
        out_adj = [[] for _ in range(n)]
        in_adj = [[] for _ in range(n)]
        for r in graph.symmetrized().collect():
            u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
            # adjacency: v <= u; transpose: v >= u (Writer.cpp:186-197)
            if v <= u:
                out_adj[u].append((v, w))
            if v >= u:
                in_adj[u].append((v, w))
    for lst in out_adj:
        lst.sort()
    for lst in in_adj:
        lst.sort()

    all_w = [w for lst in out_adj for _, w in lst]
    if weights == "none" or not graph.weighted:
        wfmt = _NKB_NONE
    else:
        if all(w == int(w) for w in all_w):
            wfmt = _NKB_VARINT if all(w >= 0 for w in all_w) else _NKB_SIGNED
        elif all(struct.unpack("<f", struct.pack("<f", w))[0] == w for w in all_w):
            wfmt = _NKB_FLOAT
        else:
            wfmt = _NKB_DOUBLE

    def enc_weight(w: float) -> bytes:
        if wfmt == _NKB_VARINT:
            return _nkb_varint_encode(int(w))
        if wfmt == _NKB_SIGNED:
            return _nkb_varint_encode(_nkb_zigzag_encode(int(w)))
        if wfmt == _NKB_DOUBLE:
            return struct.pack("<d", w)
        if wfmt == _NKB_FLOAT:
            return struct.pack("<f", w)
        return b""

    first_in_chunk = [0]
    first = 0
    for _ in range(1, chunks):
        first += n // chunks
        first_in_chunk.append(first)
    first_in_chunk.append(n)

    def encode_block(adj: list[list[tuple[int, float]]]) -> tuple[bytes, bytes, list[int], list[int], int]:
        data, wdata = bytearray(), bytearray()
        offsets, woffsets = [], []
        total = 0
        for c in range(chunks):
            for u in range(first_in_chunk[c], first_in_chunk[c + 1]):
                data += _nkb_varint_encode(len(adj[u]))
                for v, w in adj[u]:
                    data += _nkb_varint_encode(v)
                    wdata += enc_weight(w)
                total += len(adj[u])
            offsets.append(len(data))
            woffsets.append(len(wdata))
        return bytes(data), bytes(wdata), offsets, woffsets, total

    adj_b, adj_w, adj_off, adj_woff, m_out = encode_block(out_adj)
    tr_b, tr_w, tr_off, tr_woff, m_in = encode_block(in_adj)

    header_size = 8 + 9 * 8
    off_base = header_size
    off_adj = off_base + n + (chunks - 1) * 8
    off_tr = off_adj + (chunks - 1) * 8 + 8 + len(adj_b)
    if wfmt != _NKB_NONE:
        off_w = off_tr + (chunks - 1) * 8 + 8 + len(tr_b)
        off_wt = off_w + (chunks - 1) * 8 + len(adj_w)
    else:
        off_w = off_wt = 0
    features = (1 if graph.directed else 0) | (wfmt << 1)
    with open(path, "wb") as f:
        f.write(_NKB_MAGIC)
        f.write(struct.pack("<9Q", 0, features, n, chunks, off_base,
                            off_adj, off_tr, off_w, off_wt))
        f.write(bytes([1]) * n)  # all nodes exist (bit0 = exists)
        for c in range(1, chunks):
            f.write(struct.pack("<Q", first_in_chunk[c]))
        for c in range(1, chunks):
            f.write(struct.pack("<Q", adj_off[c - 1]))
        f.write(struct.pack("<Q", m_out))
        f.write(adj_b)
        for c in range(1, chunks):
            f.write(struct.pack("<Q", tr_off[c - 1]))
        f.write(struct.pack("<Q", m_in))
        f.write(tr_b)
        if wfmt != _NKB_NONE:
            for c in range(1, chunks):
                f.write(struct.pack("<Q", adj_woff[c - 1]))
            f.write(adj_w)
            for c in range(1, chunks):
                f.write(struct.pack("<Q", tr_woff[c - 1]))
            f.write(tr_w)


# ---------------------------------------------------------------------------
# DibaP binary graphs + ESRI-ASCII raster point clouds
# ---------------------------------------------------------------------------

_DIBAP_GI = (ord("G") << 8) | ord("I")


def read_dibap(
    spark: SparkSession, path: str, with_coordinates: bool = False
):
    """``DibapGraphReader`` (``cpp/io/DibapGraphReader.cpp:34-183``):
    big-endian (network byte order) binary CSR — ``int16`` magic ``'GI'``,
    ``int32 V``, ``int32 dvw`` (+ ``V*dvw`` int32 vertex weights),
    ``int32[V+1]`` offsets, ``int32[of[V]]`` targets, ``int32 dew``
    (+ ``of[V]*dew`` int32 edge weights), ``int32 dxy``
    (+ ``V*dxy`` float32 coordinates).

    The graph is undirected; each stored half-edge materializes once via
    the reference's ``v <= to[e]`` filter, carrying ``ew[e]`` when
    ``dew > 0`` (the reference indexes edge weights by half-edge position
    regardless of ``dew`` stride — mirrored here). Vertex weights are
    parsed and discarded exactly like the reference ("so far without
    node weights").

    Returns the :class:`Graph`, or ``(Graph, points)`` with a
    ``(id, x, y)`` DataFrame (first two coordinate dims) when
    ``with_coordinates=True`` and ``dxy >= 2`` — else ``(Graph, None)``.
    Driver-side fixture-scale interop, like the other binary readers.
    """
    import struct

    with open(path, "rb") as f:
        raw = f.read()
    pos = 0

    def take(fmt: str, count: int):
        nonlocal pos
        size = struct.calcsize(fmt) * count
        if pos + size > len(raw):
            raise ValueError("bad file structure")
        out = struct.unpack_from(f">{count}{fmt[-1]}", raw, pos)
        pos += size
        return out

    (magic,) = take(">h", 1)
    if magic != _DIBAP_GI:
        raise ValueError("bad file structure (missing GI magic)")
    (n,) = take(">i", 1)
    (dvw,) = take(">i", 1)
    if dvw > 0:
        take(">i", n * dvw)  # vertex weights: parsed, unused (reference FIXME)
    of = take(">i", n + 1)
    num_e2 = of[n]
    to = take(">i", num_e2) if num_e2 else ()
    (dew,) = take(">i", 1)
    ew = take(">i", num_e2 * dew) if dew > 0 else ()
    (dxy,) = take(">i", 1)
    xy = take(">f", n * dxy) if dxy > 0 else ()

    rows = []
    for v in range(n):
        for e in range(of[v], of[v + 1]):
            if v <= to[e]:
                w = float(ew[e]) if dew > 0 else 1.0
                rows.append((v, to[e], w))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    vertices = spark.range(n).select(F.col("id"))
    g = Graph(edges, directed=False, weighted=dew > 0, vertices=vertices)
    if not with_coordinates:
        return g
    if dxy >= 2:
        pts = spark.createDataFrame(
            [(u, float(xy[u * dxy]), float(xy[u * dxy + 1])) for u in range(n)],
            "id long, x double, y double",
        )
        return g, pts
    return g, None


def write_dibap(graph: Graph, path: str, coordinates=None) -> None:
    """DibaP writer (fixture interop twin of :func:`read_dibap`; format
    per ``cpp/io/DibapGraphReader.cpp:34-183``). Emits ``dvw=0``, a full
    symmetric CSR (both half-edges, so the reader's ``v <= to[e]`` filter
    reconstructs each edge exactly once), ``dew=1`` int32 weights for
    weighted graphs, and ``dxy=2`` float32 coordinates when a
    ``(id, x, y)`` DataFrame is passed."""
    import struct

    if graph.directed:
        raise ValueError("DibaP stores undirected graphs")
    _guard_fixture_scale(graph, "dibap")
    n = graph.number_of_nodes()
    adj: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for r in graph.symmetrized().select("src", "dst", "weight").collect():
        adj[r["src"]].append((r["dst"], int(r["weight"])))
    for lst in adj:
        lst.sort()
    of = [0]
    to: list[int] = []
    ew: list[int] = []
    for u in range(n):
        for v, w in adj[u]:
            to.append(v)
            ew.append(w)
        of.append(len(to))
    dew = 1 if graph.weighted else 0
    coords: list[float] = []
    if coordinates is not None:
        by_id = {
            r["id"]: (float(r["x"]), float(r["y"]))
            for r in coordinates.select("id", "x", "y").collect()
        }
        for u in range(n):
            x, y = by_id.get(u, (0.0, 0.0))
            coords.extend((x, y))
    with open(path, "wb") as f:
        f.write(struct.pack(">h", _DIBAP_GI))
        f.write(struct.pack(">2i", n, 0))  # V, dvw=0
        f.write(struct.pack(f">{n + 1}i", *of))
        if to:
            f.write(struct.pack(f">{len(to)}i", *to))
        f.write(struct.pack(">i", dew))
        if dew and ew:
            f.write(struct.pack(f">{len(ew)}i", *ew))
        f.write(struct.pack(">i", 2 if coords else 0))
        if coords:
            f.write(struct.pack(f">{len(coords)}f", *coords))


def read_raster_points(
    spark: SparkSession,
    path: str,
    normalization_factor: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """``RasterReader`` (``cpp/io/RasterReader.cpp:20-101``): ESRI-ASCII
    raster → 2D point cloud. Header: 6 lines, ``ncols``/``nrows`` parsed
    past a 14-char label on lines 1-2, lines 3-6 ignored; then ``nrows``
    rows of ``ncols`` population values. Each cell ``(row, col)`` spawns
    ``round(value * normalization_factor)`` points uniform in the unit
    cell ``[col, col+1] x [1-(row+1), 1-row]`` (the reference's
    ``xdelta = ydelta = 1.0`` layout: row 0 at the top, y decreasing).

    Draws come from a seeded sequential PRNG in the reference's
    row-major per-cell order, so a fixed ``seed`` is reproducible.
    Returns a ``(id, x, y)`` DataFrame — the point-cloud input shape the
    geometric generators (:func:`~networkit_spark.generators.mocnik_basic`
    etc.) consume. Driver-side fixture-scale, like the other file readers.
    """
    import random

    rng = random.Random(seed)
    with open(path, "r") as f:
        lines = f.read().splitlines()
    if len(lines) < 6:
        raise ValueError("raster header is broken")
    ncols = int(float(lines[0][14:].strip().split()[0]))
    nrows = int(float(lines[1][14:].strip().split()[0]))
    rows = []
    idx = 0
    ylb, yub = 0.0, 1.0
    for row in range(nrows):
        vals = lines[6 + row].split()
        if len(vals) < ncols:
            raise ValueError(f"raster row {row} has {len(vals)} < {ncols} values")
        xlb, xub = 0.0, 1.0
        for col in range(ncols):
            num = int(round(float(vals[col]) * normalization_factor))
            for _ in range(num):
                rows.append((idx, rng.uniform(xlb, xub), rng.uniform(ylb, yub)))
                idx += 1
            xlb, xub = xub, xub + 1.0
        yub = ylb
        ylb -= 1.0
    return spark.createDataFrame(rows, "id long, x double, y double")


# ------------------------------------------------------------------ EPS writer
# 24-color cycle of ``PostscriptWriterColors::fromCyclicRotation``
# (``cpp/viz/PostscriptWriter.cpp:21-34``)
_PS_COLORS = [
    (1.0, 0.0, 0.0), (1.0, 0.5, 0.0), (1.0, 1.0, 0.0), (0.5, 1.0, 0.0),
    (0.0, 1.0, 0.0), (0.0, 1.0, 0.5), (0.0, 1.0, 1.0), (0.0, 0.5, 1.0),
    (0.0, 0.0, 1.0), (0.5, 0.0, 1.0), (1.0, 0.0, 1.0), (1.0, 0.0, 0.5),
    (0.6, 0.0, 0.0), (0.6, 0.3, 0.0), (0.6, 0.6, 0.0), (0.3, 0.6, 0.0),
    (0.0, 0.6, 0.0), (0.0, 0.6, 0.3), (0.0, 0.6, 0.6), (0.0, 0.3, 0.6),
    (0.0, 0.0, 0.6), (0.3, 0.0, 0.6), (0.6, 0.0, 0.6), (0.6, 0.0, 0.3),
]

_PS_SIZE = 1020.0  # PostscriptWriter ctor (PostscriptWriter.cpp:37)


def write_postscript(
    graph: Graph,
    coordinates: DataFrame,
    path: str,
    clustering: DataFrame | None = None,
    torus: bool = False,
) -> None:
    """``PostscriptWriter::write`` (``cpp/viz/PostscriptWriter.cpp:
    37-168``): EPS drawing — edges first (cluster color when both ends
    share a cluster, 0.8-grey otherwise), then 2-pt node dots, bounding
    box 1020×1020 with the reference's zero border and per-axis scale;
    ``torus=True`` switches the EPSF-3.0 header and wraps edge vectors
    longer than half the box. ``coordinates`` is ``(id, pos
    array<double>)`` (a ``LayoutAlgorithm.coordinates()`` frame) or
    ``(id, x, y)``; ``clustering=None`` mirrors the reference's
    makeOneClustering default (every node cluster 0 → the first cycle
    color). Driver-side fixture-scale writer (same class as the GML/DOT
    writers); edge order is canonical (src,dst)-sorted — the reference
    iterates storage order, a byte-order-only divergence.
    """
    _guard_fixture_scale(graph, "Postscript")
    if "pos" in coordinates.columns:
        coords = {
            int(r["id"]): (float(r["pos"][0]), float(r["pos"][1]))
            for r in coordinates.select("id", "pos").collect()
        }
    else:
        coords = {
            int(r["id"]): (float(r["x"]), float(r["y"]))
            for r in coordinates.select("id", "x", "y").collect()
        }
    if clustering is None:
        lab = {u: 0 for u in coords}
    else:
        lab = {
            int(r["id"]): int(r["label"])
            for r in clustering.select("id", "label").collect()
        }
    xs = [p[0] for p in coords.values()]
    ys = [p[1] for p in coords.values()]
    mnx, mny, mxx, mxy = min(xs), min(ys), max(xs), max(ys)
    sx = _PS_SIZE / (mxx - mnx) if mxx > mnx else 1.0
    sy = _PS_SIZE / (mxy - mny) if mxy > mny else 1.0

    def adj(p):
        return ((p[0] - mnx) * sx, (p[1] - mny) * sy)

    edges = (
        (graph.edges if graph.directed else graph.canonical())
        .select("src", "dst")
        .orderBy("src", "dst")
        .collect()
    )
    with open(path, "w") as f:
        f.write(
            "%!PS-Adobe-3.0 EPSF-3.0\n" if torus else "%!PS-Adobe-1.0\n"
        )
        f.write("%%Title: NetworKit visualization\n")
        # the reference prints ps_size[0] twice (PostscriptWriter.cpp:58)
        f.write(f"%%BoundingBox: 0.000 0.000 {_PS_SIZE:.3f} {_PS_SIZE:.3f}\n")
        f.write("%%EndComments\n")
        if not torus:
            f.write("%%EndProlog\ngsave\n")
        f.write(
            "/p {newpath} bind def\n/m {moveto} bind def\n"
            "/r {rmoveto} bind def\n/k {rlineto} bind def\n"
            "/l {lineto} bind def\n/n {rlineto} bind def\n"
            "/c {setrgbcolor} bind def\n/s {stroke} bind def\n"
            "/w {setlinewidth} bind def\n/h {show} bind def\n"
            "/a {arc closepath fill} bind def\n"
            "/b {closepath eofill} bind def\n"
        )
        f.write("0.000 0.000 0.000 c\n")
        for e in edges:
            u, v = int(e["src"]), int(e["dst"])
            cu, cv = lab.get(u), lab.get(v)
            if cu is not None and cu == cv:
                r, g, b = _PS_COLORS[cu % len(_PS_COLORS)]
                f.write(f"{r:.3f} {g:.3f} {b:.3f} c ")
            else:
                f.write("0.800 0.800 0.800 c 1.000 w ")
            start, end = adj(coords[u]), adj(coords[v])
            dx, dy = end[0] - start[0], end[1] - start[1]
            if torus:
                if dx > 500.0:
                    dx -= 1000.0
                elif dx < -500.0:
                    dx += 1000.0
                if dy > 500.0:
                    dy -= 1000.0
                elif dy < -500.0:
                    dy += 1000.0
                end = (start[0] + dx, start[1] + dy)
            f.write(
                f"p {start[0]:.3f} {start[1]:.3f} m "
                f"{end[0]:.3f} {end[1]:.3f} l s\n"
            )
        for u in sorted(coords):
            cu = lab.get(u)
            if cu is not None:
                r, g, b = _PS_COLORS[cu % len(_PS_COLORS)]
                f.write(f"{r:.3f} {g:.3f} {b:.3f} c ")
            else:
                f.write("0.000 0.000 0.000 c ")
            p = adj(coords[u])
            f.write(f"p {p[0]:.3f} {p[1]:.3f} 2.000 0.00 360.00 a s\n")
        if not torus:
            f.write("grestore\n")


# --------------------------------------------------------------- MATLAB .mat
# Minimal MAT-File v5 codec (stdlib struct + zlib only), public format per
# MathWorks "MAT-File Format" documentation. Covers exactly what the
# reference's readMat/writeMat path needs (networkit/graphio.pyx:840-885,
# which delegates to scipy.io): one (sparse or dense-double) square
# adjacency matrix stored under a named key, little-endian, optionally
# zlib-compressed (miCOMPRESSED).

_MI_INT8, _MI_UINT8, _MI_INT32, _MI_UINT32 = 1, 2, 5, 6
_MI_DOUBLE, _MI_MATRIX, _MI_COMPRESSED = 9, 14, 15
_MI_SINGLE = 7
_MI_INT_TYPES = (1, 2, 3, 4, 5, 6, 12, 13)  # the types _mat_ints decodes
_MX_DOUBLE_CLASS, _MX_SPARSE_CLASS = 6, 5
_MI_SIZES = {1: 1, 2: 1, 3: 2, 4: 2, 5: 4, 6: 4, 7: 4, 9: 8, 12: 8, 13: 8}


def _mat_subelements(buf: bytes):
    """Iterate (mi_type, payload) sub-elements, handling the 4-byte
    small-element format and 8-byte padding."""
    import struct

    off = 0
    while off < len(buf):
        mtype, nbytes = struct.unpack_from("<II", buf, off)
        if mtype >> 16:  # small element: type/len packed in 4 bytes
            nbytes = mtype >> 16
            mtype &= 0xFFFF
            yield mtype, buf[off + 4 : off + 4 + nbytes]
            off += 8
        else:
            yield mtype, buf[off + 8 : off + 8 + nbytes]
            off += 8 + ((nbytes + 7) & ~7)


def _mat_ints(mtype: int, payload: bytes) -> list[int]:
    import struct

    fmt = {1: "b", 2: "B", 3: "h", 4: "H", 5: "i", 6: "I", 12: "q", 13: "Q"}[
        mtype
    ]
    n = len(payload) // _MI_SIZES[mtype]
    return list(struct.unpack(f"<{n}{fmt}", payload[: n * _MI_SIZES[mtype]]))


def read_mat(spark: SparkSession, path: str, key: str = "G") -> Graph:
    """``graphio.readMat`` (``networkit/graphio.pyx:847-867``): read the
    square adjacency matrix stored under ``key`` and return the
    undirected unweighted graph of its nonzeros (the reference adds
    each nonzero once, ``hasEdge``-deduplicated). Driver-side parse —
    .mat is a fixture-interop format, not a scale path."""
    import struct
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 128:
        raise ValueError("not a MAT v5 file (truncated header)")
    endian = data[126:128]
    if endian == b"MI":
        raise ValueError("big-endian MAT files not supported")
    if endian != b"IM":
        raise ValueError("not a MAT v5 file (bad endian indicator)")
    matrices: dict[str, tuple] = {}
    for mtype, payload in _mat_subelements(data[128:]):
        if mtype == _MI_COMPRESSED:
            payload = zlib.decompress(payload)
            mtype, payload = next(_mat_subelements(payload))
        if mtype != _MI_MATRIX:
            continue
        subs = list(_mat_subelements(payload))
        flags = _mat_ints(_MI_UINT32, subs[0][1])
        mclass = flags[0] & 0xFF
        dims = _mat_ints(subs[1][0], subs[1][1])
        name = subs[2][1].decode("ascii", "replace").rstrip("\x00")
        matrices[name] = (mclass, dims, subs)
    if key not in matrices:
        raise KeyError(
            f"Key {key} not found in the matlab object file"
        )
    mclass, dims, subs = matrices[key]
    if len(dims) != 2 or dims[0] != dims[1]:
        raise ValueError(
            f"this ({dims[0]}x{dims[1]}) matrix is not square"
        )
    n = dims[0]
    pairs: set[tuple[int, int]] = set()
    if mclass == _MX_SPARSE_CLASS:
        ir = _mat_ints(subs[3][0], subs[3][1])
        jc = _mat_ints(subs[4][0], subs[4][1])
        vtype, vpay = subs[5]
        nnz = jc[n]
        # MATLAB stores integral-valued double data in compressed
        # integer element types (miUINT8/miINT16/…): decode those too so
        # an explicitly-stored zero is not misread as an edge. Only a
        # value type we genuinely cannot decode falls back to
        # all-nonzero.
        if vtype == _MI_DOUBLE:
            vals = struct.unpack(f"<{nnz}d", vpay[: 8 * nnz])
        elif vtype == _MI_SINGLE:
            vals = struct.unpack(f"<{nnz}f", vpay[: 4 * nnz])
        elif vtype in _MI_INT_TYPES:
            vals = [float(x) for x in _mat_ints(vtype, vpay)[:nnz]]
        else:
            vals = [1.0] * nnz
        p = 0
        for col in range(n):
            for k in range(jc[col], jc[col + 1]):
                if vals[k] != 0.0:
                    u, v = ir[k], col
                    pairs.add((min(u, v), max(u, v)))
            p += 1
    elif mclass == _MX_DOUBLE_CLASS:
        vtype, vpay = subs[3]
        if vtype != _MI_DOUBLE:
            raise ValueError("dense matrix with non-double storage")
        vals = struct.unpack(f"<{n * n}d", vpay[: 8 * n * n])
        for col in range(n):  # column-major
            for row in range(n):
                if vals[col * n + row] != 0.0:
                    pairs.add((min(row, col), max(row, col)))
    else:
        raise ValueError(f"unsupported matrix class {mclass}")
    edges = spark.createDataFrame(
        [(u, v, DEFAULT_EDGE_WEIGHT) for (u, v) in sorted(pairs)],
        "src long, dst long, weight double",
    )
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, weighted=False, vertices=vertices)


def _mat_element(mtype: int, payload: bytes) -> bytes:
    import struct

    pad = (-len(payload)) % 8
    return struct.pack("<II", mtype, len(payload)) + payload + b"\x00" * pad


def write_mat(graph: Graph, path: str, key: str = "G") -> None:
    """``graphio.writeMat`` (``networkit/graphio.pyx:876-885``): store
    the symmetric sparse adjacency matrix (CSC, weights as doubles)
    under ``key`` in a MAT v5 file readable by scipy.io.loadmat /
    MATLAB."""
    import struct

    if graph.directed:
        raise ValueError("writeMat stores symmetric adjacency; undirected only")
    rows = graph.symmetrized().select("src", "dst", "weight").collect()
    n = graph.number_of_nodes()
    nmax = (
        max((max(r["src"], r["dst"]) for r in rows), default=-1) + 1
    )
    n = max(n, nmax)
    by_col: dict[int, list[tuple[int, float]]] = {}
    for r in rows:
        by_col.setdefault(int(r["dst"]), []).append(
            (int(r["src"]), float(r["weight"]))
        )
    ir: list[int] = []
    pr: list[float] = []
    jc = [0]
    for col in range(n):
        ent = sorted(by_col.get(col, []))
        ir.extend(u for u, _ in ent)
        pr.extend(w for _, w in ent)
        jc.append(len(ir))
    nnz = len(ir)
    # nzmax must never be 0 (MATLAB requires >= 1) and the ir/pr buffers
    # are sized nzmax by strict readers (scipy pads the same way), so
    # pad the arrays out to nzmax — jc[n] == nnz tells readers how many
    # entries are live, the pad is dead capacity.
    nzmax = max(nnz, 1)
    ir_p = ir + [0] * (nzmax - nnz)
    pr_p = pr + [0.0] * (nzmax - nnz)
    body = b"".join(
        [
            # array flags: class + flags word, nzmax
            _mat_element(
                _MI_UINT32, struct.pack("<II", _MX_SPARSE_CLASS, nzmax)
            ),
            _mat_element(_MI_INT32, struct.pack("<ii", n, n)),
            _mat_element(_MI_INT8, key.encode("ascii")),
            _mat_element(_MI_INT32, struct.pack(f"<{nzmax}i", *ir_p)),
            _mat_element(_MI_INT32, struct.pack(f"<{n + 1}i", *jc)),
            _mat_element(_MI_DOUBLE, struct.pack(f"<{nzmax}d", *pr_p)),
        ]
    )
    header = (
        b"MATLAB 5.0 MAT-file, written by networkit_spark".ljust(116)
        + b"\x00" * 8
        + struct.pack("<H", 0x0100)
        + b"IM"
    )
    with open(path, "wb") as f:
        f.write(header)
        f.write(_mat_element(_MI_MATRIX, body))
