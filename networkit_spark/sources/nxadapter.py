"""NetworkX compatibility — the reference's ``networkit/nxadapter.py``
(``nx2nk``/``nk2nx``, import-gated on networkx exactly like the
reference's ``have_nx`` guard).

Fixture-interop only: both directions materialize the graph driver-side
(the reference's loops are the same class). Engine-scale graphs stay in
parquet/DataFrames.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from networkit_spark.graph import Graph
from networkit_spark.sources.io import _guard_fixture_scale

try:  # the reference's have_nx pattern (nxadapter.py:10-16)
    import networkx as _nx

    have_nx = True
except ImportError:  # pragma: no cover - environment-dependent
    _nx = None
    have_nx = False


class MissingDependencyError(ImportError):
    """``networkit.support.MissingDependencyError`` twin."""

    def __init__(self, dep: str) -> None:
        super().__init__(
            f"optional dependency {dep!r} is required for this function"
        )


def nx2spark(spark: SparkSession, nx_graph, weight_attr: str | None = None) -> Graph:
    """``nxadapter.nx2nk`` (``networkit/nxadapter.py:20-48``): map the
    networkx node ids to consecutive dense ids (iteration order, like
    the reference's ``zip(nodes(), range(n))``) and build a Graph;
    ``weight_attr`` selects the edge attribute used as the weight."""
    if not have_nx:
        raise MissingDependencyError("networkx")
    idmap = {nid: u for u, nid in enumerate(nx_graph.nodes())}
    directed = nx_graph.is_directed()
    rows = []
    for u_, v_ in nx_graph.edges():
        w = (
            float(nx_graph[u_][v_][weight_attr])
            if weight_attr is not None
            else 1.0
        )
        rows.append((idmap[u_], idmap[v_], w))
    edges = spark.createDataFrame(
        rows, "src long, dst long, weight double"
    )
    vertices = spark.range(len(idmap)).select(F.col("id").cast("long"))
    return Graph(
        edges,
        directed=directed,
        weighted=weight_attr is not None,
        vertices=vertices,
    )


def spark2nx(graph: Graph):
    """``nxadapter.nk2nx`` (``networkit/nxadapter.py:51-76``): emit a
    ``networkx.Graph``/``DiGraph`` with the same node ids; weighted
    graphs carry the ``weight`` edge attribute."""
    if not have_nx:
        raise MissingDependencyError("networkx")
    _guard_fixture_scale(graph, "networkx")
    g = _nx.DiGraph() if graph.directed else _nx.Graph()
    for r in graph.vertices.collect():
        g.add_node(int(r["id"]))
    edge_view = graph.edges if graph.directed else graph.canonical()
    for r in edge_view.collect():
        if graph.weighted:
            g.add_edge(int(r["src"]), int(r["dst"]), weight=float(r["weight"]))
        else:
            g.add_edge(int(r["src"]), int(r["dst"]))
    return g
