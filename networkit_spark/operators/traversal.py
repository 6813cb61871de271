"""Traversal — the reference's ``Traversal::BFSfrom/BFSEdgesFrom/
DFSfrom/DFSEdgesFrom`` callback iterators (``include/networkit/graph/
BFS.hpp``, ``DFS.hpp``, exposed via ``networkit/traversal.pyx``).

The reference hands each visited node/edge to a Python callback in
traversal order. A distributed engine returns the same information as
an ORDERED FRAME instead: ``(order, id, dist)`` for BFS and
``(order, id)`` for DFS, plus tree-edge variants.

- BFS: the batched frontier machinery (one gather join per level);
  within a level the reference's queue order is a storage artifact, so
  order is pinned to the deterministic ``(dist, id)`` ranking
  (documented divergence), and a discovered node's tree parent is its
  smallest previous-level neighbor.
- DFS: a depth-first stack is one sequential token — inherently
  unparallelizable — so it runs DRIVER-SIDE at fixture scale behind the
  same edge ceiling as the other sequential ports, a literal port of
  the ``DFS.hpp:26-44`` stack loop with sorted adjacency (the
  reference's neighbor order is storage order; sorted is the pinned,
  reproducible choice — last-sorted neighbor pops first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.distance import BFS

_MAX_DRIVER_EDGES = 2_000_000


def bfs_from(graph: Graph, source: int) -> DataFrame:
    """``Traversal::BFSfrom`` — ``(order, id, dist)`` over reached
    nodes, order = rank by ``(dist, id)``."""
    from networkit_spark.graph import zip_dense_rank

    d = BFS(graph, int(source)).run().distances()
    # rank by (dist, id) without a 1-partition window: dense-rank the
    # composite key (dist and id are both bounded longs)
    keyed = d.select(
        "id", "dist", (F.col("dist") * F.lit(1 << 40) + F.col("id")).alias("k")
    )
    ranks = zip_dense_rank(keyed, "k", "order")
    return keyed.join(ranks, "k").select("order", "id", "dist")


def bfs_edges_from(graph: Graph, source: int) -> DataFrame:
    """``Traversal::BFSEdgesFrom`` — the BFS tree edges
    ``(u, v, dist_v)``; each discovered node's parent is its smallest
    neighbor on the previous level (the reference takes the queue-order
    first; documented divergence)."""
    d = BFS(graph, int(source)).run().distances()
    sym = (graph.edges if graph.directed else graph.symmetrized()).select(
        "src", "dst"
    )
    du = d.select(F.col("id").alias("src"), F.col("dist").alias("d_src"))
    dv = d.select(F.col("id").alias("dst"), F.col("dist").alias("d_dst"))
    return (
        sym.join(du, "src")
        .join(dv, "dst")
        .where(F.col("d_dst") == F.col("d_src") + 1)
        .groupBy(F.col("dst").alias("v"), F.col("d_dst").alias("dist_v"))
        .agg(F.min("src").alias("u"))
        .select("u", "v", "dist_v")
    )


def _driver_adjacency(graph: Graph) -> dict[int, list[int]]:
    m = graph.number_of_edges()
    if m > _MAX_DRIVER_EDGES:
        raise ValueError(
            f"DFS is a sequential traversal ({m} edges > "
            f"{_MAX_DRIVER_EDGES}); it runs driver-side at fixture scale"
        )
    base = graph.edges if graph.directed else graph.symmetrized()
    adj: dict[int, list[int]] = {}
    for r in base.select("src", "dst").collect():
        adj.setdefault(int(r["src"]), []).append(int(r["dst"]))
    for lst in adj.values():
        lst.sort()
    return adj


def dfs_from(graph: Graph, source: int) -> DataFrame:
    """``Traversal::DFSfrom`` (``DFS.hpp:26-44``) — ``(order, id)`` in
    stack pop order."""
    adj = _driver_adjacency(graph)
    marked = {int(source)}
    stack = [int(source)]
    out = []
    while stack:
        u = stack.pop()
        out.append((len(out), u))
        for v in adj.get(u, []):
            if v not in marked:
                stack.append(v)
                marked.add(v)
    spark = graph.edges.sparkSession
    return spark.createDataFrame(out, "order long, id long")


def dfs_edges_from(graph: Graph, source: int) -> DataFrame:
    """``Traversal::DFSEdgesFrom`` — ``(order, u, v)`` tree edges in
    discovery order (marked at push time, like the reference)."""
    adj = _driver_adjacency(graph)
    marked = {int(source)}
    stack = [int(source)]
    out = []
    while stack:
        u = stack.pop()
        for v in adj.get(u, []):
            if v not in marked:
                out.append((len(out), u, v))
                stack.append(v)
                marked.add(v)
    spark = graph.edges.sparkSession
    return spark.createDataFrame(out, "order long, u long, v long")
