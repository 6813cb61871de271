"""GraphTools — the reference's free-function utility surface
(``cpp/graph/GraphTools.cpp``, ``include/networkit/graph/GraphTools.hpp``).

Scalars (``maxDegree`` family, ``size``, ``density``, ``volume`` /
``inVolume``) are single hash aggregations. Continuous-id compaction
(``getContinuousNodeIds`` / ``getCompactedGraph`` / ``restoreGraph``,
``GraphTools.cpp:266-330``) is the dictionary-join pattern already used
by the link-graph ingest: an order-preserving dense rank materialized as
an ``(id, new_id)`` mapping frame, applied / inverted with two hash
joins — no driver-side state, so it compacts a 10^12-vertex dictionary
the same way it compacts a fixture.

Random sampling (``randomNode/randomEdge(s)/randomNeighbor``,
``GraphTools.cpp:60-188``): the reference draws from a shared mutable
URNG; a distributed engine cannot (and should not) reproduce that
sequential stream, so these draw from the SAME distributions via seeded
hash ordering — uniform over nodes, uniform over edges
(``randomEdge(uniform=true)``), degree-proportional half-edge draws
(``randomEdge(uniform=false)``), and with-replacement uniform edge
multisets (``randomEdges`` — the reference's u ∝ degree then uniform
neighbor with u>v rejection is exactly a uniform draw over canonical
edges). Deterministic per seed; documented divergence: the draw
*values* differ from the C++ RNG stream, the distributions match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph

__all__ = [
    "size",
    "density",
    "volume",
    "in_volume",
    "max_degree",
    "max_in_degree",
    "max_weighted_degree",
    "max_weighted_in_degree",
    "random_node",
    "random_nodes",
    "random_neighbor",
    "random_edge",
    "random_edges",
    "get_continuous_node_ids",
    "invert_continuous_node_ids",
    "get_compacted_graph",
    "restore_graph",
    "to_weighted",
]


def size(graph: Graph) -> tuple[int, int]:
    """``GraphTools::size`` (``GraphTools.cpp:190-192``): (n, m)."""
    return graph.number_of_nodes(), graph.number_of_edges()


def density(graph: Graph) -> float:
    """``GraphTools::density`` (``GraphTools.cpp:194-201``):
    ``(m − selfloops)·(2 if undirected) / (n·(n−1))``; 0 for n ≤ 1."""
    n = graph.number_of_nodes()
    if n <= 1:
        return 0.0
    m = graph.number_of_edges() - graph.number_of_self_loops()
    if not graph.directed:
        m *= 2
    return float(m) / (float(n) * float(n - 1))


def volume(graph: Graph) -> float:
    """``GraphTools::volume`` (``GraphTools.cpp:203-210``): total edge
    weight, doubled for undirected graphs."""
    total = graph.edges.agg(F.sum("weight")).collect()[0][0] or 0.0
    return float(total) * (1.0 if graph.directed else 2.0)


def in_volume(graph: Graph) -> float:
    """``GraphTools::inVolume``: sum of weighted in-degrees — equals
    total edge weight for directed graphs, ``volume`` for undirected."""
    if graph.directed:
        total = graph.edges.agg(F.sum("weight")).collect()[0][0] or 0.0
        return float(total)
    return volume(graph)


def _deg_scalar(graph: Graph, col: str) -> float:
    row = graph.degrees().agg(F.max(col)).collect()[0][0]
    return row if row is not None else 0


def max_degree(graph: Graph) -> int:
    """``GraphTools::maxDegree`` (``GraphTools.cpp:44-46``)."""
    return int(_deg_scalar(graph, "out_deg"))


def max_in_degree(graph: Graph) -> int:
    """``GraphTools::maxInDegree`` (``GraphTools.cpp:48-50``)."""
    return int(_deg_scalar(graph, "in_deg"))


def max_weighted_degree(graph: Graph) -> float:
    """``GraphTools::maxWeightedDegree`` (``GraphTools.cpp:52-54``)."""
    return float(_deg_scalar(graph, "w_out_deg"))


def max_weighted_in_degree(graph: Graph) -> float:
    """``GraphTools::maxWeightedInDegree`` (``GraphTools.cpp:56-58``)."""
    return float(_deg_scalar(graph, "w_in_deg"))


def _hash_order(*cols) -> F.Column:
    return F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))


def random_nodes(graph: Graph, k: int, seed: int = 42) -> DataFrame:
    """k distinct uniform nodes, seeded (distribution twin of repeated
    ``GraphTools::randomNode``, ``GraphTools.cpp:60-75``). Returns
    ``(id)`` — a TakeOrdered over the hash key, no full sort."""
    return (
        graph.vertices.withColumn("_s", F.lit(int(seed)).cast("string"))
        .orderBy(_hash_order("_s", "id"))
        .limit(int(k))
        .select("id")
    )


def random_node(graph: Graph, seed: int = 42) -> int | None:
    rows = random_nodes(graph, 1, seed).collect()
    return int(rows[0]["id"]) if rows else None


def random_neighbor(graph: Graph, u: int, seed: int = 42) -> int | None:
    """Uniform out-neighbor of ``u`` (``GraphTools.cpp:183-188``);
    ``None`` when ``u`` has no neighbors (the reference returns none)."""
    base = graph.edges if graph.directed else graph.symmetrized()
    rows = (
        base.where(F.col("src") == int(u))
        .withColumn("_s", F.lit(int(seed)).cast("string"))
        .orderBy(_hash_order("_s", "src", "dst"))
        .limit(1)
        .collect()
    )
    return int(rows[0]["dst"]) if rows else None


def random_edge(graph: Graph, uniform: bool = True, seed: int = 42) -> tuple[int, int]:
    """One seeded edge draw (``GraphTools::randomEdge``,
    ``GraphTools.cpp:77-139``). ``uniform=True`` draws uniformly over
    edges; ``uniform=False`` reproduces the reference's cheap biased
    variant (u uniform over nodes with degree>0, then uniform
    neighbor)."""
    s = F.lit(int(seed)).cast("string")
    if uniform:
        rows = (
            graph.edges.orderBy(
                F.md5(F.concat_ws("\x1f", s, F.col("src"), F.col("dst")))
            )
            .limit(1)
            .collect()
        )
        if not rows:
            raise ValueError("the graph has no edges")
        return int(rows[0]["src"]), int(rows[0]["dst"])
    base = graph.edges if graph.directed else graph.symmetrized()
    u_rows = (
        base.select("src")
        .distinct()
        .orderBy(F.md5(F.concat_ws("\x1f", s, F.col("src"))))
        .limit(1)
        .collect()
    )
    if not u_rows:
        raise ValueError("the graph has no edges")
    u = int(u_rows[0]["src"])
    return u, random_neighbor(graph, u, seed=seed)


def random_edges(graph: Graph, k: int, seed: int = 42) -> DataFrame:
    """k uniform with-replacement draws over canonical edges
    (``GraphTools::randomEdges``, ``GraphTools.cpp:141-181`` — its
    degree-proportional source + uniform neighbor + u>v rejection is
    exactly uniform over stored edges). Returns ``(draw, src, dst)``,
    one row per draw index 0..k−1.

    Plan: one pass over the edge table computing k seeded hash keys as
    an array column, posexplode, ``min_by`` per draw — O(k·m) expression
    evaluations, ONE shuffle of k rows after map-side partial min. Keep
    k small (sampling API, not a scan)."""
    k = int(k)
    if k <= 0:
        return graph.edges.sparkSession.createDataFrame(
            [], "draw int, src long, dst long"
        )
    if graph.edges.limit(1).count() == 0:
        raise ValueError("Graph has no edges to sample from.")
    s = F.lit(int(seed)).cast("string")
    keys = F.array(
        *[
            F.md5(F.concat_ws("\x1f", F.lit(str(i)), s, F.col("src"), F.col("dst")))
            for i in range(k)
        ]
    )
    exploded = graph.edges.select(
        "src", "dst", F.posexplode(keys).alias("draw", "key")
    )
    return (
        exploded.groupBy("draw")
        .agg(
            F.min_by(F.struct("src", "dst"), "key").alias("e"),
        )
        .select("draw", F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
    )


def get_continuous_node_ids(graph: Graph) -> DataFrame:
    """Order-preserving dense remap (``GraphTools::getContinuousNodeIds``,
    ``GraphTools.cpp:266-277``): ``(id, new_id)`` with new ids 0..n−1 in
    ascending old-id order. Zipped dense rank — no 1-partition window."""
    from networkit_spark.graph import zip_dense_rank

    return zip_dense_rank(
        graph.vertices.select("id"), "id", out_col="new_id"
    ).select("id", "new_id")


def invert_continuous_node_ids(mapping: DataFrame) -> DataFrame:
    """``GraphTools::invertContinuousNodeIds`` — the (new_id → old id)
    view of the mapping (the reference appends an n-sentinel for its
    vector representation; a relation needs no sentinel)."""
    return mapping.select(F.col("new_id").alias("id"), F.col("id").alias("old_id"))


def get_compacted_graph(graph: Graph, mapping: DataFrame | None = None) -> Graph:
    """``GraphTools::getCompactedGraph`` / ``getRemappedGraph``
    (``GraphTools.cpp:279-305``): relabel endpoints through the mapping
    with two hash joins; vertex set = mapped ids."""
    m = mapping if mapping is not None else get_continuous_node_ids(graph)
    msrc = m.select(F.col("id").alias("src"), F.col("new_id").alias("nsrc"))
    mdst = m.select(F.col("id").alias("dst"), F.col("new_id").alias("ndst"))
    edges = (
        graph.edges.join(msrc, "src")
        .join(mdst, "dst")
        .select(
            F.col("nsrc").alias("src"), F.col("ndst").alias("dst"), "weight"
        )
    )
    verts = m.select(F.col("new_id").alias("id"))
    return Graph(
        edges, directed=graph.directed, weighted=graph.weighted, vertices=verts
    )


def restore_graph(mapping: DataFrame, compact: Graph) -> Graph:
    """``GraphTools::restoreGraph`` (``GraphTools.cpp:307-330``): undo a
    continuous-id compaction — map new ids back to the original ids."""
    inv = invert_continuous_node_ids(mapping)
    isrc = inv.select(F.col("id").alias("src"), F.col("old_id").alias("osrc"))
    idst = inv.select(F.col("id").alias("dst"), F.col("old_id").alias("odst"))
    edges = (
        compact.edges.join(isrc, "src")
        .join(idst, "dst")
        .select(F.col("osrc").alias("src"), F.col("odst").alias("dst"), "weight")
    )
    verts = inv.select(F.col("old_id").alias("id"))
    return Graph(
        edges, directed=compact.directed, weighted=compact.weighted, vertices=verts
    )


def to_weighted(graph: Graph) -> Graph:
    """``GraphTools::toWeighted``: same edges, weighted flag set (weights
    already default to 1.0 in the edge frame, like the reference's
    ``defaultEdgeWeight`` fill)."""
    return Graph(
        graph.edges,
        directed=graph.directed,
        weighted=True,
        vertices=graph.vertices,
    )


def bfs_sample(graph: Graph, source: int | None = None, k: int = 50,
               seed: int = 42) -> Graph:
    """``sampling.bfsSample`` (``networkit/sampling.py:5-27``): the
    node-induced subgraph of the source plus the first k nodes a BFS
    discovers. The reference truncates mid-level in queue order; this
    truncates by the deterministic ``(hop, id)`` order — same ball,
    reproducible boundary."""
    from networkit_spark.operators.distance import BFS

    if source is None:
        source = random_node(graph, seed=seed)
    if source is None:
        return graph
    bfs = BFS(graph, int(source)).run()
    nodes = (
        bfs.distances().orderBy("dist", "id").limit(int(k) + 1).select("id")
    )
    return graph.subgraph_from_nodes(nodes)
