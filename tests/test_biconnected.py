"""BiconnectedComponents (Tarjan–Vishkin over BFS forest) vs a textbook
sequential Tarjan lowpoint DFS computed in-test.

Block equality is compared as a partition of the EDGE set (frozensets
of edges), since block ids are representation-dependent in both
implementations (the reference numbers blocks by DFS completion order,
BiconnectedComponents.cpp:87-104).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.operators.biconnected import BiconnectedComponents


def _tarjan_blocks(n_nodes, edges):
    """Textbook iterative Tarjan biconnectivity (Tarjan 1972): returns
    the set of blocks, each a frozenset of canonical (u, v) edges."""
    adj = {u: [] for u in n_nodes}
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    disc, low = {}, {}
    stack_edges = []
    blocks = []
    timer = [0]
    for s in sorted(n_nodes):
        if s in disc:
            continue
        # iterative DFS
        call = [(s, None, iter(adj[s]))]
        disc[s] = low[s] = timer[0]
        timer[0] += 1
        while call:
            u, parent, it = call[-1]
            advanced = False
            for v in it:
                if v not in disc:
                    stack_edges.append((u, v))
                    disc[v] = low[v] = timer[0]
                    timer[0] += 1
                    call.append((v, u, iter(adj[v])))
                    advanced = True
                    break
                elif v != parent and disc[v] < disc[u]:
                    stack_edges.append((u, v))
                    low[u] = min(low[u], disc[v])
            if not advanced:
                call.pop()
                if call:
                    p = call[-1][0]
                    low[p] = min(low[p], low[u])
                    if low[u] >= disc[p]:
                        block = set()
                        while stack_edges:
                            a, b = stack_edges[-1]
                            if disc[a] >= disc[u] or (a == p and b == u):
                                stack_edges.pop()
                                block.add((min(a, b), max(a, b)))
                                if a == p and b == u:
                                    break
                            else:
                                break
                        if block:
                            blocks.append(frozenset(block))
    return set(blocks)


def _spark_blocks(spark, edges, extra_nodes=()):
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    g = Graph(df, directed=False, weighted=True)
    bc = BiconnectedComponents(g).run()
    rows = bc.edge_components().collect()
    by_block = {}
    for r in rows:
        by_block.setdefault(r["block"], set()).add((r["u"], r["v"]))
    return set(frozenset(s) for s in by_block.values()), bc


def _nodes(edges):
    return sorted({x for e in edges for x in e})


CASES = {
    "bridge_path": [(0, 1), (1, 2), (2, 3)],
    "triangle": [(0, 1), (1, 2), (0, 2)],
    "cycle4": [(0, 1), (1, 2), (2, 3), (3, 0)],
    "two_triangles_cut_vertex": [
        (0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)
    ],
    "theta": [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)],
    "barbell": [
        (0, 1), (1, 2), (0, 2),        # clique A
        (2, 3),                        # bridge
        (3, 4), (4, 5), (3, 5),        # clique B
    ],
    "two_components": [(0, 1), (1, 2), (0, 2), (10, 11)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_blocks_match_tarjan(spark, name):
    edges = CASES[name]
    expected = _tarjan_blocks(_nodes(edges), edges)
    got, bc = _spark_blocks(spark, edges)
    assert got == expected
    assert bc.number_of_components() == len(expected)


def test_blocks_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 24
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(40)
                )
                if a != b
            }
        )
        expected = _tarjan_blocks(_nodes(edges), edges)
        got, _ = _spark_blocks(spark, edges)
        assert got == expected, f"trial {trial}"


def test_component_sizes_and_node_membership(spark):
    edges = CASES["two_triangles_cut_vertex"]
    _, bc = _spark_blocks(spark, edges)
    sizes = sorted(r["size"] for r in bc.get_component_sizes().collect())
    assert sizes == [3, 3]
    # the cut vertex (2) belongs to both blocks
    memb = bc.components_of_node().groupBy("id").count().collect()
    counts = {r["id"]: r["count"] for r in memb}
    assert counts[2] == 2
    assert all(v == 1 for k, v in counts.items() if k != 2)


def test_directed_raises(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0)], "src long, dst long, weight double"
    )
    with pytest.raises(ValueError):
        BiconnectedComponents(Graph(df, directed=True, weighted=True))
