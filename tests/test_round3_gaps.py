"""Round-3 long-tail parity: exact EffectiveDiameter, AStar /
AStarGeneral, ApproxSpanningEdge, KruskalMSF alias,
ChibaNishizekiTriangleEdgeScore alias.

Reference: ``cpp/distance/EffectiveDiameter.cpp``,
``distance/AStar.hpp`` / ``AStarGeneral.hpp``,
``cpp/centrality/ApproxSpanningEdge.cpp``, ``graph/KruskalMSF.hpp``,
``cpp/edgescores/ChibaNishizekiTriangleEdgeScore.cpp``.
"""

import math
import random

import pytest

from networkit_spark import Graph
from networkit_spark.operators.algebraic import (
    ApproxSpanningEdge,
    SpanningEdgeCentrality,
)
from networkit_spark.operators.distance import Dijkstra, EffectiveDiameter
from networkit_spark.operators.distance_extras import (
    AStar,
    AStarGeneral,
    BidirectionalDijkstra,
)
from networkit_spark.operators.edgescore_transforms import (
    chiba_nishizeki_triangle_edge_scores,
)
from networkit_spark.operators.spanning import KruskalMSF
from networkit_spark.operators.triangles import TriangleEdgeScore


# ------------------------------------------------- exact EffectiveDiameter
def _eff_diam_reference(adj: dict, ratio: float) -> float:
    """Literal port of the reference bitset loop for goldens."""
    nodes = sorted(adj)
    n = len(nodes)
    threshold = math.ceil(ratio * n)
    prev = {v: {v} for v in nodes}
    active = set(nodes)
    total, h = 0, 0
    while active:
        h += 1
        cur = {}
        for v in nodes:
            s = set(prev[v])
            for u in adj[v]:
                s |= prev[u]
            cur[v] = s
        done = {v for v in active if len(cur[v]) >= threshold}
        total += h * len(done)
        active -= done
        prev = cur
    return total / n


def test_effective_diameter_path_graph(spark):
    # path 0-1-2-3-4, ratio .9 → threshold 5: balls must cover all
    edges = [(i, i + 1) for i in range(4)]
    adj = {i: set() for i in range(5)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    g = Graph.from_edge_list(spark, edges, directed=False)
    got = EffectiveDiameter(g, ratio=0.9).run().get_effective_diameter()
    assert got == pytest.approx(_eff_diam_reference(adj, 0.9))


def test_effective_diameter_random_golden(spark):
    rng = random.Random(7)
    n = 12
    edges = {(i, (i + 1) % n) for i in range(n)}  # ring keeps it connected
    while len(edges) < 24:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    adj = {i: set() for i in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    g = Graph.from_edge_list(spark, sorted(edges), directed=False)
    for ratio in (0.25, 0.5, 0.9, 1.0):
        got = EffectiveDiameter(g, ratio=ratio).run().get_effective_diameter()
        assert got == pytest.approx(_eff_diam_reference(adj, ratio)), ratio


def test_effective_diameter_low_ratio_contributes_one(spark):
    # threshold 1: every node is satisfied at its FIRST check (h=1),
    # mirroring the reference loop's minimum contribution of 1
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    got = EffectiveDiameter(g, ratio=0.01).run().get_effective_diameter()
    assert got == pytest.approx(1.0)


def test_effective_diameter_guards(spark):
    with pytest.raises(ValueError):
        EffectiveDiameter(Graph.from_edge_list(spark, [(0, 1)], directed=True))
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(ValueError):
        EffectiveDiameter(g).run()


# --------------------------------------------------------------- A*
WEDGES = [
    (0, 1, 1.0), (1, 2, 1.0), (2, 5, 1.0),
    (0, 3, 2.0), (3, 5, 1.5), (0, 5, 9.0), (4, 4, 1.0),
]


def test_astar_zero_heuristic_equals_dijkstra(spark):
    g = Graph.from_edge_list(spark, WEDGES, directed=False, weighted=True)
    heu = [0.0] * 6
    a = AStar(g, heu, 0, 5).run()
    assert a.get_distance() == pytest.approx(3.0)
    assert a.get_path() == [0, 1, 2, 5]


def test_astar_admissible_heuristic_exact_and_random(spark):
    rng = random.Random(13)
    n = 14
    edges = []
    for i in range(n - 1):
        edges.append((i, i + 1, 1.0 + rng.random()))
    for _ in range(12):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.append((min(u, v), max(u, v), 0.5 + 3 * rng.random()))
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    target = n - 1
    # exact distances-to-target = the tightest admissible heuristic
    exact = {
        r["id"]: r["dist"]
        for r in Dijkstra(g, target).run().distances().collect()
    }
    heu = [exact.get(i, 0.0) for i in range(n)]
    for source in (0, 3, 7):
        want = BidirectionalDijkstra(g, source, target).run().get_distance()
        a = AStar(g, heu, source, target).run()
        assert a.get_distance() == pytest.approx(want), source
        path = a.get_path()
        assert path[0] == source and path[-1] == target
        # the returned path's weight equals the distance
        wmap = {}
        for u, v, w in edges:
            key = (min(u, v), max(u, v))
            wmap[key] = min(w, wmap.get(key, float("inf")))
        got = sum(
            wmap[(min(a_, b_), max(a_, b_))]
            for a_, b_ in zip(path, path[1:])
        )
        assert got == pytest.approx(a.get_distance())


def test_astar_unreachable_and_same_node(spark):
    g = Graph.from_edge_list(spark, [(0, 1, 1.0), (2, 3, 1.0)],
                             directed=False, weighted=True)
    a = AStar(g, {0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0}, 0, 3).run()
    assert a.get_distance() == float("inf")
    assert a.get_path() == []
    same = AStar(g, [0.0, 0.0, 0.0, 0.0], 2, 2).run()
    assert same.get_distance() == 0.0
    assert same.get_path() == [2]


def test_astar_heuristic_coverage_check(spark):
    g = Graph.from_edge_list(spark, [(0, 1, 1.0), (1, 2, 1.0)],
                             directed=False, weighted=True)
    with pytest.raises(ValueError):
        AStar(g, [0.0, 0.0], 0, 2).run()  # node 2 uncovered


def test_astar_general_callable(spark):
    g = Graph.from_edge_list(spark, WEDGES, directed=False, weighted=True)
    a = AStarGeneral(g, lambda u: 0.0, 0, 5).run()
    assert a.get_distance() == pytest.approx(3.0)
    assert a.get_path() == [0, 1, 2, 5]


def test_astar_general_vectorized(spark):
    import numpy as np

    g = Graph.from_edge_list(spark, WEDGES, directed=False, weighted=True)
    a = AStarGeneral(
        g, lambda ids: np.zeros(len(ids)), 0, 5, vectorized=True
    ).run()
    assert a.get_distance() == pytest.approx(3.0)
    assert a.get_path() == [0, 1, 2, 5]


def test_astar_directed(spark):
    g = Graph.from_edge_list(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)],
        directed=True, weighted=True,
    )
    a = AStar(g, [0.0, 0.0, 0.0], 2, 1).run()
    assert a.get_distance() == pytest.approx(2.0)
    assert a.get_path() == [2, 0, 1]


# --------------------------------------------------- ApproxSpanningEdge
def test_approx_spanning_edge_bridges_exact(spark):
    # two triangles joined by a bridge: bridge score is EXACTLY 1
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    ase = ApproxSpanningEdge(g, eps=0.35, seed=1).run()
    got = {(r["u"], r["v"]): r["score"] for r in ase.scores().collect()}
    assert set(got) == {(min(u, v), max(u, v)) for u, v in edges}
    assert got[(2, 3)] == 1.0
    # triangle edges: Pr[e ∈ UST] = 2/3 exactly
    for e in ((0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)):
        assert got[e] == pytest.approx(2 / 3, abs=0.35)


def test_approx_spanning_edge_eps_contract_vs_exact(spark):
    # wheel-ish graph: compare against the exact effective-resistance
    # scores (Pr[e ∈ UST] = effective resistance on unweighted graphs)
    edges = [(0, i) for i in range(1, 6)] + [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 1)
    ]
    g = Graph.from_edge_list(spark, edges, directed=False)
    exact = {
        (r["u"], r["v"]): r["score"]
        for r in SpanningEdgeCentrality(g).run().edge_scores().collect()
    }
    eps = 0.25
    got = {
        (r["u"], r["v"]): r["score"]
        for r in ApproxSpanningEdge(g, eps=eps, seed=3).run()
        .scores().collect()
    }
    assert set(got) == set(exact)
    for e, s in got.items():
        assert abs(s - exact[e]) <= eps, (e, s, exact[e])


def test_approx_spanning_edge_deterministic_and_guards(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    a = {(r["u"], r["v"]): r["score"]
         for r in ApproxSpanningEdge(g, eps=0.4, seed=9).run()
         .scores().collect()}
    b = {(r["u"], r["v"]): r["score"]
         for r in ApproxSpanningEdge(g, eps=0.4, seed=9).run()
         .scores().collect()}
    assert a == b
    with pytest.raises(ValueError):
        ApproxSpanningEdge(
            Graph.from_edge_list(spark, [(0, 1)], directed=True)
        )
    empty = Graph.from_edge_list(spark, [], directed=False, num_nodes=2)
    with pytest.raises(ValueError):
        ApproxSpanningEdge(empty).run()


# ------------------------------------------------------------ KruskalMSF
def test_kruskal_msf_weight_matches_kruskal(spark):
    rng = random.Random(5)
    edges = []
    for i in range(11):
        edges.append((i, i + 1, rng.random() * 5))
    for _ in range(10):
        u, v = rng.randrange(12), rng.randrange(12)
        if u != v:
            edges.append((min(u, v), max(u, v), rng.random() * 5))
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    forest = KruskalMSF(g).run().get_forest().collect()
    # in-test Kruskal twin
    parent = list(range(12))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = 0.0
    dedup = {}
    for u, v, w in edges:
        key = (min(u, v), max(u, v))
        dedup[key] = min(w, dedup.get(key, float("inf")))
    for w, u, v in sorted((w, u, v) for (u, v), w in dedup.items()):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            want += w
    got = sum(r["weight"] for r in forest)
    assert got == pytest.approx(want)
    assert len(forest) == 11  # spanning tree of a connected 12-node graph


# --------------------------------------- ChibaNishizekiTriangleEdgeScore
def test_chiba_nishizeki_equals_triangle_edge_score(spark):
    rng = random.Random(3)
    edges = {(i, (i + 1) % 9) for i in range(9)}
    while len(edges) < 20:
        u, v = rng.randrange(9), rng.randrange(9)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    g = Graph.from_edge_list(spark, sorted(edges), directed=False)
    a = {(r["u"], r["v"]): r["score"]
         for r in chiba_nishizeki_triangle_edge_scores(g).collect()}
    b = {(r["u"], r["v"]): r["score"]
         for r in TriangleEdgeScore(g).run().edge_scores().collect()}
    assert a == b
