"""Triangle counting / LCC goldens (FIXTURES.md §3: tri_k4) and oracle
cross-checks on seeded graphs."""

import itertools

import pytest

from networkit_spark import (
    Graph,
    GlobalClusteringCoefficient,
    LocalClusteringCoefficient,
    TriangleEdgeScore,
)
from networkit_spark.generators import erdos_renyi


def k4_plus_pendant(spark):
    edges = [(a, b) for a, b in itertools.combinations(range(4), 2)] + [(3, 4)]
    return Graph.from_edge_list(spark, edges, num_nodes=5)


def test_k4_triangles_and_lcc(spark):
    g = k4_plus_pendant(spark)
    lcc = LocalClusteringCoefficient(g).run()
    tri = {r["id"]: r["triangles"] for r in lcc.triangles().collect()}
    assert tri == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0}
    s = {r["id"]: r["score"] for r in lcc.scores().collect()}
    # c(u)=2T/(d(d-1)): nodes 0-2 have d=3,T=3 → 1.0; node 3 d=4,T=3 → 0.5
    assert abs(s[0] - 1.0) < 1e-12
    assert abs(s[3] - 0.5) < 1e-12
    assert s[4] == 0.0


def test_rejects_self_loops_until_removed(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (1, 1)])
    with pytest.raises(ValueError):
        LocalClusteringCoefficient(g).run()
    clean = g.remove_self_loops()
    lcc = LocalClusteringCoefficient(clean).run()
    tri = {r["id"]: r["triangles"] for r in lcc.triangles().collect()}
    assert tri == {0: 1, 1: 1, 2: 1}


def test_triangle_edge_score_k4(spark):
    g = k4_plus_pendant(spark)
    tes = TriangleEdgeScore(g).run()
    scores = {(r["u"], r["v"]): r["score"] for r in tes.edge_scores().collect()}
    for a, b in itertools.combinations(range(4), 2):
        assert scores[(a, b)] == 2  # K4 edges have 2 common neighbors
    assert scores[(3, 4)] == 0


def test_global_clustering_k4(spark):
    g = k4_plus_pendant(spark)
    gcc = GlobalClusteringCoefficient(g).run()
    # closed wedges = Σ2T = 24; wedges = Σd(d-1) = 3·6+12+0 = 30
    assert abs(gcc.exact_global() - 24.0 / 30.0) < 1e-12
    # avg local over deg≥2: (1+1+1+0.5)/4
    assert abs(gcc.avg_local() - 0.875) < 1e-12


def brute_force_triangles(edge_set, n):
    adj = {i: set() for i in range(n)}
    for u, v in edge_set:
        adj[u].add(v)
        adj[v].add(u)
    tri = {i: 0 for i in range(n)}
    for u in range(n):
        for v, w in itertools.combinations(sorted(adj[u]), 2):
            if w in adj[v]:
                tri[u] += 1
    return tri


def test_er_graph_matches_bruteforce(spark):
    g = erdos_renyi(spark, 60, 0.15, seed=7)
    edge_set = {(r["src"], r["dst"]) for r in g.edges.collect()}
    want = brute_force_triangles(edge_set, 60)
    lcc = LocalClusteringCoefficient(g).run()
    got = {r["id"]: r["triangles"] for r in lcc.triangles().collect()}
    assert got == want


def test_multi_edges_collapsed(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 1), (1, 2), (0, 2)])
    lcc = LocalClusteringCoefficient(g).run()
    tri = {r["id"]: r["triangles"] for r in lcc.triangles().collect()}
    assert tri == {0: 1, 1: 1, 2: 1}
