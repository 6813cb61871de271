"""CutClustering (``cpp/community/CutClustering.cpp``) vs an in-test
brute-force twin: same degree-desc order, min cuts by subset
enumeration, source side = the unique minimal min-cut side
(intersection of all min-capacity source sides)."""

import itertools

import pytest

from networkit_spark import Graph
from networkit_spark.operators.cutclustering import CutClustering


def _twin(edges, nodes, alpha):
    adj = {}
    for u, v, w in edges:
        if u == v:
            continue
        adj.setdefault(u, {})[v] = adj.get(u, {}).get(v, 0.0) + w
        adj.setdefault(v, {})[u] = adj.get(v, {}).get(u, 0.0) + w
    deg = {u: len(adj.get(u, {})) for u in nodes}
    order = sorted(nodes, key=lambda u: (-deg[u], u))
    labels = {}

    def min_source_side(s):
        others = [x for x in nodes if x != s]
        best_cap, best_sets = None, []
        for r in range(len(others) + 1):
            for comb in itertools.combinations(others, r):
                S = {s, *comb}
                cap = alpha * len(S)  # edges to the artificial sink
                for a in S:
                    for b, w in adj.get(a, {}).items():
                        if b not in S:
                            cap += w
                if best_cap is None or cap < best_cap - 1e-12:
                    best_cap, best_sets = cap, [S]
                elif abs(cap - best_cap) <= 1e-12:
                    best_sets.append(S)
        out = best_sets[0]
        for S in best_sets[1:]:
            out = out & S
        return out

    for u in order:
        if u in labels:
            continue
        for v in min_source_side(u):
            labels[v] = u
    return labels


def _partition(algo):
    return {r["id"]: r["label"] for r in algo.get_partition().collect()}


def test_cut_clustering_two_pockets(spark):
    edges = [
        (0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
        (3, 4, 1.0), (4, 5, 1.0), (5, 3, 1.0),
        (2, 3, 0.2),
    ]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    algo = CutClustering(g, alpha=0.5).run()
    got = _partition(algo)
    want = _twin(edges, list(range(6)), 0.5)
    assert got == want
    # sanity: pockets recovered
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]
    assert algo.number_of_flows() <= 6


def test_cut_clustering_twin_on_path(spark):
    edges = [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 2.0)]
    for alpha in (0.4, 1.5):
        g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
        got = _partition(CutClustering(g, alpha=alpha).run())
        assert got == _twin(edges, [0, 1, 2, 3], alpha), f"alpha={alpha}"


def test_cut_clustering_large_alpha_singletons(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    got = _partition(CutClustering(g, alpha=10.0).run())
    assert got == {0: 0, 1: 1, 2: 2}


def test_cut_clustering_guards(spark):
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError, match="undirected"):
        CutClustering(gd, 1.0)
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError, match="alpha"):
        CutClustering(g, 0.0)
    with pytest.raises(RuntimeError, match="flows"):
        CutClustering(g, alpha=10.0, max_flows=1).run()
