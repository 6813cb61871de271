"""AffectedNodes + ReverseBFS vs a literal Python port of the reference
control flow (``cpp/distance/AffectedNodes.cpp:16-460``): pruned
affected-BFS, level histograms, the O(L²) improvement loops — all
reproduced queue-for-queue here and compared against the join-based
Spark formulation on undirected/directed × addition/removal cases."""

from collections import deque

import pytest

from networkit_spark import AffectedNodes, Graph, ReverseBFS
from networkit_spark.streaming.events import EDGE_ADDITION, EDGE_REMOVAL

INF = float("inf")


def _adj(edges, n, directed):
    out = {u: [] for u in range(n)}
    inn = {u: [] for u in range(n)}
    for u, v in edges:
        out[u].append(v)
        inn[v].append(u)
        if not directed:
            out[v].append(u)
            inn[u].append(v)
    return out, inn


def _bfs_skip(adj, n, source, skip):
    """bfsWithoutStartNeighbor (AffectedNodes.cpp:455-351 fwd/rev)."""
    dist = [INF] * n
    visited = [False] * n
    q = deque()
    visited[source] = True
    dist[source] = 0
    for v in adj[source]:
        if v == skip or visited[v]:
            continue
        q.append(v)
        visited[v] = True
        dist[v] = 1
    while q:
        u = q.popleft()
        for v in adj[u]:
            if not visited[v]:
                q.append(v)
                visited[v] = True
                dist[v] = dist[u] + 1
    return dist


def _get_affected(adj, n, source, old, extra=None):
    """getAffectedNodes (AffectedNodes.cpp:393-437): pruned BFS."""
    q = deque()
    new = [INF] * n
    visited = [False] * n
    affected = []
    new[source] = 0
    visited[source] = True
    q.append(source)
    if extra is not None:
        q.append(extra)
        new[extra] = 1
        visited[extra] = True
        affected.append(extra)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if not visited[v]:
                visited[v] = True
                new[v] = new[u] + 1
                if new[v] < old[v]:
                    q.append(v)
                    affected.append(v)
    return affected, new


def _hist(dist):
    h = {}
    for x in dist:
        if x < INF:
            h[int(x)] = h.get(int(x), 0) + 1
    return h


def _harmonic(h):
    return sum(c / i for i, c in h.items() if i >= 1)


def _imp_table(hist_new, hist_old, levels_i):
    levels_j = max(hist_new, default=0)
    return {
        i: sum(
            (hist_new.get(j, 0) - hist_old.get(j, 0)) / (i + j)
            for j in range(1, levels_j + 1)
        )
        for i in range(1, levels_i + 1)
    }


def golden_added_undirected(edges, n, u, v):
    out, _ = _adj(edges, n, directed=False)
    dist_u = _bfs_skip(out, n, u, v)
    dist_v = _bfs_skip(out, n, v, u)
    aff_u, new_u = _get_affected(out, n, u, dist_u)
    aff_v, new_v = _get_affected(out, n, v, dist_v)
    nodes = sorted(aff_u) + sorted(aff_v)
    distances = {w: min(dist_u[w], dist_v[w]) for w in nodes}
    new_u = [min(a, b) for a, b in zip(new_u, dist_u)]
    new_v = [min(a, b) for a, b in zip(new_v, dist_v)]
    h_old_u, h_old_v = _hist(dist_u), _hist(dist_v)
    h_new_u, h_new_v = _hist(new_u), _hist(new_v)
    lu, lv = max(h_new_u, default=0), max(h_new_v, default=0)
    imp_u = _imp_table(h_new_v, h_old_v, lu)
    imp_v = _imp_table(h_new_u, h_old_u, lv)
    improvements = {}
    for w in aff_u:
        improvements[w] = imp_u.get(int(new_v[w]), 0.0)
    for w in aff_v:
        improvements[w] = imp_v.get(int(new_u[w]), 0.0)
    return (
        set(nodes),
        distances,
        improvements,
        _harmonic(h_new_u),
        _harmonic(h_new_v),
    )


def golden_added_directed(edges, n, u, v):
    out, inn = _adj(edges, n, directed=True)
    dist_u = _bfs_skip(inn, n, u, None)
    dist_v = _bfs_skip(inn, n, v, u)
    aff, new_v = _get_affected(inn, n, v, dist_v)
    distances = {w: min(dist_v[w], dist_u[w]) for w in aff}
    old_fu = _bfs_skip(out, n, u, v)
    new_fu = _get_affected(out, n, u, old_fu)[1]
    new_fu = [min(a, b) for a, b in zip(new_fu, old_fu)]
    h_old, h_new = _hist(old_fu), _hist(new_fu)
    lv = max((int(x) for x in new_v if x < INF), default=0)
    imp_v = _imp_table(h_new, h_old, lv)
    improvements = {w: imp_v.get(int(new_v[w]) - 1, 0.0) for w in aff}
    return set(aff), distances, improvements, _harmonic(h_new), 0.0


def golden_removed_undirected(edges, n, u, v):
    out, _ = _adj(edges, n, directed=False)
    dist_u = _bfs_skip(out, n, u, None)
    dist_v = _bfs_skip(out, n, v, None)
    aff_u, _ = _get_affected(out, n, u, dist_u, extra=v)
    aff_v, _ = _get_affected(out, n, v, dist_v, extra=u)
    nodes = set(aff_u) | set(aff_v)
    distances = {w: min(dist_u[w], dist_v[w]) for w in nodes}
    return nodes, distances


def golden_removed_directed(edges, n, u, v):
    _, inn = _adj(edges, n, directed=True)
    dist_v = _bfs_skip(inn, n, v, None)
    aff, _ = _get_affected(inn, n, v, dist_v, extra=u)
    return set(aff), {w: dist_v[w] for w in aff}


def _spark_result(spark, edges, n, directed, etype, u, v):
    g = Graph.from_edge_list(spark, edges, directed=directed, num_nodes=n)
    algo = AffectedNodes(g, etype, u, v).run()
    nodes = {r["id"] for r in algo.nodes().collect()}
    dists = {
        r["id"]: (r["dist"] if r["dist"] is not None else INF)
        for r in algo.distances().collect()
    }
    imps = None
    if etype == EDGE_ADDITION:
        imps = {r["id"]: r["improvement"] for r in algo.improvements().collect()}
    return algo, nodes, dists, imps


# Two lobes joined by a long path; 8-9 shortcut is the event edge;
# 12-13 is a separate component.
UND_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
    (1, 8), (7, 9), (8, 9),
    (3, 10), (10, 11),
    (12, 13),
]
UND_N = 14

DIR_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),
    (2, 6), (6, 7), (7, 8), (8, 2),
    (9, 0), (4, 9),
    (8, 5),
]
DIR_N = 10


def test_added_undirected_matches_reference_port(spark):
    u, v = 8, 9
    gn, gd, gi, cu, cv = golden_added_undirected(UND_EDGES, UND_N, u, v)
    algo, sn, sd, si = _spark_result(
        spark, UND_EDGES, UND_N, False, EDGE_ADDITION, u, v
    )
    assert sn == gn
    assert sd == {k: float(val) for k, val in gd.items()}
    assert si == pytest.approx(gi)
    assert algo.closeness_u == pytest.approx(cu)
    assert algo.closeness_v == pytest.approx(cv)


def test_added_undirected_bridging_components(spark):
    # event edge connects the two components: previously-unreachable
    # nodes become affected; their pre-event distance comes from the
    # other endpoint's side
    edges = UND_EDGES + [(0, 12)]
    u, v = 0, 12
    gn, gd, gi, cu, cv = golden_added_undirected(edges, UND_N, u, v)
    algo, sn, sd, si = _spark_result(spark, edges, UND_N, False, EDGE_ADDITION, u, v)
    assert sn == gn
    assert sd == {k: float(val) for k, val in gd.items()}
    assert si == pytest.approx(gi)
    assert algo.closeness_u == pytest.approx(cu)
    assert algo.closeness_v == pytest.approx(cv)


def test_added_directed_matches_reference_port(spark):
    u, v = 8, 5
    gn, gd, gi, cu, _ = golden_added_directed(DIR_EDGES, DIR_N, u, v)
    algo, sn, sd, si = _spark_result(spark, DIR_EDGES, DIR_N, True, EDGE_ADDITION, u, v)
    assert sn == gn
    assert sd == {k: float(val) for k, val in gd.items()}
    assert si == pytest.approx(gi)
    assert algo.closeness_u == pytest.approx(cu)
    assert algo.closeness_v == 0.0


def test_removed_undirected_matches_reference_port(spark):
    # current graph = edge already absent
    u, v = 8, 9
    current = [e for e in UND_EDGES if e != (8, 9)]
    gn, gd = golden_removed_undirected(current, UND_N, u, v)
    _, sn, sd, _ = _spark_result(spark, current, UND_N, False, EDGE_REMOVAL, u, v)
    assert sn == gn
    assert sd == gd


def test_removed_directed_matches_reference_port(spark):
    u, v = 8, 5
    current = [e for e in DIR_EDGES if e != (8, 5)]
    gn, gd = golden_removed_directed(current, DIR_N, u, v)
    _, sn, sd, _ = _spark_result(spark, current, DIR_N, True, EDGE_REMOVAL, u, v)
    assert sn == gn
    assert sd == gd


def test_rejects_other_event_types(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], num_nodes=2)
    with pytest.raises(ValueError):
        AffectedNodes(g, "NODE_ADDITION", 0, 1)


def test_reverse_bfs_directed_chain(spark):
    g = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 3)], directed=True, num_nodes=4
    )
    rev = {r["id"]: r["dist"] for r in ReverseBFS(g, 3).run().distances().collect()}
    assert rev == {3: 0, 2: 1, 1: 2, 0: 3}


def test_reverse_bfs_undirected_equals_bfs(spark):
    from networkit_spark import BFS

    g = Graph.from_edge_list(spark, UND_EDGES, directed=False, num_nodes=UND_N)
    fwd = {r["id"]: r["dist"] for r in BFS(g, 0).run().distances().collect()}
    rev = {r["id"]: r["dist"] for r in ReverseBFS(g, 0).run().distances().collect()}
    assert fwd == rev
