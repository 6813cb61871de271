"""KadabraBetweenness — (ε, δ) contract vs exact pair-fraction
betweenness computed by in-test enumeration.

KADABRA's estimand is bc(v) = (1/(n(n-1))) Σ_{s≠t} σ_st(v)/σ_st
(fraction of uniformly-sampled ordered pairs whose random shortest
path passes through v) — the tests enumerate it exactly on goldens.
"""

from __future__ import annotations

from collections import deque

import pytest

from networkit_spark import Graph
from networkit_spark.operators.kadabra import KadabraBetweenness


def _exact_fraction(nodes, edges):
    adj = {u: set() for u in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    n = len(nodes)
    acc = {u: 0.0 for u in nodes}
    for s in nodes:
        # BFS with path counts
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        dq = deque([s])
        preds = {u: [] for u in nodes}
        while dq:
            u = dq.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0.0
                    dq.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = {u: 0.0 for u in nodes}
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                acc[w] += delta[w]
    return {u: acc[u] / (n * (n - 1)) for u in nodes}


def _graph(spark, edges):
    return Graph(
        spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges],
            "src long, dst long, weight double",
        ),
        directed=False,
        weighted=True,
    )


CASES = {
    "path4": [(0, 1), (1, 2), (2, 3)],
    "star5": [(0, 1), (0, 2), (0, 3), (0, 4)],
    "diamond": [(0, 1), (0, 2), (1, 3), (2, 3)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_within_err_of_exact(spark, name):
    edges = CASES[name]
    nodes = sorted({x for e in edges for x in e})
    exact = _exact_fraction(nodes, edges)
    err = 0.15
    kb = KadabraBetweenness(
        _graph(spark, edges), err=err, delta=0.1, seed=5, diameter_hint=4
    ).run()
    got = {r["id"]: r["score"] for r in kb.scores().collect()}
    assert kb.number_of_pairs() > 0
    assert kb.number_of_pairs() <= kb.get_omega() + 1
    for v in nodes:
        assert abs(got[v] - exact[v]) <= err, (v, got[v], exact[v])


def test_deterministic_given_seed(spark):
    g = _graph(spark, CASES["diamond"])
    a = KadabraBetweenness(g, err=0.2, delta=0.2, seed=9, diameter_hint=3)
    b = KadabraBetweenness(g, err=0.2, delta=0.2, seed=9, diameter_hint=3)
    ra = sorted((r["id"], round(r["score"], 12)) for r in a.run().scores().collect())
    rb = sorted((r["id"], round(r["score"], 12)) for r in b.run().scores().collect())
    assert ra == rb


def test_validation(spark):
    g = _graph(spark, CASES["path4"])
    with pytest.raises(ValueError):
        KadabraBetweenness(g, err=0.0)
    with pytest.raises(ValueError):
        KadabraBetweenness(g, delta=1.5)
