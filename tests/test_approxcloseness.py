"""ApproxCloseness (``cpp/centrality/ApproxCloseness.cpp``) vs an
in-test closed-form twin (same estimator formulas, same deterministic
pivot tie rule)."""

import heapq
import math

import pytest

from networkit_spark import Graph
from networkit_spark.operators.approxcloseness import ApproxCloseness


def _dijkstra(adj, src):
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, math.inf):
            continue
        for v, w in adj.get(u, {}).items():
            nd = d + w
            if nd < dist.get(v, math.inf):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _twin(edges, nodes, samples, eps, normalized):
    adj = {}
    for u, v, w in edges:
        if u == v:
            continue
        pw = adj.setdefault(u, {}).get(v, math.inf)
        adj[u][v] = min(pw, w)
        pw = adj.setdefault(v, {}).get(u, math.inf)
        adj[v][u] = min(pw, w)
    n = len(nodes)
    k = len(samples)
    D = {s: _dijkstra(adj, s) for s in samples}
    piv, delta = {}, {}
    for u in nodes:
        delta[u], piv[u] = min((D[s][u], s) for s in samples)
    scores, sqerr = {}, {}
    nonsamp = [u for u in nodes if u not in samples]
    for s in samples:
        far = sum(D[s].values())
        scores[s] = ((n - 1) if normalized else 1.0) / far if far > 0 else 0.0
        sqerr[s] = 0.0
    for u in nonsamp:
        LCSum = LCSumSQ = HCSum = HCSumSQErr = 0.0
        LCNum = 0
        for s in samples:
            d, dsp = D[s][u], D[s][piv[u]]
            is_lc = (
                eps == 0.0
                or d <= delta[u] * (1.0 / eps - 1.0)
                or dsp <= delta[u] / eps
            )
            if is_lc:
                LCSum += d
                LCNum += 1
                LCSumSQ += d * d
            else:
                HCSum += d
                HCSumSQErr += (d - dsp) ** 2
        if eps > 0:
            thresh = delta[u] / eps
            tail = [D[piv[u]][v] for v in nonsamp if D[piv[u]][v] > thresh]
            HSum, HNum = sum(tail), len(tail)
        else:
            HSum, HNum = 0.0, 0
        LNum = n - 1 - HNum - k + LCNum
        lc_term = LCSum * LNum / LCNum if LCNum > 0 and LNum > 0 else 0.0
        far = HSum + HCSum + lc_term
        scores[u] = ((n - 1) if normalized else 1.0) / far if far > 0 else 0.0
        e = 0.0
        if LCNum > 0:
            avg = (LCSum / LCNum) ** 2
            e += (LCSumSQ / LCNum - avg) * LNum / LCNum
        if k - LCNum > 0:
            e += HCSumSQErr / (k - LCNum) * HNum
        sqerr[u] = e
    return scores, sqerr


EDGES = [
    (0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 4, 3.0), (4, 0, 1.0),
    (1, 5, 1.0), (5, 6, 2.0), (6, 2, 1.0), (6, 7, 1.0), (7, 8, 2.0),
    (8, 9, 1.0), (9, 5, 1.0), (0, 9, 2.0), (3, 7, 1.0),
]
NODES = list(range(10))


@pytest.mark.parametrize("eps,normalized", [(0.1, False), (0.5, True)])
def test_approxcloseness_matches_twin(spark, eps, normalized):
    g = Graph.from_edge_list(spark, EDGES, directed=False, weighted=True)
    algo = ApproxCloseness(g, n_samples=3, epsilon=eps, normalized=normalized)
    samples = algo._sample_nodes()
    algo.run()
    want, want_err = _twin(EDGES, NODES, samples, eps, normalized)
    got = {r["id"]: r["score"] for r in algo.scores().collect()}
    got_err = {
        r["id"]: r["sqerr"]
        for r in algo.get_square_error_estimates().collect()
    }
    assert set(got) == set(NODES)
    for u in NODES:
        assert got[u] == pytest.approx(want[u], rel=1e-9), f"node {u}"
        assert got_err[u] == pytest.approx(want_err[u], abs=1e-9), f"err {u}"


def test_approxcloseness_all_sampled_is_exact(spark):
    # k = n and eps = 0 → every node sampled → exact closeness
    g = Graph.from_edge_list(spark, EDGES, directed=False, weighted=True)
    algo = ApproxCloseness(g, n_samples=10, epsilon=0.0).run()
    got = {r["id"]: r["score"] for r in algo.scores().collect()}
    adj = {}
    for u, v, w in EDGES:
        adj.setdefault(u, {})[v] = min(adj.get(u, {}).get(v, math.inf), w)
        adj.setdefault(v, {})[u] = min(adj.get(v, {}).get(u, math.inf), w)
    for u in NODES:
        far = sum(_dijkstra(adj, u).values())
        assert got[u] == pytest.approx(1.0 / far, rel=1e-12)


def test_approxcloseness_sampling_only_estimator(spark):
    # eps = 0: score = 1 / (LCSum·(n−1)/k) for non-sampled nodes
    g = Graph.from_edge_list(spark, EDGES, directed=False, weighted=True)
    algo = ApproxCloseness(g, n_samples=4, epsilon=0.0, seed=3)
    samples = algo._sample_nodes()
    algo.run()
    want, _ = _twin(EDGES, NODES, samples, 0.0, False)
    got = {r["id"]: r["score"] for r in algo.scores().collect()}
    for u in NODES:
        assert got[u] == pytest.approx(want[u], rel=1e-9)


def test_approxcloseness_guards(spark):
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError, match="undirected"):
        ApproxCloseness(gd, 1)
    g2 = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(RuntimeError, match="connected"):
        ApproxCloseness(g2, 2).run()
    g3 = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError, match="n_samples"):
        ApproxCloseness(g3, 5).run()
