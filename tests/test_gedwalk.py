"""GedWalk — equality with an exhaustive pure-Python greedy over the
L-truncated GED objective (hit/miss DP identical to
``GedWalk.cpp:506-561``), plus pool-expansion and validation checks."""

import random

import pytest

from networkit_spark import Graph
from networkit_spark.operators.gedwalk import GedWalk

from tests.conftest import spark  # noqa: F401


def _graph(spark, pairs, directed=False):
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    return Graph(edges, directed=directed)


def _score(adj_in, nodes, group, alpha, levels):
    """L-truncated GED score via the reference hit/miss DP."""
    gset = set(group)
    hit = {u: (1.0 if u in gset else 0.0) for u in nodes}
    miss = {u: (0.0 if u in gset else 1.0) for u in nodes}
    total = 0.0
    for i in range(1, levels + 1):
        nh, nm = {}, {}
        for u in nodes:
            h = sum(hit[v] for v in adj_in.get(u, ()))
            m = sum(miss[v] for v in adj_in.get(u, ()))
            if u in gset:
                nh[u], nm[u] = h + m, 0.0
            else:
                nh[u], nm[u] = h, m
        hit, miss = nh, nm
        total += (alpha**i) * sum(hit.values())
    return total


def _greedy(pairs, n, k, alpha, levels):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    nodes = list(range(n))
    group = []
    for _ in range(k):
        base = _score(adj, nodes, group, alpha, levels)
        best = None
        for z in nodes:
            if z in group:
                continue
            gain = _score(adj, nodes, group + [z], alpha, levels) - base
            key = (-gain, z)
            if best is None or key < best[0]:
                best = (key, z)
        group.append(best[1])
    return group


def test_star_hub(spark):
    pairs = [(0, i) for i in range(1, 7)]
    gw = GedWalk(_graph(spark, pairs), k=1, alpha=0.1, levels=3).run()
    assert gw.group_max_ged_walk() == [0]
    # truncated score matches the reference DP exactly
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    want = _score(adj, list(range(7)), [0], 0.1, 3)
    assert abs(gw.get_approximate_score() - want) < 1e-9
    assert gw.score_bound() >= gw.get_approximate_score()


def test_matches_exhaustive_greedy(spark):
    rng = random.Random(13)
    n = 14
    pairs = sorted(
        {
            tuple(sorted((rng.randrange(n), rng.randrange(n))))
            for _ in range(26)
        }
    )
    pairs = [p for p in pairs if p[0] != p[1]]
    pairs += [(i, i + 1) for i in range(n - 1)]
    pairs = sorted(set(pairs))
    want = _greedy(pairs, n, 3, 0.08, 4)
    # pool=2 forces lazy-pool expansion through multiple batches
    gw = GedWalk(
        _graph(spark, pairs), k=3, alpha=0.08, levels=4, pool=2
    ).run()
    assert gw.group_max_ged_walk() == want


def test_validation(spark):
    g = _graph(spark, [(0, 1), (1, 2)])
    with pytest.raises(ValueError):
        GedWalk(g, k=1, levels=0)
    with pytest.raises(ValueError):
        GedWalk(g, k=3).run()  # k must be <= n-1
