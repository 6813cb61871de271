"""Edge-score transforms, quadrangle counts, approx clustering
coefficients (``cpp/edgescores/``, ``cpp/global/ClusteringCoefficient.cpp``)."""

import itertools
import math

import pytest

from networkit_spark import Graph
from networkit_spark.operators import edgescore_transforms as et


def _g(spark, edges):
    return Graph.from_edge_list(spark, edges, directed=False)


def _scores_df(spark, d):
    return spark.createDataFrame(
        [(u, v, s) for (u, v), s in d.items()], "u long, v long, score double"
    )


def _collect(df):
    return {(r["u"], r["v"]): r["score"] for r in df.collect()}


EDGES = [(0, 1), (0, 2), (1, 2), (2, 3)]
SCORES = {(0, 1): 2.0, (0, 2): 1.0, (1, 2): 4.0, (2, 3): 3.0}


def test_geometric_mean_score(spark):
    g = _g(spark, EDGES)
    got = _collect(et.geometric_mean_score(g, _scores_df(spark, SCORES)))
    ns = {0: 3.0, 1: 6.0, 2: 8.0, 3: 3.0}
    for (u, v), s in SCORES.items():
        assert got[(u, v)] == pytest.approx(s / math.sqrt(ns[u] * ns[v]))


def test_normalizer_and_linearizer(spark):
    g = _g(spark, EDGES)
    s = _scores_df(spark, SCORES)
    norm = _collect(et.normalize_edge_scores(g, s, 0.0, 1.0))
    assert norm[(0, 2)] == pytest.approx(0.0)
    assert norm[(1, 2)] == pytest.approx(1.0)
    assert norm[(0, 1)] == pytest.approx(1 / 3)
    inv = _collect(et.normalize_edge_scores(g, s, 0.0, 1.0, invert=True))
    assert inv[(0, 2)] == pytest.approx(1.0)
    assert inv[(1, 2)] == pytest.approx(0.0)
    with pytest.raises(ValueError, match="constant"):
        et.normalize_edge_scores(
            g, _scores_df(spark, {(0, 1): 1.0, (0, 2): 1.0}), 0, 1
        )
    lin = _collect(et.linearize_edge_scores(g, s))
    # distinct scores → ranks are unambiguous: 1<2<3<4 → 0,1/3,2/3,1
    assert lin[(0, 2)] == pytest.approx(0.0)
    assert lin[(0, 1)] == pytest.approx(1 / 3)
    assert lin[(2, 3)] == pytest.approx(2 / 3)
    assert lin[(1, 2)] == pytest.approx(1.0)
    lin_inv = _collect(et.linearize_edge_scores(g, s, inverse=True))
    assert lin_inv[(1, 2)] == pytest.approx(0.0)


def test_blender_and_as_weight(spark):
    g = _g(spark, EDGES)
    s0 = _scores_df(spark, SCORES)
    s1 = _scores_df(spark, {k: -v for k, v in SCORES.items()})
    sel = spark.createDataFrame(
        [(u, v, (u + v) % 2 == 0) for u, v in SCORES],
        "u long, v long, sel boolean",
    )
    blended = _collect(et.blend_edge_scores(g, s0, s1, sel))
    for (u, v), s in SCORES.items():
        want = -s if (u + v) % 2 == 0 else s
        assert blended[(u, v)] == pytest.approx(want)
    gw = et.edge_score_as_weight(g, s0, squared=True, offset=1.0, factor=2.0)
    w = {
        (r["src"], r["dst"]): r["weight"] for r in gw.edges.collect()
    }
    assert w[(0, 1)] == pytest.approx(1.0 + 2.0 * 4.0)
    assert gw.weighted


def _brute_quadrangles(edges, n):
    adj = {i: set() for i in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    counts = {tuple(sorted(e)): 0 for e in edges}
    for quad in itertools.combinations(range(n), 4):
        for perm in itertools.permutations(quad):
            a, b, c, d = perm
            if a != min(perm):
                continue
            if b > d:  # canonical direction
                continue
            if (
                b in adj[a] and c in adj[b] and d in adj[c] and a in adj[d]
            ):
                for e in [(a, b), (b, c), (c, d), (a, d)]:
                    counts[tuple(sorted(e))] += 1
    return counts


def test_quadrangle_scores(spark):
    # K4: every edge lies in one 4-cycle... brute force is the oracle
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    g = _g(spark, edges)
    got = {
        (r["u"], r["v"]): r["score"]
        for r in et.quadrangle_edge_scores(g).collect()
    }
    want = _brute_quadrangles(edges, 5)
    assert got == want
    # C4 sanity: each edge in exactly the one cycle
    c4 = _g(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    got4 = {
        (r["u"], r["v"]): r["score"]
        for r in et.quadrangle_edge_scores(c4).collect()
    }
    assert all(v == 1 for v in got4.values())


def test_approx_clustering_coefficients(spark):
    # complete graph: every wedge closes → both estimators return 1.0
    k5 = _g(spark, [(i, j) for i in range(5) for j in range(i + 1, 5)])
    assert et.approx_avg_local_clustering(k5, trials=20) == pytest.approx(1.0)
    assert et.approx_global_clustering(k5, trials=20) == pytest.approx(1.0)
    # star: no wedge closes → 0.0
    star = _g(spark, [(0, i) for i in range(1, 6)])
    assert et.approx_avg_local_clustering(star, trials=10) == 0.0
    assert et.approx_global_clustering(star, trials=10) == 0.0
    # determinism per seed
    g = _g(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)])
    a = et.approx_avg_local_clustering(g, trials=30, seed=5)
    b = et.approx_avg_local_clustering(g, trials=30, seed=5)
    assert a == b
    assert 0.0 <= a <= 1.0
    with pytest.raises(ValueError, match="trials"):
        et.approx_global_clustering(g, 0)


def _brute_prefix_jaccard(edges, scores):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, {})[v] = scores[tuple(sorted((u, v)))]
        adj.setdefault(v, {})[u] = scores[tuple(sorted((u, v)))]

    def ranked(a):
        nbrs = sorted(adj[a].items(), key=lambda p: -p[1])
        out, rank, greater = {}, 0, 0
        prev = None
        for b, s in nbrs:
            if prev is not None and s != prev:
                rank = greater
            out[b] = rank
            greater += 1
            prev = s
        return out

    res = {}
    for u, v in edges:
        ru = {w: r for w, r in ranked(u).items() if w != v}
        rv = {w: r for w, r in ranked(v).items() if w != u}
        best = 0.0
        levels = sorted(set(ru.values()) | set(rv.values()))
        for lvl in levels:
            pu = {w for w, r in ru.items() if r <= lvl}
            pv = {w for w, r in rv.items() if r <= lvl}
            cn = len(pu & pv)
            un = len(pu | pv)
            if un:
                best = max(best, cn / un)
        res[tuple(sorted((u, v)))] = best
    return res


def test_prefix_jaccard(spark):
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4),
             (4, 5), (0, 4)]
    sc = {
        (0, 1): 5.0, (0, 2): 4.0, (0, 3): 3.0, (1, 2): 5.0, (1, 3): 2.0,
        (2, 3): 4.0, (3, 4): 1.0, (4, 5): 2.0, (0, 4): 2.0,
    }
    g = _g(spark, edges)
    from networkit_spark.operators.edgescore_transforms import (
        prefix_jaccard_scores,
    )

    got = {
        (r["u"], r["v"]): r["score"]
        for r in prefix_jaccard_scores(g, _scores_df(spark, sc)).collect()
    }
    want = _brute_prefix_jaccard(edges, sc)
    assert set(got) == set(want)
    for e in want:
        assert got[e] == pytest.approx(want[e]), e
