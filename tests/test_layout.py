"""PivotMDS vs a literal numpy port of ``cpp/viz/PivotMDS.cpp:18-142``
sharing the same seeded pivots and power-method start draws — exact
coordinate equality (allclose 1e-9), plus determinism, the structural-
zero rule for pivot-unreachable nodes, and the GML layout writer."""

import math

import numpy as np
import pytest

from networkit_spark import Graph, PivotMDS
from networkit_spark.operators.graphtools import random_nodes
from networkit_spark.operators.layout import multi_source_weighted_distances

# weighted graph: two fused squares + a tail
EDGES = [
    (0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 0, 1.5),
    (2, 4, 1.0), (4, 5, 0.5), (5, 3, 2.5), (5, 6, 1.0),
    (6, 7, 1.0), (7, 8, 3.0),
]
N = 9


def _dijkstra(adj, n, s):
    import heapq

    dist = [math.inf] * n
    dist[s] = 0.0
    pq = [(0.0, s)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for v, w in adj[u]:
            if d + w < dist[v]:
                dist[v] = d + w
                heapq.heappush(pq, (dist[v], v))
    return dist


def _port(edges, n, pivots, dim, seed):
    """Literal port of PivotMDS.cpp:18-103 with sorted-pivot column
    order and seeded start vectors (the two documented divergences both
    implementations share)."""
    adj = [[] for _ in range(n)]
    for u, v, w in edges:
        adj[u].append((v, w))
        adj[v].append((u, w))
    k = len(pivots)
    C = np.zeros((n, k))
    reached = np.zeros((n, k), dtype=bool)
    for j, p in enumerate(pivots):
        d = _dijkstra(adj, n, p)
        for i in range(n):
            if d[i] < math.inf:
                C[i, j] = d[i]
                reached[i, j] = True
    row_mean = C.sum(axis=1) / k
    col_mean = C.sum(axis=0) / n
    grand = row_mean.sum() / (2.0 * n) + col_mean.sum() / (2.0 * k)
    centered = C - row_mean[:, None] - col_mean[None, :] + grand
    centered[~reached] = 0.0  # structural zeros are never centered
    CC = centered.T @ centered
    rng = np.random.RandomState(seed)
    pos = np.zeros((n, dim))
    for d0 in range(dim):
        v = 2.0 * rng.random_sample(k) - 1.0
        for _ in range(1500):
            old = v
            v = CC @ old
            v = v / np.linalg.norm(v)
            if np.linalg.norm(v - old) <= 1e-6:
                break
        lam = float((CC @ v) @ v / (v @ v))
        pos[:, d0] = centered @ v
        CC = CC - (lam / float(v @ v)) * np.outer(v, v)
    return pos


def _coords(algo, n, dim):
    out = np.zeros((n, dim))
    for r in algo.coordinates().collect():
        out[int(r["id"])] = list(r["pos"])
    return out


def test_pivotmds_matches_numpy_port(spark):
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=N)
    algo = PivotMDS(g, dim=2, num_pivots=4, seed=7).run()
    pivots = sorted(
        int(r["id"]) for r in random_nodes(g, 4, 7).collect()
    )
    want = _port(EDGES, N, pivots, dim=2, seed=7)
    got = _coords(algo, N, 2)
    assert np.allclose(got, want, atol=1e-9)


def test_pivotmds_deterministic(spark):
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=N)
    a = _coords(PivotMDS(g, dim=2, num_pivots=3, seed=11).run(), N, 2)
    b = _coords(PivotMDS(g, dim=2, num_pivots=3, seed=11).run(), N, 2)
    assert np.allclose(a, b)


def test_pivotmds_disconnected_structural_zeros(spark):
    # island nodes 9,10 unreachable from any pivot in the main block:
    # their C row is all zeros -> coordinates at the origin
    edges = EDGES + [(9, 10, 1.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=11)
    seed = None
    for s in range(100):
        piv = [int(r["id"]) for r in random_nodes(g, 4, s).collect()]
        if all(p <= 8 for p in piv):
            seed = s
            break
    assert seed is not None
    algo = PivotMDS(g, dim=2, num_pivots=4, seed=seed).run()
    got = _coords(algo, 11, 2)
    pivots = sorted(int(r["id"]) for r in random_nodes(g, 4, seed).collect())
    want = _port(edges, 11, pivots, dim=2, seed=seed)
    assert np.allclose(got, want, atol=1e-9)
    assert np.allclose(got[9], 0.0) and np.allclose(got[10], 0.0)


def test_multi_source_distances_weighted(spark):
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=N)
    adj = [[] for _ in range(N)]
    for u, v, w in EDGES:
        adj[u].append((v, w))
        adj[v].append((u, w))
    got = {
        (int(r["s"]), int(r["id"])): float(r["d"])
        for r in multi_source_weighted_distances(g, [0, 5]).collect()
    }
    for s in (0, 5):
        want = _dijkstra(adj, N, s)
        for i in range(N):
            assert got[(s, i)] == pytest.approx(want[i])


def test_write_gml_layout(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=N)
    algo = PivotMDS(g, dim=2, num_pivots=3, seed=5).run()
    path = str(tmp_path / "layout.gml")
    assert algo.write_gml_layout(path)
    text = open(path).read()
    assert text.count("node [") == N
    assert text.count("edge [") == len(EDGES)
    assert "graphics" in text


def test_write_postscript(spark, tmp_path):
    from networkit_spark.sources.io import write_postscript

    g = Graph.from_edge_list(spark, EDGES, weighted=True, num_nodes=N)
    algo = PivotMDS(g, dim=2, num_pivots=3, seed=5).run()
    labels = spark.createDataFrame(
        [(i, i % 3) for i in range(N)], "id long, label long"
    )
    p1 = str(tmp_path / "g.eps")
    write_postscript(g, algo.coordinates(), p1, clustering=labels)
    text = open(p1).read()
    assert text.startswith("%!PS-Adobe-1.0\n%%Title: NetworKit visualization")
    assert "%%BoundingBox: 0.000 0.000 1020.000 1020.000" in text
    # one dot per node, one segment per edge
    assert text.count(" a s\n") == N
    assert text.count(" l s\n") == len(EDGES)
    # cross-cluster edges grey
    assert "0.800 0.800 0.800 c 1.000 w " in text
    assert text.rstrip().endswith("grestore")
    # torus variant: EPSF header, no gsave/grestore
    p2 = str(tmp_path / "t.eps")
    write_postscript(g, algo.coordinates(), p2, torus=True)
    t2 = open(p2).read()
    assert t2.startswith("%!PS-Adobe-3.0 EPSF-3.0")
    assert "gsave" not in t2
    # default clustering = one-clustering -> first cycle color on every node
    assert t2.count("1.000 0.000 0.000 c ") >= N


# ---------------------------------------------------------------- MaxentStress

from networkit_spark.operators.layout import MaxentStress  # noqa: E402

GRID = []
for _r in range(4):
    for _c in range(4):
        _u = _r * 4 + _c
        if _c < 3:
            GRID.append((_u, _u + 1, 1.0))
        if _r < 3:
            GRID.append((_u, _u + 4, 1.0))
NG = 16


def _grid_graph(spark):
    return Graph.from_edge_list(spark, GRID, weighted=True, num_nodes=NG)


def test_maxent_known_distances_k2_unweighted(spark):
    # path 0-1-2-3-4: k=2 adds hop-2 pairs at distance 2.0
    g = Graph.from_edge_list(spark, [(i, i + 1) for i in range(4)], num_nodes=5)
    algo = MaxentStress(g, dim=2, k=2)
    got = {
        (int(r["src"]), int(r["dst"])): float(r["d"])
        for r in algo._known_distances().collect()
    }
    want = {}
    for i in range(4):
        want[(i, i + 1)] = want[(i + 1, i)] = 1.0
    for i in range(3):
        want[(i, i + 2)] = want[(i + 2, i)] = 2.0
    assert got == want


def test_maxent_known_distances_k2_weighted(spark):
    # weighted triangle + tail: hop-2 pairs carry TRUE weighted
    # distances (which may route through hop-1 paths)
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 2.0)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=4)
    algo = MaxentStress(g, dim=2, k=2)
    got = {
        (int(r["src"]), int(r["dst"])): float(r["d"])
        for r in algo._known_distances().collect()
    }
    # direct edges keep edge weight (min for parallel), hop-2 pairs:
    # (0,3): depth 2 via 2; true weighted distance = 1+1+2 = 4
    # (1,3): depth 2, dist 3
    assert got[(0, 1)] == 1.0 and got[(0, 2)] == 5.0
    assert got[(0, 3)] == pytest.approx(4.0)
    assert got[(3, 0)] == pytest.approx(4.0)
    assert got[(1, 3)] == pytest.approx(3.0)


def test_maxent_rhs_matches_numpy(spark):
    g = _grid_graph(spark)
    algo = MaxentStress(g, dim=2, k=1)
    S = [
        (int(r["src"]), int(r["dst"]), float(r["d"]))
        for r in algo._known_distances().collect()
    ]
    rng = np.random.RandomState(0)
    X = rng.randn(NG, 2)
    coords = spark.createDataFrame(
        [(i, float(X[i, 0]), float(X[i, 1])) for i in range(NG)],
        "id long, c0 double, c1 double",
    )
    got = np.zeros((NG, 2))
    for r in algo._rhs(coords.sparkSession.createDataFrame(
        S, "src long, dst long, d double"
    ), coords).collect():
        got[int(r["id"])] = [r["b0"], r["b1"]]
    want = np.zeros((NG, 2))
    for u, v, d in S:
        dist = max(np.linalg.norm(X[u] - X[v]), 1e-5)
        w = (1.0 / d**2) * d / dist
        want[u] += w * (X[u] - X[v])
    assert np.allclose(got, want, atol=1e-9)


def test_maxent_pure_stress_solve_decreases_stress(spark):
    # one un-normalized majorization solve with a vanishing entropy
    # term must not increase the S-pair stress (Gansner et al.)
    g = _grid_graph(spark)
    pm = PivotMDS(g, dim=2, num_pivots=4, seed=3).run()
    X0 = np.zeros((NG, 2))
    for r in pm.coordinates().collect():
        X0[int(r["id"])] = list(r["pos"])
    algo = MaxentStress(
        g, dim=2, k=1, tolerance=1e-8,
        coordinates=pm.coordinates(), fast_computation=True,
        max_solves_per_alpha=1,
    )
    algo.set_alpha(1e-12)
    algo.run()
    X1 = np.zeros((NG, 2))
    for r in algo.coordinates().collect():
        X1[int(r["id"])] = list(r["pos"])

    def stress(X):
        tot = 0.0
        for u, v, w in GRID:
            tot += (np.linalg.norm(X[u] - X[v]) - w) ** 2 / w**2
        return tot

    assert stress(X1) <= stress(X0) + 1e-9


def test_maxent_measures_and_scaling(spark):
    g = _grid_graph(spark)
    pm = PivotMDS(g, dim=2, num_pivots=4, seed=3).run()
    algo = MaxentStress(
        g, dim=2, k=1, tolerance=1e-6,
        coordinates=pm.coordinates(), fast_computation=True,
        max_solves_per_alpha=2,
    )
    algo.set_alpha(0.01)
    algo.run()
    assert algo.q == 0.0  # grid has no degree-1 nodes
    mde = algo.mean_distance_error()
    assert 0.0 <= mde < 0.5  # near-perfect grid layout
    assert algo.ldme() >= 0.0
    s = algo.compute_scaling_factor()
    assert s > 0.0
    before = {
        int(r["id"]): list(r["pos"]) for r in algo.coordinates().collect()
    }
    algo.scale_layout()
    after = {
        int(r["id"]): list(r["pos"]) for r in algo.coordinates().collect()
    }
    for i in before:
        assert after[i][0] == pytest.approx(before[i][0] * s)
    assert np.isfinite(algo.full_stress_measure())
    assert np.isfinite(algo.maxent_measure())


def test_maxent_q_auto_rule_star(spark):
    # star: 8/9 nodes have degree 1 -> q = 0.8 (MaxentStress.cpp:518-526)
    edges = [(0, i, 1.0) for i in range(1, 9)]
    g = Graph.from_edge_list(spark, edges, weighted=True, num_nodes=9)
    algo = MaxentStress(
        g, dim=2, k=1, tolerance=1e-5, fast_computation=True,
        max_solves_per_alpha=1, seed=5,
    )
    algo.set_alpha(1e-3)
    algo.run()
    assert algo.q == 0.8
    pos = {int(r["id"]): list(r["pos"]) for r in algo.coordinates().collect()}
    assert len(pos) == 9
    assert all(np.isfinite(p).all() for p in map(np.array, pos.values()))


def test_maxent_disconnected_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], num_nodes=4)
    with pytest.raises(ValueError, match="not connected"):
        MaxentStress(g, dim=2, k=1).run()


def test_maxent_algebraic_distance_mode(spark):
    g = _grid_graph(spark)
    algo = MaxentStress(
        g, dim=2, k=2, tolerance=1e-5,
        graph_distance=MaxentStress.ALGEBRAIC_DISTANCE,
        fast_computation=True, max_solves_per_alpha=1, seed=9,
    )
    algo.set_alpha(1e-3)
    algo.run()
    # S distances live in the log-remap range [ln 2, ln 13]
    ds = [float(r["d"]) for r in algo._known.collect()]
    assert ds and all(
        np.log(2.0) - 1e-9 <= d <= np.log(13.0) + 1e-9 for d in ds
    )
    pos = {int(r["id"]): list(r["pos"]) for r in algo.coordinates().collect()}
    assert len(pos) == NG
    assert all(np.isfinite(p).all() for p in map(np.array, pos.values()))


def test_maxent_default_loop_shape(spark):
    # fast_computation=False (the default): convergence inside an alpha
    # level is deliberately discarded (converged -> False, keep
    # solving), the rhs-normalization cutoff max_solves_per_alpha//5
    # covers solve 0 only, and the repulsive refresh follows the
    # floor(5 ln s) schedule across TWO alpha levels (current_lb
    # carries over)
    g = _grid_graph(spark)
    pm = PivotMDS(g, dim=2, num_pivots=4, seed=3).run()
    algo = MaxentStress(
        g, dim=2, k=1, tolerance=1e-5,
        coordinates=pm.coordinates(), fast_computation=False,
        max_solves_per_alpha=3,
    )
    algo.set_alpha(0.03)  # levels: 0.03, 0.009 -> stop (0.0027 < 0.008)
    algo.run()
    pos = {int(r["id"]): list(r["pos"]) for r in algo.coordinates().collect()}
    assert len(pos) == NG
    assert all(np.isfinite(p).all() for p in map(np.array, pos.values()))
    assert algo.mean_distance_error() < 0.5
