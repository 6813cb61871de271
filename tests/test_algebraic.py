"""Laplacian solves and effective-resistance operators
(``cpp/distance/CommuteTimeDistance.cpp``,
``cpp/centrality/SpanningEdgeCentrality.cpp``,
``ApproxElectricalCloseness``) vs numpy pseudoinverse goldens."""

import math

import numpy as np
import pytest

from networkit_spark import Graph
from networkit_spark.operators.algebraic import (
    CommuteTimeDistance,
    SpanningEdgeCentrality,
    electrical_closeness,
    laplacian_cg_solve,
)

EDGES = [
    (0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 0, 1.0), (0, 2, 1.0),
    (3, 4, 2.0),
]
N = 5


def _lpinv():
    L = np.zeros((N, N))
    for u, v, w in EDGES:
        L[u, u] += w
        L[v, v] += w
        L[u, v] -= w
        L[v, u] -= w
    return np.linalg.pinv(L), L


def _g(spark):
    return Graph.from_edge_list(spark, EDGES, directed=False, weighted=True)


def test_cg_solve_matches_pinv(spark):
    g = _g(spark)
    lp, _ = _lpinv()
    rhs = spark.createDataFrame(
        [(0, 0, 1.0), (0, 3, -1.0), (1, 2, 1.0), (1, 4, -1.0)],
        "sys long, id long, b double",
    )
    sol = {
        (r["sys"], r["id"]): r["x"]
        for r in laplacian_cg_solve(g, rhs).collect()
    }
    b0 = np.zeros(N); b0[0], b0[3] = 1, -1
    b1 = np.zeros(N); b1[2], b1[4] = 1, -1
    for sysid, b in ((0, b0), (1, b1)):
        x = lp @ b
        x -= x.mean()
        for i in range(N):
            assert sol[(sysid, i)] == pytest.approx(x[i], abs=1e-7)


def test_commute_time_exact(spark):
    g = _g(spark)
    lp, _ = _lpinv()
    vol = 2 * sum(w for _, _, w in EDGES)
    ctd = CommuteTimeDistance(g).run()
    for u, v in [(0, 3), (1, 4), (2, 3)]:
        want = math.sqrt((lp[u, u] + lp[v, v] - 2 * lp[u, v]) * vol)
        assert ctd.distance(u, v) == pytest.approx(want, rel=1e-6)
    dists = {
        (r["u"], r["v"]): r["dist"] for r in ctd.get_distances().collect()
    }
    assert len(dists) == N * (N - 1) // 2
    assert dists[(0, 3)] == pytest.approx(ctd.distance(0, 3), rel=1e-9)


def test_commute_time_approximation(spark):
    g = _g(spark)
    lp, _ = _lpinv()
    vol = 2 * sum(w for _, _, w in EDGES)
    ctd = CommuteTimeDistance(g, tol=0.25).run_approximation()
    for u, v in [(0, 3), (3, 4)]:
        want = math.sqrt((lp[u, u] + lp[v, v] - 2 * lp[u, v]) * vol)
        got = ctd.distance(u, v)
        assert got == pytest.approx(want, rel=0.5), f"({u},{v})"


def test_spanning_edge_centrality(spark):
    g = _g(spark)
    lp, _ = _lpinv()
    sec = SpanningEdgeCentrality(g).run()
    got = {(r["u"], r["v"]): r["score"] for r in sec.edge_scores().collect()}
    for u, v, _w in EDGES:
        want = lp[u, u] + lp[v, v] - 2 * lp[u, v]
        assert got[(min(u, v), max(u, v))] == pytest.approx(want, abs=1e-7)
    # bridge edge (3,4) has effective resistance = 1/w = 0.5
    assert got[(3, 4)] == pytest.approx(0.5, abs=1e-7)
    approx = SpanningEdgeCentrality(g, tol=0.3).run_approximation()
    ga = {(r["u"], r["v"]): r["score"] for r in approx.edge_scores().collect()}
    for u, v, _w in EDGES:
        want = lp[u, u] + lp[v, v] - 2 * lp[u, v]
        assert ga[(min(u, v), max(u, v))] == pytest.approx(want, rel=0.6), (
            f"({u},{v})"
        )


def test_electrical_closeness(spark):
    g = _g(spark)
    lp, _ = _lpinv()
    tr = np.trace(lp)
    got = {r["id"]: r["score"] for r in electrical_closeness(g).collect()}
    for u in range(N):
        want = (N - 1) / (N * lp[u, u] + tr)
        assert got[u] == pytest.approx(want, rel=1e-6)
    # Hutchinson estimator: right ballpark, deterministic per seed
    est = {
        r["id"]: r["score"]
        for r in electrical_closeness(
            g, exact=False, n_systems=64, seed=2
        ).collect()
    }
    for u in range(N):
        want = (N - 1) / (N * lp[u, u] + tr)
        assert est[u] == pytest.approx(want, rel=0.6)


def test_cg_guards(spark):
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError, match="undirected"):
        laplacian_cg_solve(gd, None)
    g2 = Graph.from_edge_list(spark, [(0, 1, 1.0), (2, 3, 1.0)],
                              directed=False, weighted=True)
    rhs = g2.edges.sparkSession.createDataFrame(
        [(0, 0, 1.0), (0, 2, -1.0)], "sys long, id long, b double"
    )
    with pytest.raises(RuntimeError, match="connected"):
        laplacian_cg_solve(g2, rhs, max_iters=20)


def test_cg_diagonal_preconditioner_matches_pinv(spark):
    # Jacobi PCG (the reference's DiagonalPreconditioner config) solves
    # the same systems to the same pseudoinverse solution
    g = _g(spark)
    lp, _ = _lpinv()
    rhs = spark.createDataFrame(
        [(0, 0, 1.0), (0, 3, -1.0), (1, 2, 1.0), (1, 4, -1.0)],
        "sys long, id long, b double",
    )
    sol = {
        (r["sys"], r["id"]): r["x"]
        for r in laplacian_cg_solve(
            g, rhs, preconditioner="diagonal"
        ).collect()
    }
    b0 = np.zeros(N); b0[0], b0[3] = 1, -1
    b1 = np.zeros(N); b1[2], b1[4] = 1, -1
    for sysid, b in ((0, b0), (1, b1)):
        x = lp @ b
        x -= x.mean()
        for i in range(N):
            assert sol[(sysid, i)] == pytest.approx(x[i], abs=1e-7)
    import pytest as _pt
    with _pt.raises(ValueError, match="preconditioner"):
        laplacian_cg_solve(g, rhs, preconditioner="ilu")
