"""Geometric generators (PubWeb / MocnikBasic) + EdgeSwitchingMarkovChain.

Golden strategy: collect the SAME seeded point set the operator uses,
re-run the reference's sequential neighbor rule faithfully in-test
(priority-queue semantics of ``PubWebGenerator::determineNeighbors``,
``MocnikGeneratorBasic::generate``'s distMin thresholding), and require
exact edge-set equality — the distributed grid-join / aggregation
reformulations must reproduce the sequential algorithms bit-for-bit on
the shared coordinates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.generators import (
    edge_switching_markov_chain,
    havel_hakimi,
    mocnik_basic,
    mocnik_points,
    pub_web,
    pub_web_points,
)


def _torus_sqdist_py(p, q):
    s = 0.0
    for a, b in zip(p, q):
        d = a - b
        if d > 0.5:
            d = 1.0 - d
        elif d < -0.5:
            d = d + 1.0
        s += d * d
    return s


def _pub_web_reference_edges(pts: dict, radius: float, max_neigh: int):
    """Faithful re-run of PubWebGenerator::determineNeighbors
    (PubWebGenerator.cpp:47-87): per node, a max-heap of
    ``(-sqrDist, canonical pair)`` over ALL in-range nodes (self
    included — the distance-0 self pair always occupies one slot);
    pop min(maxNeigh, size) entries; an edge materializes on the
    SECOND pop of the same canonical pair, weighted 0.01/sqrDist."""
    sqr = radius * radius
    eligible = set()
    edges = {}
    ids = sorted(pts)
    for u in ids:
        items = []
        for v in ids:
            d = _torus_sqdist_py(pts[u], pts[v])
            if d <= sqr:
                items.append((-d, (min(u, v), max(u, v))))
        # std::priority_queue<pair> pops the lexicographically largest
        # (-sqrDist, edge) first: nearest first, ties → larger pair
        items.sort(reverse=True)
        for negd, e in items[:max_neigh]:
            if e in eligible:
                edges[e] = 0.01 / (-negd)
            else:
                eligible.add(e)
    return edges


def test_pub_web_matches_reference_neighbor_rule(spark):
    n, areas, rad, k, seed = 220, 4, 0.15, 8, 7
    pts_df = pub_web_points(spark, n, num_dense_areas=areas, seed=seed)
    pts = {r["id"]: (r["x"], r["y"]) for r in pts_df.collect()}
    assert len(pts) >= n
    assert all(0.0 <= x <= 1.0 and 0.0 <= y <= 1.0 for x, y in pts.values())

    want = _pub_web_reference_edges(pts, rad, k)

    g = pub_web(
        spark,
        n,
        num_dense_areas=areas,
        neighborhood_radius=rad,
        max_neighbors=k,
        seed=seed,
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in g.edges.select("src", "dst", "weight").collect()
    }
    assert set(got) == set(want)
    for e, w in want.items():
        assert got[e] == pytest.approx(w, rel=1e-12)
    # mutual-kNN bound: no vertex exceeds max_neighbors-1 real
    # neighbors (the self pair consumes one of the k slots)
    deg = (
        g.edges.select(F.col("src").alias("id"))
        .unionAll(g.edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .count()
    )
    assert deg.agg(F.max("count")).collect()[0][0] <= k - 1


def test_pub_web_deterministic(spark):
    a = pub_web(spark, 150, seed=3).edges.collect()
    b = pub_web(spark, 150, seed=3).edges.collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.mark.parametrize("dim", [2, 3])
def test_mocnik_matches_reference_rule(spark, dim):
    n, k, seed = 120, 2.5, 11
    pts_df = mocnik_points(spark, n, dim=dim, seed=seed)
    rows = pts_df.collect()
    assert len(rows) == n
    pts = {r["id"]: tuple(r[f"x{j}"] for j in range(dim)) for r in rows}
    # every point inside the ball B_0.5(0.5, …)
    for p in pts.values():
        assert sum((z - 0.5) ** 2 for z in p) < 0.25

    def dist(u, v):
        return sum((a - b) ** 2 for a, b in zip(pts[u], pts[v])) ** 0.5

    want = set()
    for u in pts:
        dmin = min(dist(u, v) for v in pts if v != u)
        for v in pts:
            if v != u and dist(u, v) <= k * dmin:
                want.add((u, v))

    g = mocnik_basic(spark, n, k=k, dim=dim, seed=seed)
    assert g.directed
    got = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    assert got == want
    # distMin edge always present: every node has out-degree >= 1
    assert len({u for u, _ in got}) == n


def test_mocnik_validates_k(spark):
    with pytest.raises(ValueError):
        mocnik_basic(spark, 10, k=1.0)


def test_edge_switching_preserves_degrees_and_simplicity(spark):
    degrees = [5, 4, 4, 3, 3, 3, 2, 2, 2, 2, 1, 1]
    g = edge_switching_markov_chain(spark, degrees, seed=5)
    rows = g.edges.select("src", "dst").collect()
    # simple: no loops, no duplicate undirected edges
    assert all(r["src"] != r["dst"] for r in rows)
    pairs = [(min(r["src"], r["dst"]), max(r["src"], r["dst"])) for r in rows]
    assert len(pairs) == len(set(pairs))
    # exact degree sequence preserved through every switch
    deg = {i: 0 for i in range(len(degrees))}
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    assert [deg[i] for i in range(len(degrees))] == degrees
    # the chain actually moved off the Havel-Hakimi start
    hh = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in havel_hakimi(spark, degrees).edges.collect()
    }
    assert set(pairs) != hh
    # deterministic
    g2 = edge_switching_markov_chain(spark, degrees, seed=5)
    pairs2 = [
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g2.edges.select("src", "dst").collect()
    ]
    assert sorted(pairs) == sorted(pairs2)


def test_mocnik_improved_layers_and_weights(spark):
    from networkit_spark.generators import mocnik, mocnik_basic, mocnik_points

    # single unweighted layer == the basic generator exactly
    g1 = mocnik(spark, dim=2, ns=30, ks=2.5, seed=3)
    gb = mocnik_basic(spark, n=30, k=2.5, dim=2, seed=3)
    e1 = {(r["src"], r["dst"]) for r in g1.edges.collect()}
    eb = {(r["src"], r["dst"]) for r in gb.edges.collect()}
    assert e1 == eb

    # two layers + weighted: brute-force the reference semantics from
    # the same point set (layer j = first ns[j] nodes, k = ks[j],
    # weight = dist * rel[j], base layer wins conflicts)
    import math

    ns, ks, rel = [20, 30], [1.5, 2.5], [2.0, 1.0]
    pts = {
        int(r["id"]): (float(r["x0"]), float(r["x1"]))
        for r in mocnik_points(spark, 30, 2, 3).collect()
    }
    expect = {}
    for n_l, k_l, rw in zip(ns, ks, rel):
        for i in range(n_l):
            dmin = min(
                math.dist(pts[i], pts[j]) for j in range(n_l) if j != i
            )
            for j in range(n_l):
                d = math.dist(pts[i], pts[j])
                if i != j and d <= k_l * dmin and (i, j) not in expect:
                    expect[(i, j)] = d * rw
    g2 = mocnik(spark, dim=2, ns=ns, ks=ks, weighted=rel, seed=3)
    got = {
        (r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()
    }
    assert set(got) == set(expect)
    for e in expect:
        assert abs(got[e] - expect[e]) < 1e-9

    import pytest

    with pytest.raises(ValueError):
        mocnik(spark, dim=2, ns=[10, 20], ks=[2.0], seed=3)
    with pytest.raises(ValueError):
        mocnik(spark, dim=2, ns=10, ks=0.5, seed=3)
