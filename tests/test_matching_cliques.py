"""LocalMaxMatcher + MaximalCliques vs in-test brute force."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.operators.cliques import MaximalCliques
from networkit_spark.operators.matching import LocalMaxMatcher


def _graph(spark, rows):
    return Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=False,
        weighted=True,
    )


# ------------------------------------------------------------- matching
def _local_max_reference(edges):
    """Sequential local-max with the SAME deterministic tie order
    (w, min, max) — mirrors LocalMaxMatcher.cpp rounds."""
    remaining = {(min(u, v), max(u, v)): w for u, v, w in edges if u != v}
    matched = {}
    while remaining:
        best = {}
        for (u, v), w in remaining.items():
            k = (w, u, v)
            for x in (u, v):
                if x not in best or k > best[x]:
                    best[x] = k
        agree = [
            (u, v, w)
            for (u, v), w in remaining.items()
            if best[u] == (w, u, v) and best[v] == (w, u, v)
        ]
        for u, v, w in agree:
            matched[(u, v)] = w
        gone = {x for u, v, _ in agree for x in (u, v)}
        remaining = {
            (u, v): w
            for (u, v), w in remaining.items()
            if u not in gone and v not in gone
        }
    return matched


def test_matching_matches_reference_rounds(spark):
    edges = [
        (0, 1, 5.0), (1, 2, 3.0), (2, 3, 4.0), (3, 4, 2.0),
        (4, 5, 6.0), (0, 5, 1.0), (1, 4, 2.5),
    ]
    exp = _local_max_reference(edges)
    m = LocalMaxMatcher(_graph(spark, edges)).run()
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in m.get_matching().collect()
    }
    assert got == exp
    assert m.matching_weight() == pytest.approx(sum(exp.values()))


def test_matching_is_valid_and_maximal_random(spark):
    rng = random.Random(3)
    n = 20
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(50))
            if a != b
        }
    )
    rows = [(u, v, float(rng.randint(1, 9))) for u, v in edges]
    m = LocalMaxMatcher(_graph(spark, rows)).run()
    got = [(r["src"], r["dst"]) for r in m.get_matching().collect()]
    # validity: no node twice
    flat = [x for e in got for x in e]
    assert len(flat) == len(set(flat))
    # maximality: every remaining edge touches a matched node
    matched_nodes = set(flat)
    for u, v, _ in rows:
        assert u in matched_nodes or v in matched_nodes
    # parity with the sequential reference rounds
    exp = _local_max_reference(rows)
    assert set(got) == set(exp)


def test_matching_directed_raises(spark):
    df = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    with pytest.raises(ValueError):
        LocalMaxMatcher(Graph(df, directed=True, weighted=True))


# -------------------------------------------------------------- cliques
def _brute_maximal_cliques(nodes, edges):
    adj = {u: set() for u in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    out = set()
    for r in range(1, len(nodes) + 1):
        for comb in itertools.combinations(sorted(nodes), r):
            s = set(comb)
            if all(v in adj[u] for u, v in itertools.combinations(comb, 2)):
                if not any(all(x in adj[w] for x in comb) for w in nodes if w not in s):
                    out.add(frozenset(comb))
    return out


CLIQUE_CASES = {
    "triangle_plus_tail": [(0, 1), (1, 2), (0, 2), (2, 3)],
    "k4": [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
    "two_triangles_shared_edge": [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)],
    "path": [(0, 1), (1, 2), (2, 3)],
}


@pytest.mark.parametrize("name", sorted(CLIQUE_CASES))
def test_cliques_match_bruteforce(spark, name):
    edges = CLIQUE_CASES[name]
    nodes = sorted({x for e in edges for x in e})
    exp = _brute_maximal_cliques(nodes, edges)
    mc = MaximalCliques(_graph(spark, [(u, v, 1.0) for u, v in edges])).run()
    got = {frozenset(r["c"]) for r in mc.get_cliques().collect()}
    assert got == exp
    assert mc.number_of_cliques() == len(exp)
    assert mc.max_clique_size_found() == max(len(c) for c in exp)


def test_cliques_random(spark):
    rng = random.Random(11)
    n = 12
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(36))
            if a != b
        }
    )
    nodes = list(range(n))  # include possible isolated vertices
    exp = _brute_maximal_cliques(nodes, edges)
    g = Graph(
        spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
        ),
        directed=False,
        weighted=True,
        vertices=spark.createDataFrame([(i,) for i in nodes], "id long"),
    )
    mc = MaximalCliques(g).run()
    got = {frozenset(r["c"]) for r in mc.get_cliques().collect()}
    assert got == exp
