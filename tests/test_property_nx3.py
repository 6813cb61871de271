"""Property-based cross-validation vs networkx, batch 5: closeness
(generalized/wf-improved), harmonic closeness, per-edge effective
resistance (SpanningEdgeCentrality), matching validity/maximality,
Luby independent-set validity/maximality, directed reachability, and
simple-path enumeration.

Same harness discipline as ``test_property_nx.py``: hypothesis draws
small random edge lists, networkx is the INDEPENDENT implementation,
and only invariants whose semantics the reference and networkx define
identically are compared.  Closeness is compared in its *generalized
normalized* form, which is exactly networkx's Wasserman–Faust
``closeness_centrality`` ((reached−1)²/(Σd·(n−1)), ``Closeness.cpp:
78-93``)."""

import math

import pytest

try:
    import networkx as nx
except ImportError:  # pragma: no cover
    pytest.skip("networkx not installed", allow_module_level=True)

from hypothesis import HealthCheck, given, settings, strategies as st

from networkit_spark import (
    Closeness,
    Graph,
    HarmonicCloseness,
    LocalMaxMatcher,
    Luby,
)
from networkit_spark.operators.algebraic import SpanningEdgeCentrality
from networkit_spark.operators.independentset import is_independent_set, is_maximal
from networkit_spark.operators.reachability import AllSimplePaths, ReachableNodes

N_MAX = 10

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=N_MAX - 1),
        st.integers(min_value=0, max_value=N_MAX - 1),
    ),
    min_size=1,
    max_size=20,
)

PROP = settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _simple(edges):
    return sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})


def _graphs(spark, edges):
    es = _simple(edges)
    if not es:
        return None, None
    n = max(max(u, v) for u, v in es) + 1
    g = Graph.from_edge_list(spark, es, num_nodes=n)
    nxg = nx.Graph()
    nxg.add_nodes_from(range(n))
    nxg.add_edges_from(es)
    return g, nxg


def _digraphs(spark, edges):
    es = sorted({(u, v) for u, v in edges if u != v})
    if not es:
        return None, None
    n = max(max(u, v) for u, v in es) + 1
    g = Graph.from_edge_list(spark, es, directed=True, num_nodes=n)
    nxg = nx.DiGraph()
    nxg.add_nodes_from(range(n))
    nxg.add_edges_from(es)
    return g, nxg


@given(edges=edge_lists)
@PROP
def test_generalized_closeness_matches_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    got = {
        r["id"]: r["score"]
        for r in Closeness(g, normalized=True, variant="generalized")
        .run()
        .scores()
        .collect()
    }
    want = nx.closeness_centrality(nxg)
    assert set(got) == set(want)
    for node, s in want.items():
        assert got[node] == pytest.approx(s, abs=1e-9)


@given(edges=edge_lists)
@PROP
def test_harmonic_closeness_matches_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    got = {
        r["id"]: r["score"]
        for r in HarmonicCloseness(g, normalized=False).run().scores().collect()
    }
    want = nx.harmonic_centrality(nxg)
    assert set(got) == set(want)
    for node, s in want.items():
        assert got[node] == pytest.approx(s, abs=1e-9)


@given(edges=edge_lists)
@PROP
def test_spanning_edge_centrality_matches_resistance(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None or not nx.is_connected(nxg) or nxg.number_of_edges() < 1:
        return
    sec = SpanningEdgeCentrality(g, tol=1e-9).run()
    got = {(r["u"], r["v"]): r["score"] for r in sec.edge_scores().collect()}
    for (u, v), score in got.items():
        want = nx.resistance_distance(nxg, u, v)
        assert score == pytest.approx(want, rel=1e-4, abs=1e-6)


@given(edges=edge_lists)
@PROP
def test_local_max_matching_is_valid_and_maximal(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    m = LocalMaxMatcher(g).run().get_matching().collect()
    matched = {(r["src"], r["dst"]) for r in m}
    assert nx.is_matching(nxg, matched)
    assert nx.is_maximal_matching(nxg, matched)


@given(edges=edge_lists)
@PROP
def test_luby_set_is_independent_and_maximal(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    luby = Luby(g, seed=7).run()
    members = luby.members()
    assert is_independent_set(g, members)
    assert is_maximal(g, members)
    # cross-check independence + maximality against the nx adjacency too
    mem = {r["id"] for r in members.collect()}
    for u, v in nxg.edges:
        assert not (u in mem and v in mem)
    for v in nxg:
        assert v in mem or any(w in mem for w in nxg[v])


@given(edges=edge_lists)
@PROP
def test_reachable_nodes_match_networkx_descendants(spark, edges):
    g, nxg = _digraphs(spark, edges)
    if g is None:
        return
    got = {
        r["id"]: r["r"]
        for r in ReachableNodes(g, exact=True).run().get_reachable_nodes().collect()
    }
    for v in nxg:
        assert got[v] == len(nx.descendants(nxg, v)) + 1


@given(edges=edge_lists)
@PROP
def test_all_simple_paths_match_networkx(spark, edges):
    g, nxg = _digraphs(spark, edges)
    if g is None or nxg.number_of_nodes() < 2:
        return
    source, target = 0, max(nxg.nodes)
    asp = AllSimplePaths(g, source=source, target=target).run()
    got = sorted(tuple(r["path"]) for r in asp.get_all_paths().collect())
    want = sorted(tuple(p) for p in nx.all_simple_paths(nxg, source, target))
    assert got == want
