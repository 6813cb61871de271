"""Property-based cross-validation vs networkx, batch 7: batched APSP,
bidirectional s–t searches, the Jaccard/Adamic-Adar *edge distance*
scores, the exact neighborhood function, and ReverseBFS on directed
graphs.

Same harness discipline as ``test_property_nx.py``: hypothesis draws
small random edge lists, networkx is the INDEPENDENT implementation,
and only invariants whose semantics the reference and networkx define
identically are compared."""

import math

import pytest

try:
    import networkx as nx
except ImportError:  # pragma: no cover
    pytest.skip("networkx not installed", allow_module_level=True)

from hypothesis import HealthCheck, given, settings, strategies as st

from networkit_spark import APSP, Graph
from networkit_spark.operators.distance import NeighborhoodFunction, ReverseBFS
from networkit_spark.operators.distance_extras import (
    BidirectionalBFS,
    BidirectionalDijkstra,
    adamic_adar_distance_scores,
    jaccard_distance_scores,
)

N_MAX = 10

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=N_MAX - 1),
        st.integers(min_value=0, max_value=N_MAX - 1),
        st.integers(min_value=1, max_value=5),
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
    seen = {}
    for u, v, w in edges:
        if u == v:
            continue
        seen.setdefault((min(u, v), max(u, v)), w)
    return sorted((u, v, w) for (u, v), w in seen.items())


def _graphs(spark, edges, weighted=False):
    es = _simple(edges)
    if not es:
        return None, None
    n = max(max(u, v) for u, v, _ in es) + 1
    if weighted:
        g = Graph.from_edge_list(spark, es, weighted=True, num_nodes=n)
    else:
        g = Graph.from_edge_list(spark, [(u, v) for u, v, _ in es], num_nodes=n)
    nxg = nx.Graph()
    nxg.add_nodes_from(range(n))
    for u, v, w in es:
        nxg.add_edge(u, v, weight=float(w))
    return g, nxg


@given(edges=edge_lists)
@PROP
def test_apsp_matches_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    got = {
        (r["source"], r["id"]): r["dist"]
        for r in APSP(g).run().distances().collect()
    }
    want = {
        (s, t): d
        for s, lengths in nx.all_pairs_shortest_path_length(nxg)
        for t, d in lengths.items()
    }
    assert got == want


@given(edges=edge_lists)
@PROP
def test_bidirectional_searches_match_networkx(spark, edges):
    g_u, nxg = _graphs(spark, edges)
    g_w, _ = _graphs(spark, edges, weighted=True)
    if g_u is None or nxg.number_of_nodes() < 2:
        return
    s, t = 0, max(nxg.nodes)
    hop = BidirectionalBFS(g_u, source=s, target=t).run().get_distance()
    wdist = BidirectionalDijkstra(g_w, source=s, target=t).run().get_distance()
    if nx.has_path(nxg, s, t):
        assert hop == nx.shortest_path_length(nxg, s, t)
        assert wdist == pytest.approx(
            nx.shortest_path_length(nxg, s, t, weight="weight"), abs=1e-9
        )
    else:
        assert math.isinf(hop)
        assert math.isinf(wdist)


@given(edges=edge_lists)
@PROP
def test_edge_distance_scores_match_manual_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    jac = {(r["u"], r["v"]): r["score"] for r in jaccard_distance_scores(g).collect()}
    aad = {
        (r["u"], r["v"]): r["score"]
        for r in adamic_adar_distance_scores(g).collect()
    }
    assert set(jac) == set(aad) == {tuple(sorted(e)) for e in nxg.edges}
    for (u, v) in jac:
        cn = set(nxg[u]) & set(nxg[v])
        du, dv = nxg.degree(u), nxg.degree(v)
        want_jac = 1.0 - len(cn) / (du + dv - len(cn))
        assert jac[(u, v)] == pytest.approx(want_jac, abs=1e-9)
        denom = sum(1.0 / math.log(nxg.degree(w)) for w in cn)
        if denom > 0:
            assert aad[(u, v)] == pytest.approx(1.0 / denom, abs=1e-9)
        else:
            assert math.isinf(aad[(u, v)])


@given(edges=edge_lists)
@PROP
def test_neighborhood_function_matches_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None or not nx.is_connected(nxg) or nxg.number_of_nodes() < 2:
        return
    got = NeighborhoodFunction(g).run().get_neighborhood_function()
    dists = [
        d
        for s, lengths in nx.all_pairs_shortest_path_length(nxg)
        for t, d in lengths.items()
        if d > 0
    ]
    want = [sum(1 for d in dists if d <= h) for h in range(1, max(dists) + 1)]
    assert got == want


@given(edges=edge_lists)
@PROP
def test_reverse_bfs_matches_networkx_reverse(spark, edges):
    es = sorted({(u, v) for u, v, _ in edges if u != v})
    if not es:
        return
    n = max(max(u, v) for u, v in es) + 1
    g = Graph.from_edge_list(spark, es, directed=True, num_nodes=n)
    nxg = nx.DiGraph()
    nxg.add_nodes_from(range(n))
    nxg.add_edges_from(es)
    got = {
        r["id"]: r["dist"]
        for r in ReverseBFS(g, source=0).run().distances().collect()
    }
    want = nx.single_source_shortest_path_length(nxg.reverse(copy=True), 0)
    assert got == want
