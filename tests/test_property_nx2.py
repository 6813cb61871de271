"""Property-based cross-validation vs networkx, batch 4: weighted
shortest paths, max-flow, biconnected components, the closed-form
link-prediction indices, commute-time distance (vs resistance
distance), modularity, and the global/average clustering coefficients.

Same harness discipline as ``test_property_nx.py``: hypothesis draws
small random edge lists, networkx is the INDEPENDENT implementation
(not our own oracle SQL), and only invariants whose semantics the
reference and networkx define identically are compared."""

import math

import pytest

try:
    import networkx as nx
except ImportError:  # pragma: no cover
    pytest.skip("networkx not installed", allow_module_level=True)

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from networkit_spark import (
    BiconnectedComponents,
    CommuteTimeDistance,
    Dijkstra,
    EdmondsKarp,
    Graph,
    GlobalClusteringCoefficient,
)
from networkit_spark.operators.linkprediction import link_prediction_scores
from networkit_spark.operators.quality import modularity

N_MAX = 10

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=N_MAX - 1),
        st.integers(min_value=0, max_value=N_MAX - 1),
        st.integers(min_value=1, max_value=5),  # integral weights: exact sums
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
    """Simple undirected weighted edge list (no self-loops; first weight
    wins on duplicates) both ways."""
    seen = {}
    for u, v, w in edges:
        if u == v:
            continue
        key = (min(u, v), max(u, v))
        seen.setdefault(key, w)
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
        nxg.add_edge(u, v, weight=float(w), capacity=float(w))
    return g, nxg


@given(edges=edge_lists)
@PROP
def test_dijkstra_matches_networkx(spark, edges):
    g, nxg = _graphs(spark, edges, weighted=True)
    if g is None:
        return
    got = {
        r["id"]: r["dist"]
        for r in Dijkstra(g, source=0).run().distances().collect()
    }
    want = nx.single_source_dijkstra_path_length(nxg, 0, weight="weight")
    assert set(got) == set(want)
    for node, d in want.items():
        assert got[node] == pytest.approx(d, abs=1e-9)


@given(edges=edge_lists)
@PROP
def test_max_flow_matches_networkx(spark, edges):
    g, nxg = _graphs(spark, edges, weighted=True)
    if g is None:
        return
    n = nxg.number_of_nodes()
    if n < 2:
        return
    source, sink = 0, n - 1
    got = EdmondsKarp(g, source=source, sink=sink).run().get_max_flow()
    want, _ = nx.maximum_flow(nxg, source, sink, capacity="capacity")
    assert got == pytest.approx(want, abs=1e-9)


@given(edges=edge_lists)
@PROP
def test_biconnected_components_match_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    bcc = BiconnectedComponents(g).run()
    got_rows = bcc.edge_components().collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["block"], set()).add((r["u"], r["v"]))
    got_blocks = {frozenset(s) for s in got.values()}
    want_blocks = {
        frozenset((min(u, v), max(u, v)) for u, v in comp)
        for comp in nx.biconnected_component_edges(nxg)
    }
    assert got_blocks == want_blocks
    assert bcc.number_of_components() == len(want_blocks)


@given(edges=edge_lists)
@PROP
def test_link_prediction_indices_match_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    non_edges = sorted(
        (min(u, v), max(u, v)) for u, v in nx.non_edges(nxg)
    )
    if not non_edges:
        return
    pairs = spark.createDataFrame(non_edges, schema="u long, v long")
    got = {
        (r["u"], r["v"]): r
        for r in link_prediction_scores(g, pairs).collect()
    }
    jac = {(u, v): s for u, v, s in nx.jaccard_coefficient(nxg, non_edges)}
    aa = {(u, v): s for u, v, s in nx.adamic_adar_index(nxg, non_edges)}
    pa = {(u, v): s for u, v, s in nx.preferential_attachment(nxg, non_edges)}
    ra = {(u, v): s for u, v, s in nx.resource_allocation_index(nxg, non_edges)}
    assert set(got) == set(non_edges)
    for p in non_edges:
        r = got[p]
        cn = len(set(nxg[p[0]]) & set(nxg[p[1]]))
        assert r["common_neighbors"] == cn
        # scores are rounded to 6 decimals for oracle hash stability
        assert r["jaccard"] == pytest.approx(jac[p], abs=1e-6)
        assert r["adamic_adar"] == pytest.approx(aa[p], abs=1e-6)
        assert r["pref_attachment"] == pytest.approx(pa[p], abs=1e-6)
        assert r["resource_allocation"] == pytest.approx(ra[p], abs=1e-6)


@given(edges=edge_lists)
@PROP
def test_commute_time_matches_resistance_distance(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None or not nx.is_connected(nxg) or nxg.number_of_nodes() < 2:
        return
    ctd = CommuteTimeDistance(g, tol=1e-9).run()
    vol = 2.0 * nxg.number_of_edges()
    # spot-check the extreme pair plus one interior pair (full n² frame
    # is covered by get_distances' own pytest)
    n = nxg.number_of_nodes()
    for u, v in {(0, n - 1), (0, n // 2)}:
        if u == v:
            continue
        want = math.sqrt(vol * nx.resistance_distance(nxg, u, v))
        assert ctd.distance(u, v) == pytest.approx(want, rel=1e-4, abs=1e-6)


@given(edges=edge_lists)
@PROP
def test_modularity_matches_networkx(spark, edges):
    g, nxg = _graphs(spark, edges, weighted=True)
    if g is None:
        return
    n = nxg.number_of_nodes()
    labels = spark.createDataFrame(
        [(i, i % 3) for i in range(n)], schema="id long, label long"
    )
    communities = [
        {i for i in range(n) if i % 3 == c} for c in range(3)
    ]
    communities = [c for c in communities if c]
    got = modularity(g, labels)
    want = nx.algorithms.community.modularity(nxg, communities, weight="weight")
    assert got == pytest.approx(want, abs=1e-9)


@given(edges=edge_lists)
@PROP
def test_clustering_coefficients_match_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    gcc = GlobalClusteringCoefficient(g).run()
    assert gcc.exact_global() == pytest.approx(nx.transitivity(nxg), abs=1e-9)
    local = nx.clustering(nxg)
    eligible = [local[v] for v in nxg if nxg.degree(v) >= 2]
    want_avg = sum(eligible) / len(eligible) if eligible else 0.0
    assert gcc.avg_local() == pytest.approx(want_avg, abs=1e-9)
