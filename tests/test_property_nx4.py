"""Property-based cross-validation vs networkx, batch 6: eigenvector
centrality, Katz centrality (via networkx's per-node-beta form), and
max-flow/min-cut duality of the EdmondsKarp source set.

The Katz mapping: the reference iterates ``val[u] = Σ_v α·w·(1 +
score[v]) + β`` (``KatzCentrality.cpp:15-77``), whose fixpoint is
``x = αAx + (β + α·deg)`` — i.e. networkx ``katz_centrality`` with the
per-node beta dict ``beta[u] = β + α·deg(u)`` and L2 normalization.
Eigenvector centrality is plain L2-normalized power iteration on both
sides; comparisons are restricted to connected non-bipartite graphs
(power iteration oscillates on bipartite spectra)."""

import pytest

try:
    import networkx as nx
except ImportError:  # pragma: no cover
    pytest.skip("networkx not installed", allow_module_level=True)

from hypothesis import HealthCheck, given, settings, strategies as st

from networkit_spark import (
    EdmondsKarp,
    EigenvectorCentrality,
    Graph,
    KatzCentrality,
)

N_MAX = 9

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=N_MAX - 1),
        st.integers(min_value=0, max_value=N_MAX - 1),
        st.integers(min_value=1, max_value=4),
    ),
    min_size=1,
    max_size=18,
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
        nxg.add_edge(u, v, weight=float(w), capacity=float(w))
    return g, nxg


@given(edges=edge_lists)
@PROP
def test_eigenvector_centrality_matches_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if (
        g is None
        or not nx.is_connected(nxg)
        or nx.is_bipartite(nxg)
        or nxg.number_of_edges() < 1
    ):
        return
    got = {
        r["id"]: r["score"]
        for r in EigenvectorCentrality(g, tol=1e-12).run().scores().collect()
    }
    want = nx.eigenvector_centrality(nxg, max_iter=10_000, tol=1e-12)
    # nx normalizes L2 too; both vectors are positive for connected graphs
    for node, s in want.items():
        assert got[node] == pytest.approx(s, abs=1e-5)


@given(edges=edge_lists)
@PROP
def test_katz_centrality_matches_networkx_affine_form(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None or nxg.number_of_edges() < 1:
        return
    maxdeg = max(dict(nxg.degree).values())
    alpha = 1.0 / (1.0 + maxdeg)
    beta = 0.1
    got = {
        r["id"]: r["score"]
        for r in KatzCentrality(g, alpha=alpha, beta=beta, tol=1e-12)
        .run()
        .scores()
        .collect()
    }
    nx_beta = {u: beta + alpha * d for u, d in nxg.degree}
    want = nx.katz_centrality(
        nxg, alpha=alpha, beta=nx_beta, max_iter=10_000, tol=1e-12,
        normalized=True, weight=None,
    )
    for node, s in want.items():
        assert got[node] == pytest.approx(s, abs=1e-5)


@given(edges=edge_lists)
@PROP
def test_min_cut_duality_of_source_set(spark, edges):
    g, nxg = _graphs(spark, edges, weighted=True)
    if g is None or nxg.number_of_nodes() < 2:
        return
    n = nxg.number_of_nodes()
    source, sink = 0, n - 1
    ek = EdmondsKarp(g, source=source, sink=sink).run()
    flow = ek.get_max_flow()
    s_side = set(ek.get_source_set())
    assert source in s_side and sink not in s_side
    cut_cap = sum(
        d["capacity"]
        for u, v, d in nxg.edges(data=True)
        if (u in s_side) != (v in s_side)
    )
    # max-flow = min-cut; the residual-BFS source set must realize it
    assert cut_cap == pytest.approx(flow, abs=1e-9)
