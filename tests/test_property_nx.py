"""Property-based cross-validation against networkx: hypothesis draws
small random edge lists and every drawn graph must agree with networkx
(an INDEPENDENT implementation, not our own oracle SQL) on degrees,
connected components (as partitions), per-node triangle counts, local
clustering coefficients, and core numbers.

Only invariants whose semantics the reference and networkx define
identically are compared (PageRank is excluded: networkx redistributes
dangling mass, the reference — and this engine — deliberately does
not, `operators/pagerank.py`). Examples are few (Spark jobs are
seconds each); hypothesis still explores the degenerate corners —
self-loop-only rows, parallel edges, isolated ids, single-edge graphs."""

import pytest

try:
    import networkx as nx
except ImportError:  # pragma: no cover
    pytest.skip("networkx not installed", allow_module_level=True)

from hypothesis import HealthCheck, given, settings, strategies as st

from networkit_spark import (
    ConnectedComponents,
    CoreDecomposition,
    Graph,
    LocalClusteringCoefficient,
)

N_MAX = 12

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=N_MAX - 1),
        st.integers(min_value=0, max_value=N_MAX - 1),
    ),
    min_size=1,
    max_size=24,
)

PROP = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _simple(edges):
    """Simple undirected graph (no self-loops, deduped) both ways."""
    es = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    return es


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


@given(edges=edge_lists)
@PROP
def test_degrees_match_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    got = {int(r["id"]): int(r["out_deg"]) for r in g.degrees().collect()}
    for u in nxg.nodes:
        assert got[u] == nxg.degree(u)


@given(edges=edge_lists)
@PROP
def test_components_match_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    cc = ConnectedComponents(g).run()
    lab = {int(r["id"]): int(r["label"]) for r in cc.get_partition().collect()}
    comps = {frozenset(c) for c in nx.connected_components(nxg)}
    got = {}
    for u, l in lab.items():
        got.setdefault(l, set()).add(u)
    assert {frozenset(c) for c in got.values()} == comps


@given(edges=edge_lists)
@PROP
def test_triangles_and_lcc_match_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    lcc = LocalClusteringCoefficient(g).run()
    got = {int(r["id"]): int(r["triangles"]) for r in lcc.triangles().collect()}
    want = nx.triangles(nxg)
    for u in nxg.nodes:
        assert got.get(u, 0) == want[u]
    gotc = {int(r["id"]): float(r["score"]) for r in lcc.scores().collect()}
    wantc = nx.clustering(nxg)
    for u in nxg.nodes:
        assert gotc.get(u, 0.0) == pytest.approx(wantc[u], abs=1e-9)


@given(edges=edge_lists)
@PROP
def test_core_numbers_match_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    kc = CoreDecomposition(g).run()
    got = {int(r["id"]): int(r["core"]) for r in kc.core_numbers().collect()}
    want = nx.core_number(nxg)
    for u in nxg.nodes:
        assert got.get(u, 0) == want[u]


@given(edges=edge_lists)
@PROP
def test_betweenness_matches_networkx_2x(spark, edges):
    # reference Brandes accumulates ordered pairs without halving
    # (VERDICT r2: "2n/k & no-halving constants") = exactly 2x
    # networkx's normalized=False undirected betweenness
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    from networkit_spark.operators.betweenness import Betweenness

    bw = Betweenness(g).run()
    got = {int(r["id"]): float(r["score"]) for r in bw.scores().collect()}
    want = nx.betweenness_centrality(nxg, normalized=False)
    for u in nxg.nodes:
        assert got.get(u, 0.0) == pytest.approx(2.0 * want[u], abs=1e-9)


@given(edges=edge_lists)
@PROP
def test_diameter_and_eccentricity_match_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None or not nx.is_connected(nxg):
        return
    from networkit_spark.operators.distance import Diameter, Eccentricity

    lo, hi = Diameter(g, algo="exact").run().get_diameter()
    assert lo == hi == nx.diameter(nxg)
    got = {int(r["id"]): int(r["ecc"]) for r in Eccentricity.frame(g).collect()}
    want = nx.eccentricity(nxg)
    for u in nxg.nodes:
        assert got[u] == want[u]


@given(edges=edge_lists)
@PROP
def test_assortativity_matches_edgewise_pearson(spark, edges):
    # NOT networkx: nx symmetrizes the edge list before the Pearson,
    # the reference iterates forEdges ONCE (Assortativity.cpp:64-90) —
    # on a star the two give -1.0 vs an undefined-variance 0.0. The
    # independent check here is a numpy Pearson over the same
    # once-per-edge convention.
    import numpy as np

    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    from networkit_spark.operators.correlation import degree_assortativity

    deg = dict(nxg.degree())
    xs = np.array([deg[u] for u, v in nxg.edges()], dtype=float)
    ys = np.array([deg[v] for u, v in nxg.edges()], dtype=float)
    num = ((xs - xs.mean()) * (ys - ys.mean())).sum()
    den = np.sqrt(((xs - xs.mean()) ** 2).sum() * ((ys - ys.mean()) ** 2).sum())
    want = num / den if den else 0.0
    got = degree_assortativity(g)
    # edge direction in the canonical list: our frame uses (min,max)
    # like nx.Graph edge iteration, so the pairs line up
    assert got == pytest.approx(want, abs=1e-9)


@given(edges=edge_lists)
@PROP
def test_pagerank_matches_networkx_when_no_dangling(spark, edges):
    # on a connected undirected graph with no isolated nodes there is
    # no dangling mass, so networkx's pagerank (which redistributes it)
    # and the reference semantics (which do not) coincide
    g, nxg = _graphs(spark, edges)
    if g is None or not nx.is_connected(nxg):
        return
    import numpy as np

    from networkit_spark import PageRank

    pr = PageRank(g, damp=0.85, tol=1e-12, norm="l1").run()
    got = {int(r["id"]): float(r["score"]) for r in pr.scores().collect()}
    # textbook dense power iteration (nx.pagerank needs scipy, absent
    # here) — an independent oracle of the same no-dangling semantics
    n = nxg.number_of_nodes()
    A = np.zeros((n, n))
    for u, v in nxg.edges():
        A[u, v] = A[v, u] = 1.0
    P = A / A.sum(axis=1, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(2000):
        nr = 0.15 / n + 0.85 * (P.T @ r)
        if np.abs(nr - r).sum() < 1e-15:
            r = nr
            break
        r = nr
    for u in nxg.nodes:
        assert got[u] == pytest.approx(r[u], abs=1e-8)


@given(edges=edge_lists)
@PROP
def test_scc_matches_networkx(spark, edges):
    # directed draws: keep self-loop-free distinct arcs as given
    es = sorted({(u, v) for u, v in edges if u != v})
    if not es:
        return
    n = max(max(u, v) for u, v in es) + 1
    g = Graph.from_edge_list(spark, es, directed=True, num_nodes=n)
    nxg = nx.DiGraph()
    nxg.add_nodes_from(range(n))
    nxg.add_edges_from(es)
    from networkit_spark import StronglyConnectedComponents

    scc = StronglyConnectedComponents(g).run()
    lab = {int(r["id"]): int(r["label"]) for r in scc.get_partition().collect()}
    got = {}
    for u, l in lab.items():
        got.setdefault(l, set()).add(u)
    want = {frozenset(c) for c in nx.strongly_connected_components(nxg)}
    assert {frozenset(c) for c in got.values()} == want


@given(edges=edge_lists, seed=st.integers(min_value=0, max_value=10))
@PROP
def test_msf_weight_matches_networkx(spark, edges, seed):
    # distinct deterministic weights -> the MSF is unique, so total
    # weight AND edge set must agree with networkx
    import hashlib

    es = _simple(edges)
    if not es:
        return
    n = max(max(u, v) for u, v in es) + 1
    wed = [
        (u, v, 1.0 + int(hashlib.md5(f"{seed}:{u}:{v}".encode()).hexdigest()[:6], 16))
        for u, v in es
    ]
    g = Graph.from_edge_list(spark, wed, weighted=True, num_nodes=n)
    nxg = nx.Graph()
    nxg.add_nodes_from(range(n))
    nxg.add_weighted_edges_from(wed)
    from networkit_spark.operators.spanning import MinimumSpanningForest

    msf = MinimumSpanningForest(g).run()
    got = {
        (min(int(r["src"]), int(r["dst"])), max(int(r["src"]), int(r["dst"])))
        for r in msf.get_forest().collect()
    }
    want = {
        (min(u, v), max(u, v))
        for u, v in nx.minimum_spanning_edges(nxg, data=False)
    }
    assert got == want


@given(edges=edge_lists)
@PROP
def test_maximal_cliques_match_networkx(spark, edges):
    g, nxg = _graphs(spark, edges)
    if g is None:
        return
    from networkit_spark.operators.cliques import MaximalCliques

    mc = MaximalCliques(g).run()
    got = {frozenset(int(x) for x in r["c"]) for r in mc.get_cliques().collect()}
    want = {frozenset(c) for c in nx.find_cliques(nxg)}
    assert got == want
