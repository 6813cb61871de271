"""Property-based cross-validation, batch 9: partition coarsening as a
quotient graph, Havel–Hakimi degree-sequence realization, and
GraphDifference edit streams — each checked against an independent
pure-Python/networkx computation on hypothesis-drawn graphs."""

import pytest

try:
    import networkx as nx
except ImportError:  # pragma: no cover
    pytest.skip("networkx not installed", allow_module_level=True)

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from networkit_spark import Graph, ParallelPartitionCoarsening
from networkit_spark.generators import havel_hakimi
from networkit_spark.streaming.difference import GraphDifference

N_MAX = 10

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=N_MAX - 1),
        st.integers(min_value=0, max_value=N_MAX - 1),
        st.integers(min_value=1, max_value=4),
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
    return sorted((u, v, float(w)) for (u, v), w in seen.items())


@given(edges=edge_lists)
@PROP
def test_partition_coarsening_matches_quotient_graph(spark, edges):
    es = _simple(edges)
    if not es:
        return
    n = max(max(u, v) for u, v, _ in es) + 1
    g = Graph.from_edge_list(spark, es, weighted=True, num_nodes=n)
    labels = spark.createDataFrame(
        [(i, i % 3) for i in range(n)], "id long, label long"
    )
    ppc = ParallelPartitionCoarsening(g, labels).run()
    mapping = {
        r["id"]: r["super"]
        for r in ppc.get_fine_to_coarse_node_mapping().collect()
    }
    # same fine label ⇒ same super node, and supers are dense 0-based
    by_label = {}
    for i in range(n):
        by_label.setdefault(i % 3, set()).add(mapping[i])
    assert all(len(s) == 1 for s in by_label.values())
    assert sorted({s for ss in by_label.values() for s in ss}) == list(
        range(len(by_label))
    )
    # quotient edge weights: sum of fine weights between the blocks
    # (intra-block edges become self-loops) — computed independently
    want = {}
    for u, v, w in es:
        bu, bv = mapping[u], mapping[v]
        key = (min(bu, bv), max(bu, bv))
        want[key] = want.get(key, 0.0) + w
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in ppc.get_coarse_graph().edges.collect()
    }
    assert got == pytest.approx(want)


degree_seq_graphs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=14,
)


@given(edges=degree_seq_graphs)
@PROP
def test_havel_hakimi_realizes_degree_sequence(spark, edges):
    es = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    if not es:
        return
    n = max(max(u, v) for u, v in es) + 1
    nxg = nx.Graph()
    nxg.add_nodes_from(range(n))
    nxg.add_edges_from(es)
    seq = [d for _, d in nxg.degree]  # graphical by construction
    g = havel_hakimi(spark, seq)
    rows = g.canonical().select("src", "dst").collect()
    got_edges = {(r["src"], r["dst"]) for r in rows}
    # simple graph: no self-loops, no duplicate edges
    assert all(u != v for u, v in got_edges)
    assert len(got_edges) == len(rows)
    got_deg = {i: 0 for i in range(len(seq))}
    for u, v in got_edges:
        got_deg[u] += 1
        got_deg[v] += 1
    assert sorted(got_deg.values()) == sorted(seq)


@given(edges1=edge_lists, edges2=edge_lists)
@PROP
def test_graph_difference_matches_python_diff(spark, edges1, edges2):
    es1, es2 = _simple(edges1), _simple(edges2)
    if not es1 or not es2:
        return
    n = max(max(u, v) for u, v, _ in es1 + es2) + 1
    g1 = Graph.from_edge_list(spark, es1, weighted=True, num_nodes=n)
    g2 = Graph.from_edge_list(spark, es2, weighted=True, num_nodes=n)
    diff = GraphDifference(g1, g2).run()
    m1 = {(u, v): w for u, v, w in es1}
    m2 = {(u, v): w for u, v, w in es2}
    want_removed = {e for e in m1 if e not in m2}
    want_added = {e for e in m2 if e not in m1}
    want_reweighted = {
        e for e in m1 if e in m2 and m1[e] != m2[e]
    }
    edits = diff.get_edits().collect()
    got = {
        etype: {
            (r["u"], r["v"]) for r in edits if r["etype"] == etype
        }
        for etype in (
            "EDGE_REMOVAL", "EDGE_ADDITION", "EDGE_WEIGHT_UPDATE"
        )
    }
    assert got["EDGE_REMOVAL"] == want_removed
    assert got["EDGE_ADDITION"] == want_added
    assert got["EDGE_WEIGHT_UPDATE"] == want_reweighted
    assert diff.get_number_of_edge_removals() == len(want_removed)
    assert diff.get_number_of_edge_additions() == len(want_added)
    assert diff.get_number_of_weight_updates() == len(want_reweighted)
