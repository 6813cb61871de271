"""Property-based invariants for the round-4 operators: hypothesis
draws small random graphs/matchings and checks the structural
guarantees each operator's contract promises.

- MatchingCoarsening: for ANY valid matching, coarse node count is
  n − |M|, total edge weight is conserved (self-loops included; or
  reduced by exactly the matched pairs' weights with noSelfLoops),
  and the fine→coarse mapping sends both matched endpoints to the
  same super-node and unmatched nodes to singleton super-nodes.
- DynBetweenness: a random insertion sequence applied one event at a
  time equals a fresh exact Brandes run on the final graph (the
  equals-fresh contract), on random undirected graphs.
- MAT v5 codec: random undirected graphs survive a write→read
  roundtrip with the exact same canonical edge set and node count.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from networkit_spark import Graph

from tests.conftest import spark  # noqa: F401

PROP = settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

N = 8
edge_sets = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=N - 1),
        st.integers(min_value=0, max_value=N - 1),
    ).map(lambda t: (min(t), max(t))).filter(lambda t: t[0] != t[1]),
    min_size=3,
    max_size=14,
)


def _graph(spark, edges):
    return Graph(
        spark.createDataFrame(
            [(u, v, 1.0) for u, v in sorted(edges)],
            "src long, dst long, weight double",
        ),
        directed=False,
        weighted=False,
        vertices=spark.createDataFrame([(i,) for i in range(N)], "id long"),
    )


def _greedy_matching(edges):
    used, m = set(), []
    for u, v in sorted(edges):
        if u not in used and v not in used:
            m.append((u, v))
            used.update((u, v))
    return m


@PROP
@given(edges=edge_sets)
def test_matching_coarsening_invariants(spark, edges):
    from networkit_spark.operators.coarsening import MatchingCoarsening

    g = _graph(spark, edges)
    matching = _greedy_matching(edges)
    mdf = spark.createDataFrame(
        [(u, v) for u, v in matching] or [(None, None)],
        "src long, dst long",
    ).where(F.col("src").isNotNull())
    mc = MatchingCoarsening(g, mdf).run()
    cg = mc.get_coarse_graph()
    assert cg.number_of_nodes() == N - len(matching)
    total_fine = len(edges) * 1.0
    total_coarse = cg.edges.agg(F.sum("weight").alias("s")).collect()[0]["s"]
    assert total_coarse == total_fine
    mapping = {r["id"]: r["super"] for r in
               mc.get_fine_to_coarse_node_mapping().collect()}
    for u, v in matching:
        assert mapping[u] == mapping[v]
    matched = {x for uv in matching for x in uv}
    supers = [mapping[i] for i in range(N) if i not in matched]
    assert len(supers) == len(set(supers))
    # noSelfLoops drops exactly the matched pairs' intra-edges
    mc2 = MatchingCoarsening(g, mdf, no_self_loops=True).run()
    dropped = sum(1.0 for (u, v) in edges if mapping[u] == mapping[v])
    total2 = (
        mc2.get_coarse_graph().edges.agg(F.sum("weight").alias("s"))
        .collect()[0]["s"]
    ) or 0.0
    assert total2 == total_fine - dropped


@PROP
@given(edges=edge_sets)
def test_dynbetweenness_equals_fresh_property(spark, edges):
    from networkit_spark import Betweenness
    from networkit_spark.operators.dynbetweenness import DynBetweenness

    edges = sorted(edges)
    base, extra = edges[:-2], edges[-2:]
    if not base or not extra:
        return
    g = _graph(spark, base)
    dyn = DynBetweenness(g).run()
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", u, v, 1.0) for u, v in extra],
        "etype string, u long, v long, w double",
    )
    dyn.update(ev)
    fresh = Betweenness(_graph(spark, set(edges))).run()
    got = sorted((r["id"], round(r["score"], 9)) for r in dyn.scores().collect())
    exp = sorted((r["id"], round(r["score"], 9)) for r in fresh.scores().collect())
    assert got == exp


@PROP
@given(edges=edge_sets)
def test_mat_roundtrip_property(spark, edges, tmp_path_factory):
    from networkit_spark.sources.io import read_mat, write_mat

    g = _graph(spark, edges)
    p = str(tmp_path_factory.mktemp("mat") / "g.mat")
    write_mat(g, p)
    g2 = read_mat(spark, p)
    got = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert got == set(edges)
    assert g2.number_of_nodes() == N
