"""Graph container semantics — multi-edge / self-loop / degree contracts
from SURVEY §1.2 (Graph.cpp:549-579, 576-578; Graph.hpp:1174-1222)."""

from pyspark.sql import functions as F

from networkit_spark import Graph


def test_multi_edges_preserved(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 1), (1, 2)])
    assert g.number_of_edges() == 3  # addEdge appends unconditionally


def test_remove_multi_edges(spark):
    g = Graph.from_edge_list(spark, [(0, 1, 2.0), (1, 0, 3.0), (1, 2, 1.0)])
    simple = g.remove_multi_edges()
    assert simple.number_of_edges() == 2  # undirected dup detected canonically
    combined = g.remove_multi_edges(combine_weights=True)
    w = {
        (r["src"], r["dst"]): r["weight"] for r in combined.edges.collect()
    }
    assert w[(0, 1)] == 5.0


def test_self_loops_tracked_and_removed(spark):
    g = Graph.from_edge_list(spark, [(0, 0), (0, 1), (2, 2)])
    assert g.number_of_self_loops() == 2
    assert g.remove_self_loops().number_of_edges() == 1


def test_degrees_undirected(spark):
    # triangle + pendant: degrees 2,2,3,1
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    d = {r["id"]: r["out_deg"] for r in g.degrees().collect()}
    assert d == {0: 2, 1: 2, 2: 3, 3: 1}


def test_degrees_directed_and_self_loop(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 1)], directed=True)
    rows = {r["id"]: r for r in g.degrees().collect()}
    assert rows[0]["out_deg"] == 2 and rows[0]["in_deg"] == 0
    assert rows[1]["out_deg"] == 1 and rows[1]["in_deg"] == 2  # self-loop counts once each side


def test_symmetrized_self_loop_once(spark):
    g = Graph.from_edge_list(spark, [(0, 0), (0, 1)])
    assert g.symmetrized().count() == 3  # loop once, edge twice


def test_subgraph_and_transpose(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], directed=True)
    sub = g.subgraph_from_nodes(spark.createDataFrame([(0,), (1,), (2,)], ["id"]))
    assert sorted((r["src"], r["dst"]) for r in sub.edges.collect()) == [(0, 1), (1, 2)]
    t = g.transpose()
    assert sorted((r["src"], r["dst"]) for r in t.edges.collect()) == [
        (1, 0),
        (2, 1),
        (3, 2),
    ]


def test_has_edge(spark):
    g = Graph.from_edge_list(spark, [(0, 1)])
    assert g.has_edge(1, 0)  # undirected sees both directions
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    assert gd.has_edge(0, 1) and not gd.has_edge(1, 0)
