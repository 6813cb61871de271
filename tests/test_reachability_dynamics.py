"""ReachableNodes / AllSimplePaths / GraphDifference / DGSWriter /
HashingOverlapper (``cpp/reachability/``, ``cpp/dynamics/``,
``cpp/overlap/``)."""

import itertools
import os

import pytest

from networkit_spark import Graph
from networkit_spark.operators.quality import hashing_overlapper
from networkit_spark.operators.reachability import (
    AllSimplePaths,
    ReachableNodes,
)
from networkit_spark.sources.io import read_dgs, write_dgs
from networkit_spark.streaming.difference import GraphDifference


def test_reachable_nodes_undirected(spark):
    g = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (3, 4)], directed=False
    )
    algo = ReachableNodes(g).run()
    r = {x["id"]: x["r"] for x in algo.get_reachable_nodes().collect()}
    assert r == {0: 3, 1: 3, 2: 3, 3: 2, 4: 2}
    assert algo.number_of_reachable_nodes(0) == 3
    assert algo.number_of_reachable_nodes_lb(3) == 2
    assert algo.number_of_reachable_nodes_ub(3) == 2


def test_reachable_nodes_directed(spark):
    # cycle {0,1} → 2 → {3,4} cycle; 5 isolated sink reachable from 2
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 4), (4, 3), (2, 5)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    algo = ReachableNodes(g).run()
    r = {x["id"]: x["r"] for x in algo.get_reachable_nodes().collect()}
    assert r[0] == 6 and r[1] == 6  # reach everything
    assert r[2] == 4  # {2,3,4,5}
    assert r[3] == 2 and r[4] == 2
    assert r[5] == 1


def _brute_simple_paths(edges, s, t, cutoff, directed=True):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        if not directed:
            adj.setdefault(v, set()).add(u)
    out = []

    def walk(path):
        if len(path) - 1 > cutoff:
            return
        if path[-1] == t and len(path) > 1:
            out.append(tuple(path))
            return
        for x in adj.get(path[-1], ()):
            if x not in path:
                walk(path + [x])

    walk([s])
    return sorted(out)


def test_all_simple_paths(spark):
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (2, 4)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    algo = AllSimplePaths(g, 0, 4, cutoff=4).run()
    got = sorted(tuple(r["path"]) for r in algo.get_all_paths().collect())
    assert got == _brute_simple_paths(edges, 0, 4, 4)
    assert algo.number_of_simple_paths() == len(got)
    with pytest.raises(RuntimeError, match="frontier"):
        AllSimplePaths(g, 0, 4, cutoff=4, max_paths=0).run()


def test_graph_difference_and_dgs_roundtrip(spark, tmp_path):
    g1 = Graph.from_edge_list(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 2.0)],
        directed=False, weighted=True, num_nodes=5,
    )
    g2 = Graph.from_edge_list(
        spark, [(0, 1, 1.0), (2, 3, 5.0), (3, 5, 1.0)],
        directed=False, weighted=True,
    )
    diff = GraphDifference(g1, g2).run()
    assert diff.get_number_of_edge_removals() == 1     # (1,2)
    assert diff.get_number_of_edge_additions() == 1    # (3,5)
    assert diff.get_number_of_weight_updates() == 1    # (2,3)
    assert diff.get_number_of_node_additions() == 1    # 5
    assert diff.get_number_of_node_removals() == 1     # 4 (isolated in g1)
    assert diff.get_number_of_edits() == 5
    # removals phase precedes additions phase
    phases = {
        r["etype"]: r["phase"] for r in diff.get_edits().collect()
    }
    assert phases["EDGE_REMOVAL"] < phases["EDGE_ADDITION"]

    path = os.path.join(tmp_path, "diff.dgs")
    write_dgs(diff.get_edits(), path, order_col="phase")
    replay = read_dgs(spark, path, mapped=False)
    back = {
        (r["etype"], r["u"], r["v"]) for r in replay.collect()
    }
    assert ("EDGE_REMOVAL", 1, 2) in back
    assert ("EDGE_ADDITION", 3, 5) in back
    assert ("EDGE_WEIGHT_UPDATE", 2, 3) in back


def test_hashing_overlapper(spark):
    g = Graph.from_edge_list(
        spark, [(i, (i + 1) % 6) for i in range(6)], directed=False
    )
    p1 = spark.createDataFrame(
        [(i, i % 2) for i in range(6)], "id long, label long"
    )
    p2 = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, label long"
    )
    core = {
        r["id"]: r["label"]
        for r in hashing_overlapper(g, [p1, p2]).collect()
    }
    # overlap classes: (0,0):{0,2} (1,0):{1} (1,1):{3,5} (0,1):{4}
    assert core[0] == core[2]
    assert core[3] == core[5]
    assert len({core[0], core[1], core[3], core[4]}) == 4
    # degenerate arities
    one = {r["id"]: r["label"] for r in hashing_overlapper(g, [p1]).collect()}
    assert one == {i: i % 2 for i in range(6)}
    empty = hashing_overlapper(g, []).collect()
    assert {r["label"] for r in empty} == {0}
