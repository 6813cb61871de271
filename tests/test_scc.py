"""Strongly-connected-components tests (trim + FW-BW)."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators.scc import StronglyConnectedComponents


def labels_of(g):
    scc = StronglyConnectedComponents(g).run()
    return {r["id"]: r["label"] for r in scc.get_partition().collect()}, scc


def test_scc_two_cycles_and_bridge(spark):
    # cycle {0,1,2}, cycle {3,4}, bridge 2->3, tendril 4->5
    g = Graph.from_edge_list(
        spark,
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3), (4, 5)],
        directed=True,
        num_nodes=6,
    )
    lab, scc = labels_of(g)
    assert lab[0] == lab[1] == lab[2] == 0
    assert lab[3] == lab[4] == 3
    assert lab[5] == 5
    assert scc.number_of_components() == 3


def test_scc_dag_all_singletons(spark):
    g = Graph.from_edge_list(
        spark, [(0, 1), (0, 2), (1, 3), (2, 3)], directed=True, num_nodes=4
    )
    lab, scc = labels_of(g)
    assert lab == {0: 0, 1: 1, 2: 2, 3: 3}
    assert scc.number_of_components() == 4


def test_scc_single_big_cycle(spark):
    n = 12
    g = Graph.from_edge_list(
        spark, [(i, (i + 1) % n) for i in range(n)], directed=True, num_nodes=n
    )
    lab, scc = labels_of(g)
    assert set(lab.values()) == {0}
    assert scc.number_of_components() == 1


def test_scc_rejects_undirected(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        StronglyConnectedComponents(g)


def test_scc_isolated_nodes(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 0)], directed=True, num_nodes=4)
    lab, scc = labels_of(g)
    assert lab[0] == lab[1] == 0
    assert lab[2] == 2 and lab[3] == 3
