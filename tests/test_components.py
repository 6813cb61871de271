"""Connected components goldens + semantics
(ConnectedComponentsGTest.cpp:31-63; SURVEY §5 canonical relabel)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark import ConnectedComponents, Graph, WeaklyConnectedComponents
from networkit_spark.operators.components import extract_largest_connected_component
from networkit_spark.plans.iterate import CheckpointStore

from test_fixtures import cc_tiny20


def labels_dict(cc):
    return {r["id"]: r["label"] for r in cc.get_partition().collect()}


def test_cc_tiny20_five_components(spark):
    cc = ConnectedComponents(cc_tiny20(spark)).run()
    assert cc.number_of_components() == 5
    lab = labels_dict(cc)
    assert lab[0] == lab[19]
    assert lab[3] == lab[7]
    # canonical relabel: label = min node id in component
    assert lab[0] == 0 and lab[3] == 3 and lab[10] == 10
    assert lab[13] == 13 and lab[15] == 15  # node 15 is isolated
    sizes = {r["label"]: r["size"] for r in cc.get_component_sizes().collect()}
    assert sizes[0] == 7 and sizes[13] == 2
    # isolated nodes 15 each form singleton components
    assert sizes[15] == 1


def test_cc_rejects_directed(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        ConnectedComponents(g)


def test_wcc_directed(spark):
    # 0→1, 2→1, 3→4: weakly two components
    g = Graph.from_edge_list(spark, [(0, 1), (2, 1), (3, 4)], directed=True)
    wcc = WeaklyConnectedComponents(g).run()
    assert wcc.number_of_components() == 2
    lab = labels_dict(wcc)
    assert lab[0] == lab[1] == lab[2] == 0
    assert lab[3] == lab[4] == 3


def test_cc_path_converges_in_diameter_rounds(spark):
    # path of 32 nodes: hash-min needs O(diameter) rounds (pointer
    # doubling is deliberately absent — single-reference rule,
    # plans/iterate.py); label 0 walks one hop per round
    edges = [(i, i + 1) for i in range(31)]
    g = Graph.from_edge_list(spark, edges, num_nodes=32)
    cc = ConnectedComponents(g).run()
    assert cc.number_of_components() == 1
    assert cc.number_of_iterations() <= 33


def test_cc_compact_partition(spark):
    cc = ConnectedComponents(cc_tiny20(spark)).run()
    compact = {r["id"]: r["label"] for r in cc.compact_partition().collect()}
    assert set(compact.values()) == set(range(cc.number_of_components()))


def test_extract_largest_connected_component(spark):
    # two paths: 0-1-2-3 and 4-5-6-7-8-9 → largest has 6 nodes / 5 edges
    # (mirrors test_algorithms.py:449-463 shape)
    edges = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (6, 7), (7, 8), (8, 9)]
    g = Graph.from_edge_list(spark, edges, num_nodes=10)
    big = extract_largest_connected_component(g)
    assert big.number_of_nodes() == 6
    assert big.number_of_edges() == 5
    compacted = extract_largest_connected_component(g, compact=True)
    ids = sorted(r["id"] for r in compacted.vertices.collect())
    assert ids == list(range(6))


def test_cc_checkpoint_resume(spark, tmp_path):
    g = cc_tiny20(spark)
    base = str(tmp_path / "ccckpt")
    store1 = CheckpointStore(base, run_id="cc1")
    partial = ConnectedComponents(g, store=store1, max_iterations=1)
    partial.run()
    store2 = CheckpointStore(base, run_id="cc1")
    resumed = ConnectedComponents(g, store=store2).run()
    assert resumed.number_of_components() == 5
    lab = labels_dict(resumed)
    assert lab[19] == 0


def test_cc_coarsening_fallback_long_chain(spark):
    # 60-node path, round budget 5 << diameter: hash-min alone cannot
    # converge; the wired FastSV fallback must still produce the
    # exact partition (one component labeled by its min id)
    from networkit_spark.operators.components import ConnectedComponents

    edges = [(i, i + 1, 1.0) for i in range(59)] + [(100, 101, 1.0)]
    g = Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False,
        weighted=True,
    )
    cc = ConnectedComponents(g, max_iterations=5).run()
    labels = {r["id"]: r["label"] for r in cc.get_partition().collect()}
    assert all(labels[i] == 0 for i in range(60))
    assert labels[100] == labels[101] == 100
    assert cc.number_of_components() == 2


def test_cc_fallback_disabled_still_raises(spark):
    from networkit_spark.operators.components import ConnectedComponents

    edges = [(i, i + 1, 1.0) for i in range(30)]
    g = Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False,
        weighted=True,
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        ConnectedComponents(g, max_iterations=3, fastsv_fallback=False).run()
