"""Round-3 long-tail: partition/cover IO formats, the NetworKit binary
format, ClusteringProjector, PathGrowingMatcher, RandomSpanningForest."""

import struct

import pytest

from networkit_spark import Graph
from networkit_spark.operators.coarsening import (
    ParallelPartitionCoarsening,
    project_back,
    project_back_to_finest,
)
from networkit_spark.operators.matching import PathGrowingMatcher
from networkit_spark.operators.spanning import RandomSpanningForest
from networkit_spark.sources import io as nio


# ------------------------------------------------------------- partition IO
def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "id long, label long")


def test_partition_text_roundtrip(spark, tmp_path):
    labels = _labels(spark, [(0, 2), (1, 2), (2, 0), (3, 1)])
    p = str(tmp_path / "part.txt")
    nio.write_partition_text(labels, p)
    assert open(p).read() == "2\n2\n0\n1\n"
    back = {r["id"]: r["label"] for r in nio.read_partition_text(spark, p).collect()}
    assert back == {0: 2, 1: 2, 2: 0, 3: 1}


def test_partition_text_reader_skips_comments(spark, tmp_path):
    p = str(tmp_path / "part2.txt")
    with open(p, "w") as f:
        f.write("# header\n*skip\n5\n7\n")
    back = {r["id"]: r["label"] for r in nio.read_partition_text(spark, p).collect()}
    assert back == {0: 5, 1: 7}


def test_edge_list_partition_reader(spark, tmp_path):
    p = str(tmp_path / "elp.txt")
    with open(p, "w") as f:
        f.write("# c\n1 4\n2 4\n3 9\n")
    back = {
        r["id"]: r["label"]
        for r in nio.read_edge_list_partition(spark, p, first_node=1).collect()
    }
    assert back == {0: 4, 1: 4, 2: 9}


@pytest.mark.parametrize("width", [4, 8])
def test_binary_partition_roundtrip(spark, tmp_path, width):
    labels = _labels(spark, [(0, 3), (1, 0), (2, 300), (3, 3)])
    p = str(tmp_path / f"part{width}.bin")
    nio.write_binary_partition(labels, p, width=width)
    import os

    assert os.path.getsize(p) == 4 * width
    back = {
        r["id"]: r["label"]
        for r in nio.read_binary_partition(spark, p, width=width).collect()
    }
    assert back == {0: 3, 1: 0, 2: 300, 3: 3}


@pytest.mark.parametrize("width", [4, 8])
def test_binary_edge_list_partition_roundtrip(spark, tmp_path, width):
    labels = _labels(spark, [(0, 1), (1, 1), (2, 5)])
    p = str(tmp_path / f"belp{width}.bin")
    nio.write_binary_edge_list_partition(labels, p, first_node=2, width=width)
    back = {
        r["id"]: r["label"]
        for r in nio.read_binary_edge_list_partition(
            spark, p, first_node=2, width=width
        ).collect()
    }
    assert back == {0: 1, 1: 1, 2: 5}


def test_binary_edge_list_partition_multi_file(spark, tmp_path):
    a = _labels(spark, [(0, 1)])
    b = _labels(spark, [(1, 2)])
    pa, pb = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    nio.write_binary_edge_list_partition(a, pa)
    nio.write_binary_edge_list_partition(b, pb)
    back = {
        r["id"]: r["label"]
        for r in nio.read_binary_edge_list_partition(spark, [pa, pb]).collect()
    }
    assert back == {0: 1, 1: 2}


# ----------------------------------------------------------------- cover IO
def test_cover_roundtrip(spark, tmp_path):
    cover = _labels(spark, [(0, 0), (1, 0), (1, 1), (2, 1)])
    p = str(tmp_path / "cover.txt")
    nio.write_cover(cover, p)
    assert open(p).read() == "0 1 \n1 2 \n"
    back = {
        (r["id"], r["label"]) for r in nio.read_cover(spark, p).collect()
    }
    assert back == {(0, 0), (1, 0), (1, 1), (2, 1)}


def test_edge_list_cover_reader(spark, tmp_path):
    p = str(tmp_path / "elc.txt")
    with open(p, "w") as f:
        f.write("1 0 2\n2 1\n")
    back = {
        (r["id"], r["label"])
        for r in nio.read_edge_list_cover(spark, p, first_node=1).collect()
    }
    assert back == {(0, 0), (0, 2), (1, 1)}


def test_snap_cover_reader(spark, tmp_path):
    p = str(tmp_path / "snap_cover.txt")
    with open(p, "w") as f:
        f.write("# comment line counts\n100 200\n300\n")
    node_map = spark.createDataFrame(
        [(100, 0), (200, 1), (300, 2), (999, 3)], "orig_id long, id long"
    )
    back = {
        (r["id"], r["label"])
        for r in nio.read_snap_cover(spark, p, node_map).collect()
    }
    # comment is line 1; communities are lines 2 and 3
    assert back == {(0, 2), (1, 2), (2, 3)}


def test_dot_partition_writer(spark, tmp_path):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], num_nodes=4)
    labels = _labels(spark, [(0, 7), (1, 7), (2, 9), (3, 9)])
    p = str(tmp_path / "part.dot")
    nio.write_dot_partition(g, labels, p)
    text = open(p).read()
    assert text.startswith("graph {")
    assert "3 [" not in text  # isolated node skipped
    assert 'color="0.0,0.99,0.99", label=7' in text
    assert 'color="0.5,0.99,0.99", label=9' in text
    assert "0 -- 1;" in text and "1 -- 2;" in text


# --------------------------------------------------------- NetworKit binary
def test_nkb_varint_codec_golden():
    enc = nio._nkb_varint_encode
    dec = nio._nkb_varint_decode
    # hand-derived from NetworkitBinaryGraph.hpp:74-126
    assert enc(0) == b"\x01"
    assert enc(1) == b"\x03"
    assert enc(127) == b"\xff"
    assert enc(128) == b"\x02\x02"
    assert enc(1 << 56) == b"\x00" + (1 << 56).to_bytes(8, "little")
    for v in [0, 1, 5, 127, 128, 300, 2**20, 2**49, 2**56, 2**63, 2**64 - 1]:
        got, pos = dec(enc(v), 0)
        assert got == v and pos == len(enc(v))


def test_nkb_zigzag_roundtrip():
    for v in [0, 1, -1, 5, -5, 2**40, -(2**40)]:
        assert nio._nkb_zigzag_decode(nio._nkb_zigzag_encode(v)) == v


@pytest.mark.parametrize(
    "directed,weights",
    [(False, None), (True, None), (False, "ints"), (True, "doubles"),
     (False, "signed"), (True, "floats")],
)
def test_nkb_roundtrip(spark, tmp_path, directed, weights):
    if weights == "ints":
        raw = [(0, 1, 3.0), (1, 2, 1.0), (0, 3, 7.0), (3, 3, 2.0)]
    elif weights == "doubles":
        raw = [(0, 1, 0.123456789), (1, 2, 3.5), (0, 3, 1e-9)]
    elif weights == "signed":
        raw = [(0, 1, -3.0), (1, 2, 4.0), (0, 3, -1.0)]
    elif weights == "floats":
        raw = [(0, 1, 0.5), (1, 2, -2.25), (0, 3, 3.75)]
    else:
        raw = [(0, 1), (1, 2), (0, 3), (2, 4)]
    g = Graph.from_edge_list(
        spark, raw, directed=directed, weighted=weights is not None, num_nodes=5
    )
    p = str(tmp_path / f"g_{directed}_{weights}.nkb")
    nio.write_networkit_binary(g, p, chunks=3)
    back = nio.read_networkit_binary(spark, p)
    assert back.directed == directed
    assert back.weighted == (weights is not None)
    assert back.number_of_nodes() == 5

    def canon(gr):
        base = gr.edges if gr.directed else gr.canonical()
        return sorted(
            (r["src"], r["dst"], r["weight"]) for r in base.collect()
        )

    a, b = canon(g), canon(back)
    assert [(u, v) for u, v, _ in a] == [(u, v) for u, v, _ in b]
    for (_, _, wa), (_, _, wb) in zip(a, b):
        assert wa == pytest.approx(wb, rel=1e-6 if weights == "floats" else 0)


def test_nkb_header_fields(spark, tmp_path):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], num_nodes=3)
    p = str(tmp_path / "hdr.nkb")
    nio.write_networkit_binary(g, p, chunks=2)
    buf = open(p, "rb").read()
    assert buf[:8] == b"nkbg002\x00"
    _, features, nodes, chunks = struct.unpack_from("<4Q", buf, 8)
    assert features == 0 and nodes == 3 and chunks == 2


# ------------------------------------------------------- ClusteringProjector
def test_project_back(spark):
    # two triangles; coarsen by the natural split, then project back
    g = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    )
    labels = _labels(spark, [(i, 0 if i < 3 else 1) for i in range(6)])
    ppc = ParallelPartitionCoarsening(g, labels).run()
    mapping = ppc.get_fine_to_coarse_node_mapping()
    coarse_part = _labels(spark, [(0, 10), (1, 20)])
    fine = {r["id"]: r["label"] for r in project_back(mapping, coarse_part).collect()}
    # supers are dense ranks of labels {0,1} -> {0,1}
    assert fine == {0: 10, 1: 10, 2: 10, 3: 20, 4: 20, 5: 20}


def test_project_back_to_finest_two_levels(spark):
    g = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    )
    l1 = _labels(spark, [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2), (5, 2)])
    ppc1 = ParallelPartitionCoarsening(g, l1).run()
    m1 = ppc1.get_fine_to_coarse_node_mapping()
    coarse1 = ppc1.get_coarse_graph()
    l2 = _labels(spark, [(0, 0), (1, 0), (2, 1)])
    ppc2 = ParallelPartitionCoarsening(coarse1, l2).run()
    m2 = ppc2.get_fine_to_coarse_node_mapping()
    final = _labels(spark, [(0, 100), (1, 200)])
    fine = {
        r["id"]: r["label"]
        for r in project_back_to_finest(final, [m1, m2]).collect()
    }
    assert fine == {0: 100, 1: 100, 2: 100, 3: 100, 4: 200, 5: 200}
    # no levels: identity
    ident = {
        r["id"]: r["label"] for r in project_back_to_finest(final, []).collect()
    }
    assert ident == {0: 100, 1: 200}


# -------------------------------------------------------- PathGrowingMatcher
def test_path_growing_simple_path(spark):
    # path 0-1-2-3 with middle edge heaviest: optimal picks {0-1, 2-3}
    g = Graph.from_edge_list(
        spark, [(0, 1, 2.0), (1, 2, 3.0), (2, 3, 2.0)], weighted=True
    )
    pg = PathGrowingMatcher(g).run()
    got = {(r["u"], r["v"]) for r in pg.get_matching().collect()}
    # trace: start at degree-2 vertex 1 (tie of 1,2 -> smallest id);
    # heaviest alive edge 1-2 -> m1; continue at 2 with edge 2-3 -> m2;
    # then 0 isolated. m1 weight 3 > m2 weight 2.
    assert got == {(1, 2)}
    assert pg.matching_weight() == pytest.approx(3.0)


def test_path_growing_valid_matching_and_half_approx(spark):
    import itertools
    import random

    rng = random.Random(7)
    n = 10
    edges = []
    for u, v in itertools.combinations(range(n), 2):
        if rng.random() < 0.4:
            edges.append((u, v, float(rng.randint(1, 20))))
    g = Graph.from_edge_list(spark, edges, weighted=True)
    pg = PathGrowingMatcher(g).run()
    pairs = [(r["u"], r["v"]) for r in pg.get_matching().collect()]
    seen = [x for p in pairs for x in p]
    assert len(seen) == len(set(seen))  # valid matching
    ew = {(u, v): w for u, v, w in edges}
    assert pg.matching_weight() == pytest.approx(
        sum(ew[p] for p in pairs)
    )
    # brute-force maximum-weight matching for the 1/2-approx guarantee
    best = 0.0
    es = list(ew.items())

    def rec(i, used, w):
        nonlocal best
        best = max(best, w)
        if i >= len(es):
            return
        for j in range(i, len(es)):
            (u, v), wt = es[j]
            if u not in used and v not in used:
                rec(j + 1, used | {u, v}, w + wt)
    rec(0, frozenset(), 0.0)
    assert pg.matching_weight() >= 0.5 * best


def test_path_growing_rejects_self_loops(spark):
    g = Graph.from_edge_list(spark, [(0, 0), (0, 1)])
    with pytest.raises(ValueError):
        PathGrowingMatcher(g).run()


# ------------------------------------------------------ RandomSpanningForest
def test_random_spanning_forest_valid(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (6, 7)]
    g = Graph.from_edge_list(spark, edges, num_nodes=9)  # 8 isolated
    forest = {(r["src"], r["dst"]) for r in
              RandomSpanningForest(g, seed=3).run().get_forest().collect()}
    # components: {0..5}, {6,7}, {8} -> 5 + 1 + 0 tree edges
    assert len(forest) == 6
    stored = {(min(u, v), max(u, v)) for u, v in edges}
    assert forest <= stored
    # acyclic + spanning: union-find over forest edges joins each component
    parent = list(range(9))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for u, v in forest:
        ru, rv = find(u), find(v)
        assert ru != rv  # no cycle
        parent[ru] = rv
    assert len({find(i) for i in range(6)}) == 1
    assert find(6) == find(7)


def test_random_spanning_forest_uniform_on_triangle(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)])
    seen = set()
    for seed in range(12):
        t = frozenset(
            (r["src"], r["dst"])
            for r in RandomSpanningForest(g, seed=seed).run().get_forest().collect()
        )
        seen.add(t)
    # all 3 spanning trees of K3 should appear across seeds
    assert len(seen) == 3


def test_random_spanning_forest_deterministic(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    a = RandomSpanningForest(g, seed=5).run().get_forest().collect()
    b = RandomSpanningForest(g, seed=5).run().get_forest().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------- graphio dispatcher
def test_read_write_graph_dispatch(spark, tmp_path):
    from networkit_spark.sources.graphio import Format, GraphConverter, read_graph, write_graph

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], num_nodes=4)
    # METIS roundtrip through the dispatcher
    p = str(tmp_path / "g.metis")
    write_graph(g, p, Format.METIS)
    back = read_graph(spark, p, Format.METIS)
    assert back.number_of_nodes() == 4 and back.number_of_edges() == 3
    # NetworkitBinary through the dispatcher
    p2 = str(tmp_path / "g.nkb")
    write_graph(g, p2, Format.NetworkitBinary)
    back2 = read_graph(spark, p2, Format.NetworkitBinary)
    assert sorted(map(tuple, back2.canonical().select("src", "dst").collect())) == [
        (0, 1), (1, 2), (2, 3)
    ]
    # EdgeListTabOne preset roundtrip (1-based ids on disk)
    p3 = str(tmp_path / "g.el")
    write_graph(g, p3, Format.EdgeListTabOne)
    back3 = read_graph(spark, p3, Format.EdgeListTabOne)
    assert sorted(map(tuple, back3.canonical().select("src", "dst").collect())) == [
        (0, 1), (1, 2), (2, 3)
    ]
    # converter + unknown-format error
    conv = GraphConverter(Format.METIS, Format.GML)
    out = str(tmp_path / "g.gml")
    conv.convert(spark, p, out)
    assert open(out).read().startswith("graph [")
    with pytest.raises(ValueError):
        write_graph(g, str(tmp_path / "x"), Format.KONECT)
    with pytest.raises(IOError):
        read_graph(spark, str(tmp_path / "missing.metis"), Format.METIS)


# --------------------------------------------------------------- bfsSample
def test_bfs_sample(spark):
    from networkit_spark.operators.graphtools import bfs_sample

    # star + tail: from the hub, k=3 keeps hub + 3 closest by (hop, id)
    edges = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5)]
    g = Graph.from_edge_list(spark, edges, num_nodes=6)
    sub = bfs_sample(g, source=0, k=3)
    ids = {r["id"] for r in sub.vertices.collect()}
    assert ids == {0, 1, 2, 3}
    sub_edges = {tuple(r) for r in sub.canonical().select("src", "dst").collect()}
    assert sub_edges == {(0, 1), (0, 2), (0, 3)}


# --------------------------------------------------------- graphFromStream
def test_graph_from_stream(spark):
    from networkit_spark.streaming.events import graph_from_stream

    events = spark.createDataFrame(
        [
            ("NODE_ADDITION", 0, None, None),
            ("NODE_ADDITION", 1, None, None),
            ("NODE_ADDITION", 2, None, None),
            ("EDGE_ADDITION", 0, 1, 2.5),
            ("EDGE_ADDITION", 1, 2, 1.0),
            ("EDGE_REMOVAL", 1, 2, None),
        ],
        "etype string, u long, v long, w double",
    )
    g = graph_from_stream(spark, events, weighted=True, directed=False)
    assert g.number_of_nodes() == 3
    got = [tuple(r) for r in g.edges.collect()]
    assert got == [(0, 1, 2.5)]


# ----------------------------------------------------------- traversal API
def test_dfs_from_golden(spark):
    from networkit_spark.operators.traversal import dfs_edges_from, dfs_from

    #      0 - 1 - 3
    #      |     \
    #      2      4
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (1, 4)])
    order = [r["id"] for r in dfs_from(g, 0).orderBy("order").collect()]
    # stack: push 1,2 -> pop 2; pop 1, push 3,4 -> pop 4 -> pop 3
    assert order == [0, 2, 1, 4, 3]
    edges = [
        (r["u"], r["v"])
        for r in dfs_edges_from(g, 0).orderBy("order").collect()
    ]
    assert edges == [(0, 1), (0, 2), (1, 3), (1, 4)]


def test_bfs_from_order_and_edges(spark):
    from networkit_spark.operators.traversal import bfs_edges_from, bfs_from

    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    rows = bfs_from(g, 0).orderBy("order").collect()
    assert [r["id"] for r in rows] == [0, 1, 2, 3]
    assert [r["dist"] for r in rows] == [0, 1, 1, 2]
    tree = {(r["u"], r["v"]) for r in bfs_edges_from(g, 0).collect()}
    # 3's parent is min(1, 2) = 1
    assert tree == {(0, 1), (0, 2), (1, 3)}


# ----------------------------------------------------------------- gini
def test_gini_matches_reference_formula(spark):
    import random

    from networkit_spark.functions.stats import gini

    def ref_gini(values):
        sorted_list = sorted(values)
        height, area = 0, 0
        for value in sorted_list:
            height += value
            area += height - value / 2.0
        fair_area = height * len(values) / 2
        return (fair_area - area) / fair_area

    rng = random.Random(5)
    values = [rng.uniform(0, 10) for _ in range(200)] + [3.0] * 20  # ties
    df = spark.createDataFrame([(v,) for v in values], "x double")
    assert gini(df, "x") == pytest.approx(ref_gini(values), abs=1e-12)
    same = spark.createDataFrame([(2.0,)] * 50, "x double")
    assert gini(same, "x") == pytest.approx(0.0, abs=1e-12)
