"""Graph file IO + GraphTools append/merge tests."""

import os

import pytest

from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.sources.io import (
    read_edge_list,
    read_metis,
    read_partition,
    read_snap,
    write_edge_list,
    write_partition,
)


def _write(tmp_path, name, text):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        f.write(text)
    return p


def test_read_edge_list_continuous(spark, tmp_path):
    p = _write(tmp_path, "g.txt", "# comment\n0 1\n1 2\n2 0\n")
    g = read_edge_list(spark, p, directed=True)
    assert not g.weighted
    assert g.number_of_edges() == 3
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {(0, 1), (1, 2), (2, 0)}


def test_read_edge_list_weighted_autodetect(spark, tmp_path):
    p = _write(tmp_path, "gw.txt", "0 1 2.5\n1 2 0.5\n")
    g = read_edge_list(spark, p, directed=True)
    assert g.weighted
    w = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert w == {(0, 1): 2.5, (1, 2): 0.5}


def test_read_edge_list_first_node(spark, tmp_path):
    p = _write(tmp_path, "g1.txt", "1 2\n2 3\n")
    g = read_edge_list(spark, p, first_node=1, directed=True)
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {(0, 1), (1, 2)}


def test_read_edge_list_dictionary(spark, tmp_path):
    # continuous=False: string tokens, dict-encoded (EdgeListReader.cpp:60-78)
    p = _write(tmp_path, "gs.txt", "alice bob\nbob carol\ncarol alice\n")
    g, node_map = read_edge_list(spark, p, continuous=False, directed=False)
    m = {r["token"]: r["id"] for r in node_map.collect()}
    assert sorted(m) == ["alice", "bob", "carol"]
    assert sorted(m.values()) == [0, 1, 2]  # dense lexicographic
    assert m["alice"] == 0
    assert g.number_of_nodes() == 3 and g.number_of_edges() == 3


def test_read_snap(spark, tmp_path):
    p = _write(tmp_path, "snap.txt", "# FromNodeId\tToNodeId\n0\t1\n1\t2\n")
    g = read_snap(spark, p, directed=True)
    assert g.number_of_edges() == 2


def test_read_metis(spark, tmp_path):
    # triangle as METIS: 3 nodes 3 edges, 1-based neighbor lists
    p = _write(tmp_path, "g.metis", "3 3\n2 3\n1 3\n1 2\n")
    g = read_metis(spark, p)
    assert g.number_of_nodes() == 3
    assert g.number_of_edges() == 3  # canonical u<=v kept once
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {(0, 1), (0, 2), (1, 2)}


def test_write_read_edge_list_roundtrip(spark, tmp_path):
    g = Graph.from_edge_list(
        spark, [(0, 1, 2.0), (1, 2, 3.0)], directed=True, weighted=True
    )
    out = str(tmp_path / "out")
    write_edge_list(g, out)
    g2 = read_edge_list(spark, out + "/*.txt", directed=True)
    assert {(r["src"], r["dst"], r["weight"]) for r in g2.edges.collect()} == {
        (0, 1, 2.0),
        (1, 2, 3.0),
    }


def test_partition_roundtrip(spark, tmp_path):
    labels = spark.createDataFrame([(0, 5), (1, 5), (2, 7)], "id long, label long")
    p = str(tmp_path / "part")
    write_partition(labels, p)
    back = read_partition(spark, p)
    assert {(r["id"], r["label"]) for r in back.collect()} == {(0, 5), (1, 5), (2, 7)}


def test_graph_append(spark):
    a = Graph.from_edge_list(spark, [(0, 1)], num_nodes=2)
    b = Graph.from_edge_list(spark, [(0, 1), (1, 2)], num_nodes=3)
    c = a.append(b)
    assert c.number_of_nodes() == 5
    assert {(r["src"], r["dst"]) for r in c.edges.collect()} == {(0, 1), (2, 3), (3, 4)}


def test_graph_merge(spark):
    a = Graph.from_edge_list(spark, [(0, 1), (1, 2)])
    b = Graph.from_edge_list(spark, [(1, 2), (2, 3)])
    c = a.merge(b)
    assert {(r["src"], r["dst"]) for r in c.edges.collect()} == {
        (0, 1),
        (1, 2),
        (2, 3),
    }


def test_read_konect(spark, tmp_path):
    from networkit_spark.sources.io import read_konect

    p = tmp_path / "g.konect"
    p.write_text("% asym weighted\n% 3 3\n1 2 2.5\n2 3 1.0\n3 1 4.0\n")
    g = read_konect(spark, str(p))
    assert g.directed and g.weighted
    assert {(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()} == {
        (0, 1, 2.5), (1, 2, 1.0), (2, 0, 4.0)
    }
    p2 = tmp_path / "g2.konect"
    p2.write_text("% sym unweighted\n1 2\n2 3\n")
    g2 = read_konect(spark, str(p2))
    assert not g2.directed and not g2.weighted


def test_read_matrix_market(spark, tmp_path):
    from networkit_spark.sources.io import read_matrix_market

    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% comment\n3 3 2\n1 2 1.5\n2 3 2.5\n"
    )
    g = read_matrix_market(spark, str(p))
    assert not g.directed and g.weighted
    assert g.number_of_nodes() == 3
    assert {(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()} == {
        (0, 1, 1.5), (1, 2, 2.5)
    }


def test_gml_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io import read_gml, write_gml

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], num_nodes=3)
    p = tmp_path / "g.gml"
    write_gml(g, str(p))
    back = read_gml(spark, str(p))
    assert not back.directed
    assert back.number_of_nodes() == 3
    assert {(r["src"], r["dst"]) for r in back.canonical().collect()} == {
        (0, 1), (1, 2), (0, 2)
    }


def test_write_metis_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io import read_metis, write_metis

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], num_nodes=4)  # node 3 isolated
    p = tmp_path / "g.graph"
    write_metis(g, str(p))
    back = read_metis(spark, str(p))
    assert back.number_of_nodes() == 4
    assert {(r["src"], r["dst"]) for r in back.canonical().collect()} == {
        (0, 1), (1, 2)
    }


def test_write_snap_dot(spark, tmp_path):
    from networkit_spark.sources.io import write_dot, write_snap

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], num_nodes=3)
    sp = tmp_path / "g.snap"
    write_snap(g, str(sp))
    lines = sp.read_text().strip().splitlines()
    assert lines[0] == "p 3 2 u u 0"
    assert set(lines[1:]) == {"0 1", "1 2"}
    dp = tmp_path / "g.dot"
    write_dot(g, str(dp))
    txt = dp.read_text()
    assert txt.startswith("graph {") and "0 -- 1;" in txt
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    write_dot(gd, str(dp))
    assert "digraph" in dp.read_text() and "0 -> 1;" in dp.read_text()


def test_graphml_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io import read_graphml, write_graphml

    g = Graph(
        spark.createDataFrame(
            [(0, 1, 2.5), (1, 2, 1.0)], "src long, dst long, weight double"
        ),
        directed=False,
        weighted=True,
        vertices=spark.createDataFrame([(0,), (1,), (2,)], "id long"),
    )
    p = tmp_path / "g.graphml"
    write_graphml(g, str(p))
    back = read_graphml(spark, str(p))
    assert not back.directed and back.weighted
    assert {(r["src"], r["dst"], r["weight"]) for r in back.canonical().collect()} == {
        (0, 1, 2.5), (1, 2, 1.0)
    }
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    write_graphml(gd, str(p))
    assert read_graphml(spark, str(p)).directed


def test_gexf_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io import read_gexf, write_gexf

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], num_nodes=4, directed=True)
    p = tmp_path / "g.gexf"
    write_gexf(g, str(p))
    back = read_gexf(spark, str(p))
    assert back.directed and back.number_of_nodes() == 4
    assert {(r["src"], r["dst"]) for r in back.edges.collect()} == {(0, 1), (1, 2)}


def test_read_dgs_events(spark, tmp_path):
    from networkit_spark.sources.io import read_dgs
    from networkit_spark.streaming.events import apply_events

    p = tmp_path / "s.dgs"
    p.write_text(
        "DGS004\nnull 0 0\n"
        "an A\nan B\nan C\n"
        "ae e1 A B\nae e2 B C weight=3.0\n"
        "st\n"
        "ce A-B weight=2.0\nde B-C\n"
    )
    ev = read_dgs(spark, str(p))
    rows = [tuple(r) for r in ev.orderBy("seq").collect()]
    assert rows[0] == (0, "NODE_ADDITION", 0, None, None)
    assert rows[3] == (3, "EDGE_ADDITION", 0, 1, 1.0)
    assert rows[4] == (4, "EDGE_ADDITION", 1, 2, 3.0)
    assert rows[5][1] == "TIME_STEP"
    assert rows[6] == (6, "EDGE_WEIGHT_UPDATE", 0, 1, 2.0)
    assert rows[7] == (7, "EDGE_REMOVAL", 1, 2, None)
    # replay onto an empty graph: A-B at weight 2.0 survives
    g0 = Graph(
        spark.createDataFrame([], "src long, dst long, weight double"),
        directed=False,
        weighted=True,
    )
    g1 = apply_events(g0, ev)
    assert [tuple(r) for r in g1.edges.select("src", "dst", "weight").collect()] == [
        (0, 1, 2.0)
    ]
    bad = tmp_path / "bad.dgs"
    bad.write_text("DGS000\n")
    with pytest.raises(ValueError):
        read_dgs(spark, str(bad))


def _edge_set(g):
    return {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}


def test_graphtool_binary_roundtrip_undirected(spark, tmp_path):
    from networkit_spark.sources.io import (
        read_graphtool_binary,
        write_graphtool_binary,
    )

    g = Graph(
        spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 1.0)],
            "src long, dst long, weight double",
        ),
        directed=False,
        weighted=False,
    )
    p = str(tmp_path / "g.gt")
    write_graphtool_binary(g, p)
    g2 = read_graphtool_binary(spark, p)
    assert not g2.directed
    assert g2.number_of_nodes() == 4
    assert g2.number_of_edges() == 4
    # undirected gt stores each edge once with v <= u
    assert _edge_set(g2) == {(1, 0), (2, 1), (3, 2), (3, 0)}


def test_graphtool_binary_roundtrip_directed_wide(spark, tmp_path):
    from networkit_spark.sources.io import (
        read_graphtool_binary,
        write_graphtool_binary,
    )

    # n = 300 forces the 2-byte adjacency width branch
    rows = [(i, (i * 7 + 1) % 300, 1.0) for i in range(300)]
    g = Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=True,
        weighted=False,
    )
    p = str(tmp_path / "wide.gt")
    write_graphtool_binary(g, p)
    g2 = read_graphtool_binary(spark, p)
    assert g2.directed
    assert g2.number_of_nodes() == 300
    assert _edge_set(g2) == {(i, (i * 7 + 1) % 300) for i in range(300)}


def test_graphtool_binary_big_endian(spark, tmp_path):
    from networkit_spark.sources.io import (
        read_graphtool_binary,
        write_graphtool_binary,
    )

    g = Graph(
        spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double"),
        directed=True,
        weighted=False,
    )
    p = str(tmp_path / "be.gt")
    write_graphtool_binary(g, p, little_endian=False)
    g2 = read_graphtool_binary(spark, p)
    assert _edge_set(g2) == {(0, 1)}


def test_graphtool_binary_broken_header(spark, tmp_path):
    from networkit_spark.sources.io import read_graphtool_binary

    p = str(tmp_path / "bad.gt")
    with open(p, "wb") as f:
        f.write(b"notagtfile")
    with pytest.raises(ValueError):
        read_graphtool_binary(spark, p)


def test_thrill_binary_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io import read_thrill_binary, write_thrill_binary

    # includes an isolated node (1) → varint degree 0 record
    g = Graph(
        spark.createDataFrame(
            [(0, 2, 1.0), (2, 3, 1.0), (0, 3, 1.0)],
            "src long, dst long, weight double",
        ),
        directed=False,
        weighted=False,
        vertices=spark.range(4).select(F.col("id")),
    )
    p = str(tmp_path / "g.thrill")
    write_thrill_binary(g, p)
    g2 = read_thrill_binary(spark, p)
    assert not g2.directed
    assert g2.number_of_nodes() == 4
    # half-edges stored with u <= v
    assert _edge_set(g2) == {(0, 2), (0, 3), (2, 3)}


def test_thrill_binary_split_files(spark, tmp_path):
    from networkit_spark.sources.io import read_thrill_binary, write_thrill_binary

    g = Graph(
        spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
        ),
        directed=False,
        weighted=False,
    )
    whole = str(tmp_path / "whole.thrill")
    write_thrill_binary(g, whole)
    blob = open(whole, "rb").read()
    # split mid-stream across two files; the reader concatenates
    p1, p2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    open(p1, "wb").write(blob[:5])
    open(p2, "wb").write(blob[5:])
    g2 = read_thrill_binary(spark, [p1, p2])
    assert _edge_set(g2) == {(0, 1), (1, 2)}
    # varint large-degree path: node 0 with 200 neighbors (2-byte varint)
    rows = [(0, v, 1.0) for v in range(1, 201)]
    g3 = Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=False,
        weighted=False,
    )
    p3 = str(tmp_path / "hub.thrill")
    write_thrill_binary(g3, p3)
    g4 = read_thrill_binary(spark, p3)
    assert g4.number_of_edges() == 200
    assert g4.number_of_nodes() == 201


def test_mat_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io import read_mat, write_mat

    g = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 3), (0, 3), (1, 3)],
        directed=False, num_nodes=5,
    )
    p = str(tmp_path / "g.mat")
    write_mat(g, p, key="G")
    g2 = read_mat(spark, p, key="G")
    got = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert got == {(0, 1), (1, 2), (2, 3), (0, 3), (1, 3)}
    assert g2.number_of_nodes() == 5  # isolated node 4 preserved via dims
    with pytest.raises(KeyError):
        read_mat(spark, p, key="A")


def test_mat_reader_compressed_and_dense(spark, tmp_path):
    """Exercise the miCOMPRESSED wrapper and the dense-double class the
    way scipy.io.savemat would produce them (hand-built v5 bytes)."""
    import struct
    import zlib

    from networkit_spark.sources.io import read_mat

    def element(mtype, payload):
        pad = (-len(payload)) % 8
        return struct.pack("<II", mtype, len(payload)) + payload + b"\x00" * pad

    # dense 3x3 double matrix, column-major: edges 0-1, 1-2 (symmetric)
    a = [0.0] * 9
    for (u, v) in [(0, 1), (1, 2)]:
        a[v * 3 + u] = 1.0
        a[u * 3 + v] = 1.0
    body = b"".join([
        element(6, struct.pack("<II", 6, 0)),          # flags: mxDOUBLE
        element(5, struct.pack("<ii", 3, 3)),          # dims
        element(1, b"G"),                              # name
        element(9, struct.pack("<9d", *a)),            # pr
    ])
    matrix = element(14, body)
    header = (
        b"MATLAB 5.0 MAT-file, test".ljust(116)
        + b"\x00" * 8 + struct.pack("<H", 0x0100) + b"IM"
    )
    p = str(tmp_path / "dense.mat")
    with open(p, "wb") as f:
        f.write(header)
        f.write(element(15, zlib.compress(matrix)))    # miCOMPRESSED
    g = read_mat(spark, p)
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == {(0, 1), (1, 2)}
    assert g.number_of_nodes() == 3


def test_mat_via_dispatcher(spark, tmp_path):
    from networkit_spark.sources.graphio import Format, read_graph, write_graph

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    p = str(tmp_path / "d.mat")
    write_graph(g, p, Format.MAT)
    g2 = read_graph(spark, p, Format.MAT)
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == {(0, 1), (1, 2)}
