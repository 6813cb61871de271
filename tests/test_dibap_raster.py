"""DibaP binary graph IO + ESRI-ASCII RasterReader point clouds.

Reference: ``cpp/io/DibapGraphReader.cpp:34-183`` (big-endian binary
CSR, ``v <= to[e]`` edge materialization), ``cpp/io/RasterReader.cpp:
20-101`` (6-line header, per-cell ``round(val * norm)`` uniform draws).
"""

import struct

import pytest

from networkit_spark.graph import Graph
from networkit_spark.sources.io import (
    read_dibap,
    read_raster_points,
    write_dibap,
)


def _canon(g):
    return {
        (r["src"], r["dst"], r["weight"])
        for r in g.canonical().select("src", "dst", "weight").collect()
    }


def test_dibap_golden_handcrafted(spark, tmp_path):
    # Path graph 0-1-2 with a vertex-weight block (dvw=1) the reference
    # parses and discards, int edge weights, and 2D coordinates.
    # CSR (both half-edges): of = [0,1,3,4]; to = [1, 0,2, 1].
    buf = struct.pack(">h", (ord("G") << 8) | ord("I"))
    buf += struct.pack(">2i", 3, 1)  # V=3, dvw=1
    buf += struct.pack(">3i", 7, 8, 9)  # vertex weights (ignored)
    buf += struct.pack(">4i", 0, 1, 3, 4)  # offsets
    buf += struct.pack(">4i", 1, 0, 2, 1)  # targets
    buf += struct.pack(">i", 1)  # dew=1
    buf += struct.pack(">4i", 5, 5, 2, 2)  # edge weights per half-edge
    buf += struct.pack(">i", 2)  # dxy=2
    buf += struct.pack(">6f", 0.0, 0.0, 0.5, 0.5, 1.0, 1.0)
    p = tmp_path / "g.dibap"
    p.write_bytes(buf)

    g, pts = read_dibap(spark, str(p), with_coordinates=True)
    assert not g.directed and g.weighted
    assert g.number_of_nodes() == 3
    # v <= to[e] keeps (0,1) from vertex 0 and (1,2) from vertex 1
    assert _canon(g) == {(0, 1, 5.0), (1, 2, 2.0)}
    coords = {r["id"]: (r["x"], r["y"]) for r in pts.collect()}
    assert coords[1] == (0.5, 0.5) and coords[2] == (1.0, 1.0)


def test_dibap_roundtrip_weighted_with_coords(spark, tmp_path):
    edges = [(0, 1, 3.0), (1, 2, 1.0), (2, 3, 4.0), (0, 3, 2.0), (1, 3, 7.0)]
    g = Graph(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=False,
        weighted=True,
    )
    pts = spark.createDataFrame(
        [(i, i * 0.25, 1.0 - i * 0.25) for i in range(4)],
        "id long, x double, y double",
    )
    p = str(tmp_path / "g.dibap")
    write_dibap(g, p, coordinates=pts)
    g2, pts2 = read_dibap(spark, str(p), with_coordinates=True)
    assert _canon(g2) == _canon(g)
    got = {r["id"]: (pytest.approx(r["x"]), pytest.approx(r["y"]))
           for r in pts2.collect()}
    assert got[3] == (pytest.approx(0.75), pytest.approx(0.25))


def test_dibap_roundtrip_unweighted(spark, tmp_path):
    g = Graph(
        spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0), (3, 4, 1.0)],
            "src long, dst long, weight double",
        ),
        directed=False,
        weighted=False,
        vertices=spark.range(5).selectExpr("id"),
    )
    p = str(tmp_path / "g.dibap")
    write_dibap(g, p)
    g2 = read_dibap(spark, str(p))
    assert not g2.weighted
    assert g2.number_of_nodes() == 5
    assert _canon(g2) == _canon(g)


def test_dibap_rejects_bad_magic(spark, tmp_path):
    p = tmp_path / "bad.dibap"
    p.write_bytes(struct.pack(">h", (ord("X") << 8) | ord("X")))
    with pytest.raises(ValueError):
        read_dibap(spark, str(p))


def _write_raster(path, grid):
    nrows, ncols = len(grid), len(grid[0])
    lines = [
        f"ncols         {ncols}",
        f"nrows         {nrows}",
        "xllcorner     0.0",
        "yllcorner     0.0",
        "cellsize      1.0",
        "NODATA_value  -9999",
    ]
    lines += [" ".join(str(v) for v in row) for row in grid]
    path.write_text("\n".join(lines) + "\n")


def test_raster_counts_and_cell_bounds(spark, tmp_path):
    # cell (row=0, col=0) -> 2 points in [0,1]x[0,1];
    # cell (row=1, col=2) -> 3 points in [2,3]x[-1,0]
    grid = [[2.0, 0.0, 0.0], [0.0, 0.0, 3.0]]
    p = tmp_path / "pop.asc"
    _write_raster(p, grid)
    pts = read_raster_points(spark, str(p), seed=7).collect()
    assert len(pts) == 5
    top = [r for r in pts if r["y"] >= 0.0]
    bot = [r for r in pts if r["y"] < 0.0]
    assert len(top) == 2 and len(bot) == 3
    assert all(0.0 <= r["x"] <= 1.0 for r in top)
    assert all(2.0 <= r["x"] <= 3.0 and -1.0 <= r["y"] <= 0.0 for r in bot)


def test_raster_normalization_and_determinism(spark, tmp_path):
    grid = [[10.0, 4.0], [0.0, 6.0]]
    p = tmp_path / "pop.asc"
    _write_raster(p, grid)
    # round(val * 0.5): 5 + 2 + 0 + 3 = 10 points
    a = read_raster_points(spark, str(p), normalization_factor=0.5, seed=3)
    b = read_raster_points(spark, str(p), normalization_factor=0.5, seed=3)
    ra, rb = a.collect(), b.collect()
    assert len(ra) == 10
    assert sorted(map(tuple, ra)) == sorted(map(tuple, rb))


def test_raster_point_frame_shape(spark, tmp_path):
    grid = [[12.0, 8.0], [6.0, 10.0]]
    p = tmp_path / "pop.asc"
    _write_raster(p, grid)
    pts = read_raster_points(spark, str(p), seed=11)
    assert pts.columns == ["id", "x", "y"]  # geometric-generator input shape
    rows = pts.collect()
    assert len(rows) == 36
    assert sorted(r["id"] for r in rows) == list(range(36))
