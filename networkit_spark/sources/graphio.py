"""graphio — the reference's Python-layer format dispatcher
(``networkit/graphio.pyx:724-960``): a ``Format`` enumeration plus
``readGraph`` / ``writeGraph`` / ``GraphConverter`` that route to the
per-format readers and writers. This engine's twins live in
:mod:`networkit_spark.sources.io`; the dispatcher only maps names.

``Format.MAT`` (MATLAB .mat, v5) is supported via a minimal
stdlib-only codec in :mod:`networkit_spark.sources.io` (sparse or
dense-double square adjacency under a named key, little-endian,
miCOMPRESSED handled) — no scipy dependency.
"""

from __future__ import annotations

import enum
import os

from pyspark.sql import SparkSession

from networkit_spark.graph import Graph
from networkit_spark.sources import io as nio


class Format(enum.Enum):
    """``networkit.graphio.Format`` (``graphio.pyx:724-747``)."""

    SNAP = "snap"
    EdgeListSpaceZero = "edgelist-s0"
    EdgeListSpaceOne = "edgelist-s1"
    EdgeListTabZero = "edgelist-t0"
    EdgeListTabOne = "edgelist-t1"
    METIS = "metis"
    GraphML = "graphml"
    GEXF = "gexf"
    GML = "gml"
    EdgeListCommaOne = "edgelist-c1"
    GraphViz = "graphviz"
    DOT = "dot"
    EdgeList = "edgelist"
    LFR = "lfr"
    KONECT = "konect"
    GraphToolBinary = "graphtool"
    ThrillBinary = "thrill"
    NetworkitBinary = "networkit"
    MAT = "mat"
    MatrixMarket = "matrixmarket"  # this engine's extra (reader exists)


_EDGE_LIST_PRESETS = {
    Format.EdgeListCommaOne: {"separator": ",", "first_node": 1},
    Format.EdgeListSpaceOne: {"separator": " ", "first_node": 1},
    Format.EdgeListSpaceZero: {"separator": " ", "first_node": 0},
    Format.EdgeListTabOne: {"separator": "\t", "first_node": 1},
    Format.EdgeListTabZero: {"separator": "\t", "first_node": 0},
    Format.LFR: {"separator": "\t", "first_node": 1},
}


def read_graph(
    spark: SparkSession, path: str, fileformat: Format, **kwargs
) -> Graph | tuple:
    """``readGraph`` (``graphio.pyx:786-813``): dispatch on ``Format``.
    ``Format.EdgeList`` takes the custom ``EdgeListReader`` kwargs
    (separator / first_node / comment_prefix / continuous / directed);
    like the reference, ``continuous=False`` returns the node map
    alongside the graph."""
    path = os.path.expanduser(path)
    # a directory is fine for the Spark-text formats (write_edge_list
    # emits a directory of part files); the reference only knows files
    if not os.path.exists(path):
        raise IOError(f"{path} is not a file")
    if fileformat in _EDGE_LIST_PRESETS:
        preset = dict(_EDGE_LIST_PRESETS[fileformat])
        preset.update(kwargs)
        return nio.read_edge_list(spark, path, **preset)
    if fileformat == Format.EdgeList:
        if kwargs.get("continuous") is False:
            kwargs.setdefault("first_node", 0)
        return nio.read_edge_list(spark, path, **kwargs)
    readers = {
        Format.METIS: nio.read_metis,
        Format.GraphML: nio.read_graphml,
        Format.GEXF: nio.read_gexf,
        Format.SNAP: nio.read_snap,
        Format.KONECT: nio.read_konect,
        Format.GML: nio.read_gml,
        Format.GraphToolBinary: nio.read_graphtool_binary,
        Format.ThrillBinary: nio.read_thrill_binary,
        Format.NetworkitBinary: nio.read_networkit_binary,
        Format.MAT: nio.read_mat,
        Format.MatrixMarket: nio.read_matrix_market,
    }
    if fileformat not in readers:
        raise ValueError(
            f"unrecognized format/format not supported as input: {fileformat}"
        )
    return readers[fileformat](spark, path, **kwargs)


def write_graph(graph: Graph, path: str, fileformat: Format, **kwargs) -> None:
    """``writeGraph`` (``graphio.pyx:920-948``)."""
    writers = {
        Format.METIS: nio.write_metis,
        Format.SNAP: nio.write_snap,
        Format.GraphML: nio.write_graphml,
        Format.GEXF: nio.write_gexf,
        Format.GML: nio.write_gml,
        Format.DOT: nio.write_dot,
        Format.GraphViz: nio.write_dot,
        Format.GraphToolBinary: nio.write_graphtool_binary,
        Format.ThrillBinary: nio.write_thrill_binary,
        Format.NetworkitBinary: nio.write_networkit_binary,
        Format.MAT: nio.write_mat,
        Format.EdgeList: nio.write_edge_list,
    }
    if fileformat in _EDGE_LIST_PRESETS:
        preset = _EDGE_LIST_PRESETS[fileformat]
        return nio.write_edge_list(
            graph,
            path,
            separator=preset["separator"],
            first_node=preset["first_node"],
            **kwargs,
        )
    if fileformat not in writers:
        raise ValueError(
            f"format {fileformat} is not supported as output"
        )
    return writers[fileformat](graph, path, **kwargs)


class GraphConverter:
    """``graphio.GraphConverter`` (``graphio.pyx:951-963``)."""

    def __init__(self, in_format: Format, out_format: Format) -> None:
        self.in_format = in_format
        self.out_format = out_format

    def convert(self, spark: SparkSession, in_path: str, out_path: str) -> None:
        g = read_graph(spark, in_path, self.in_format)
        if isinstance(g, tuple):
            g = g[0]
        write_graph(g, out_path, self.out_format)

    def __str__(self) -> str:
        return f"GraphConverter: {self.in_format} => {self.out_format}"
