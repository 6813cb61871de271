"""The Graph abstraction: an immutable edge DataFrame + table-level metadata.

Reference data model (NetworKit ``class Graph final``,
``include/networkit/graph/Graph.hpp:89``): mutable adjacency-list graph with
optional weights/direction, dense uint64 node ids
(``include/networkit/Globals.hpp:16-33``). Our analog is an immutable
DataFrame ``edges(src: long, dst: long, weight: double)`` plus a
``vertices(id: long)`` DataFrame; directedness/weightedness are
table-level metadata, and every "mutation" yields a new Graph (snapshot
semantics — the Spark-native replacement for ``addEdge``/``removeEdge``).

Behavioral contracts carried over from the reference:

- Multi-edges are allowed; ``addEdge`` appends unconditionally
  (``cpp/graph/Graph.cpp:549-579``) — so our constructors never
  dropDuplicates; dedup is the explicit :meth:`remove_multi_edges`.
- Self-loops are stored once even in undirected graphs
  (``Graph.cpp:576-578``) and removed only by the explicit
  :meth:`remove_self_loops` (``Graph.hpp:1305``).
- Undirected iteration sees each edge from both endpoints
  (``Graph.hpp:126-128``): :meth:`symmetrized` materializes that view.
  Per-edge iteration dedupes with ``u >= v`` (``Graph.hpp:208-218``):
  :meth:`canonical` materializes that view.
- ``degree``/``degreeIn``/``weightedDegree`` semantics per
  ``Graph.hpp:1174-1222`` / ``Graph.cpp:427-452``.

Scale notes: vertices/degrees are derived lazily and cached per Graph;
the edge table is the only big object. For cluster-scale use,
:meth:`persist_csr` writes the CSR-analog layout (range-partitioned by
``src``, sorted within partitions — precedent: the reference's chunked
binary CSR, ``cpp/io/NetworkitBinaryGraph.md:9-60``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("weight", DoubleType(), False),
    ]
)

#: ``defaultEdgeWeight = 1.0`` (``include/networkit/Globals.hpp:32``)
DEFAULT_EDGE_WEIGHT = 1.0


def zip_dense_rank(df: DataFrame, col: str, out_col: str = "rank") -> DataFrame:
    """``(col, out_col)`` map with ``out_col`` = 0-based global ascending
    rank of the distinct ``col`` values (``Partition::compact`` precedent,
    ``cpp/structures/Partition.cpp:69-98``).

    Scalable alternative to ``row_number() over (order by col)`` — that
    window has no PARTITION BY, so Spark funnels every distinct value
    through ONE task. Here ``orderBy`` range-partitions the sorted
    distinct values across the cluster and ``zipWithIndex`` assigns
    contiguous global indices from per-partition counts (one extra tiny
    job). Deterministic: pure function of the value set. Equivalent SQL:
    ``row_number() over (order by col) - 1``.
    """
    spark = df.sparkSession
    distinct_sorted = df.select(F.col(col)).distinct().orderBy(col)
    field = distinct_sorted.schema[0]
    rdd = distinct_sorted.rdd.map(lambda r: r[0]).zipWithIndex()
    out = StructType(
        [
            StructField(col, field.dataType, field.nullable),
            StructField(out_col, LongType(), False),
        ]
    )
    return spark.createDataFrame(rdd, out)


def _csr_table_names(path: str) -> tuple[str, str]:
    """Deterministic catalog names for a bucketed CSR directory — a
    pure function of the absolute path so any session reopening the
    same directory converges on the same table entries."""
    import hashlib
    import os as _os

    h = hashlib.md5(_os.path.abspath(path).encode()).hexdigest()[:10]
    return f"nk_csr_{h}_fwd", f"nk_csr_{h}_rev"


class Graph:
    """Immutable graph over an ``edges(src, dst, weight)`` DataFrame."""

    def __init__(
        self,
        edges: DataFrame,
        directed: bool = False,
        weighted: bool = False,
        vertices: DataFrame | None = None,
    ) -> None:
        cols = set(edges.columns)
        if not {"src", "dst"} <= cols:
            raise ValueError(f"edges must have src/dst columns, got {edges.columns}")
        if "weight" not in cols:
            edges = edges.withColumn("weight", F.lit(DEFAULT_EDGE_WEIGHT))
        self.edges = edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        self.directed = directed
        self.weighted = weighted
        self._vertices = (
            vertices.select(F.col("id").cast("long").alias("id")) if vertices is not None else None
        )
        self._sym: DataFrame | None = None
        self._degrees: DataFrame | None = None
        self._n: int | None = None
        self._m: int | None = None
        #: set by :meth:`load_csr` on the bucketed layout — the bucket
        #: count of the hash(src) edge layout and the stored transpose.
        self.csr_buckets: int | None = None
        self.in_edges: DataFrame | None = None

    # ------------------------------------------------------------------ build
    @classmethod
    def from_edge_list(
        cls,
        spark: SparkSession,
        edge_list: list[tuple],
        directed: bool = False,
        weighted: bool = False,
        num_nodes: int | None = None,
    ) -> "Graph":
        """Build from Python tuples ``(u, v[, w])`` — test fixtures only."""
        rows = [
            (int(e[0]), int(e[1]), float(e[2]) if len(e) > 2 else DEFAULT_EDGE_WEIGHT)
            for e in edge_list
        ]
        edges = spark.createDataFrame(rows, schema=EDGE_SCHEMA)
        vertices = None
        if num_nodes is not None:
            vertices = spark.range(num_nodes).select(F.col("id").cast("long"))
        return cls(edges, directed=directed, weighted=weighted, vertices=vertices)

    # ------------------------------------------------------------------ views
    @property
    def vertices(self) -> DataFrame:
        """``vertices(id)``; derived from edge endpoints unless given.

        The reference keeps an explicit node set with ``exists`` flags
        (``Graph.hpp:120-121``); isolated nodes therefore only exist here
        when a vertices DF was passed in.
        """
        if self._vertices is None:
            self._vertices = (
                self.edges.select(F.col("src").alias("id"))
                .unionAll(self.edges.select(F.col("dst").alias("id")))
                .distinct()
            )
        return self._vertices

    def symmetrized(self) -> DataFrame:
        """Both-direction edge view for neighborhood ops.

        For undirected graphs every edge {u,v} appears in both adjacency
        lists (``Graph.hpp:126-128``); self-loops appear once
        (``Graph.cpp:576-578``). For directed graphs this is out ∪ in —
        the neighbor set used by weakly-connected components
        (``cpp/components/ConnectedComponentsImpl.cpp:58-59``).
        """
        if self._sym is None:
            rev = self.edges.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
            self._sym = self.edges.unionAll(rev)
        return self._sym

    def canonical(self) -> DataFrame:
        """Per-edge view with ``src <= dst`` for undirected graphs
        (dedup rule ``Graph.hpp:208-218``); identity for directed."""
        if self.directed:
            return self.edges
        return self.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )

    def transpose(self) -> "Graph":
        """Edge-reversed graph (``GraphTools::transpose``,
        ``include/networkit/graph/GraphTools.hpp:233``)."""
        rev = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return Graph(rev, directed=self.directed, weighted=self.weighted,
                     vertices=self._vertices)

    # ------------------------------------------------------------- structural
    def remove_self_loops(self) -> "Graph":
        """``Graph::removeSelfLoops`` (``Graph.hpp:1305``)."""
        return Graph(
            self.edges.where(F.col("src") != F.col("dst")),
            directed=self.directed,
            weighted=self.weighted,
            vertices=self._vertices,
        )

    def remove_multi_edges(self, combine_weights: bool = False) -> "Graph":
        """``Graph::removeMultiEdges`` (``Graph.hpp:1310``).

        The reference keeps the first occurrence; weights of duplicates are
        dropped. ``combine_weights=True`` instead sums them (the useful
        variant for link graphs, where multiplicity = link count).
        Undirected duplicates are detected on the canonical form.
        """
        key = self.edges if self.directed else self.canonical()
        if combine_weights:
            deduped = key.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
        else:
            deduped = key.groupBy("src", "dst").agg(F.first("weight").alias("weight"))
        return Graph(deduped, directed=self.directed, weighted=self.weighted,
                     vertices=self._vertices)

    def to_undirected(self) -> "Graph":
        """``GraphTools::toUndirected`` (``GraphTools.hpp:206``)."""
        return Graph(self.edges, directed=False, weighted=self.weighted,
                     vertices=self._vertices)

    def to_unweighted(self) -> "Graph":
        """``GraphTools::toUnweighted`` (``GraphTools.hpp:214``)."""
        return Graph(
            self.edges.withColumn("weight", F.lit(DEFAULT_EDGE_WEIGHT)),
            directed=self.directed,
            weighted=False,
            vertices=self._vertices,
        )

    def subgraph_from_nodes(self, node_ids: DataFrame) -> "Graph":
        """Induced subgraph (``GraphTools::subgraphFromNodes``,
        ``GraphTools.hpp:196``): semi-join both endpoints against the set.
        ``node_ids`` is broadcast when small — Catalyst decides; for tiny
        sets callers can pass ``F.broadcast(node_ids)``."""
        ids = node_ids.select(F.col(node_ids.columns[0]).alias("id"))
        sub = (
            self.edges.join(ids, self.edges.src == ids.id, "left_semi")
            .join(ids, F.col("dst") == ids.id, "left_semi")
        )
        return Graph(sub, directed=self.directed, weighted=self.weighted,
                     vertices=ids)

    def append(self, other: "Graph") -> "Graph":
        """Disjoint union (``GraphTools::append``, ``GraphTools.hpp:241``):
        ``other``'s node ids are shifted past this graph's max id."""
        offset = (
            self.vertices.agg(F.max("id")).collect()[0][0] or -1
        ) + 1
        shifted = other.edges.select(
            (F.col("src") + offset).alias("src"),
            (F.col("dst") + offset).alias("dst"),
            "weight",
        )
        verts = self.vertices.unionAll(
            other.vertices.select((F.col("id") + offset).alias("id"))
        )
        return Graph(
            self.edges.unionAll(shifted),
            directed=self.directed,
            weighted=self.weighted or other.weighted,
            vertices=verts,
        )

    def merge(self, other: "Graph") -> "Graph":
        """Edge union on the shared id space (``GraphTools::merge``,
        ``GraphTools.hpp:250``): edges already present are not added
        again (dedup on (src, dst))."""
        mine = self.edges if self.directed else self.canonical()
        theirs = other.edges if other.directed else other.canonical()
        new_edges = theirs.join(mine.select("src", "dst"), ["src", "dst"], "left_anti")
        verts = self.vertices.unionAll(other.vertices).distinct()
        return Graph(
            mine.unionAll(new_edges),
            directed=self.directed,
            weighted=self.weighted or other.weighted,
            vertices=verts,
        )

    # ------------------------------------------------------------ aggregates
    def degrees(self) -> DataFrame:
        """``degrees(id, out_deg, in_deg, w_out_deg, w_in_deg)`` per node.

        Directed: out = count over ``src``, in = count over ``dst``
        (``Graph.hpp:1174-1222``). Undirected: both equal the symmetric
        degree; a self-loop counts once (``Graph.cpp:427-452`` with
        ``countSelfLoopsTwice=false``). Nodes absent from the edge table
        report 0 (left join against vertices).

        One shuffle per side; partial (map-side) aggregation makes hub
        vertices cheap — the hot key is pre-combined per input partition.
        """
        if self._degrees is not None:
            return self._degrees
        base = self.edges if self.directed else self.symmetrized()
        out = base.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("out_deg"),
            F.sum("weight").alias("w_out_deg"),
        )
        inn = base.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("in_deg"),
            F.sum("weight").alias("w_in_deg"),
        )
        degs = (
            self.vertices.join(out, "id", "left")
            .join(inn, "id", "left")
            .select(
                "id",
                F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
                F.coalesce("w_out_deg", F.lit(0.0)).alias("w_out_deg"),
                F.coalesce("w_in_deg", F.lit(0.0)).alias("w_in_deg"),
            )
        )
        self._degrees = degs
        return degs

    def number_of_nodes(self) -> int:
        if self._n is None:
            self._n = self.vertices.count()
        return self._n

    def number_of_edges(self) -> int:
        if self._m is None:
            self._m = self.edges.count()
        return self._m

    def number_of_self_loops(self) -> int:
        """``Graph::numberOfSelfLoops`` (``Graph.hpp:1377``)."""
        return self.edges.where(F.col("src") == F.col("dst")).count()

    def has_edge(self, u: int, v: int) -> bool:
        """Membership probe (``Graph::hasEdge``, ``Graph.cpp:789-800``)."""
        base = self.edges if self.directed else self.symmetrized()
        return bool(
            base.where((F.col("src") == u) & (F.col("dst") == v)).limit(1).count()
        )

    # ------------------------------------------------------------- layout
    def persist_csr(
        self,
        path: str,
        num_partitions: int | None = None,
        buckets: int | None = None,
    ) -> None:
        """Write the CSR-analog layout — the reference's chunked binary
        CSR (``cpp/io/NetworkitBinaryGraph.md:9-60``) in Parquet
        clothing; also writes the stored transpose (the binary format's
        transpose block, ``NetworkitBinaryGraph.md:53-60``) so
        in-neighborhood scans never re-shuffle.

        Two layouts:

        - ``buckets=None`` (default): range-partitioned by ``src``,
          sorted within partitions by ``(src, dst)`` — best for range
          pruning / sequential neighborhood scans.
        - ``buckets=B``: **hash-bucketed table** (``CLUSTERED BY (src)
          … INTO B BUCKETS``) — the catalog records the hash
          partitioning, so a fresh session's :meth:`load_csr` gets a
          scan whose output partitioning ALREADY satisfies every
          ``groupBy("src")`` / join-on-``src`` downstream: the
          degree aggregation and the contrib-build join of the
          iterative kernels plan with **zero exchange on the edge
          side**, straight off disk. Pick B = the cluster's shuffle
          partition count so per-round joins co-locate exactly.
        """
        df = self.edges
        if buckets:
            spark = df.sparkSession
            fwd_t, rev_t = _csr_table_names(path)
            for name, bcol, scols, sub in (
                (fwd_t, "src", ("src", "dst"), "edges"),
                (rev_t, "dst", ("dst", "src"), "edges_rev"),
            ):
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                # repartition on the SAME murmur3-hash the bucketing
                # uses, so each write task holds exactly one bucket and
                # emits exactly one file — without this, a W-task input
                # frame writes up to W x B files and the scan drowns in
                # file-open overhead at load time
                (
                    df.repartition(buckets, F.col(bcol))
                    .write.mode("overwrite")
                    .format("parquet")
                    .bucketBy(buckets, bcol)
                    .sortBy(*scols)
                    .option("path", f"{path}/{sub}")
                    .saveAsTable(name)
                )
            meta = {"layout": "bucketed", "buckets": buckets}
        else:
            if num_partitions:
                fwd = df.repartitionByRange(num_partitions, "src")
                rev = df.repartitionByRange(num_partitions, "dst")
            else:
                fwd = df.repartitionByRange("src")
                rev = df.repartitionByRange("dst")
            fwd.sortWithinPartitions("src", "dst").write.mode("overwrite").parquet(
                f"{path}/edges"
            )
            rev.sortWithinPartitions("dst", "src").write.mode("overwrite").parquet(
                f"{path}/edges_rev"
            )
            meta = {"layout": "range"}
        import json as _json

        with open(f"{path}/_csr_meta.json", "w") as f:
            _json.dump(meta, f)

    @classmethod
    def load_csr(
        cls, spark: SparkSession, path: str, directed: bool = False, weighted: bool = False
    ) -> "Graph":
        """Reopen a :meth:`persist_csr` directory. For the bucketed
        layout the (session-scoped) catalog entries are re-registered
        with the same ``CLUSTERED BY`` spec over the existing files —
        Spark's bucketed files carry the bucket id in the file name, so
        an external-table DDL over them is exact — and the returned
        graph carries ``csr_buckets`` / ``in_edges`` so kernels (and
        callers doing in-neighborhood scans) can exploit the co-located
        layout."""
        import json as _json
        import os as _os

        meta = {}
        meta_path = f"{path}/_csr_meta.json"
        if _os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = _json.load(f)
        if meta.get("layout") == "bucketed":
            b = int(meta["buckets"])
            fwd_t, rev_t = _csr_table_names(path)
            for name, bcol, scols, sub in (
                (fwd_t, "src", "src, dst", "edges"),
                (rev_t, "dst", "dst, src", "edges_rev"),
            ):
                if not spark.catalog.tableExists(name):
                    spark.sql(
                        f"CREATE TABLE {name} (src BIGINT, dst BIGINT, "
                        f"weight DOUBLE) USING PARQUET "
                        f"CLUSTERED BY ({bcol}) SORTED BY ({scols}) "
                        f"INTO {b} BUCKETS LOCATION '{path}/{sub}'"
                    )
            g = cls(spark.table(fwd_t), directed=directed, weighted=weighted)
            g.csr_buckets = b
            g.in_edges = spark.table(rev_t)
            return g
        g = cls(
            spark.read.parquet(f"{path}/edges"), directed=directed, weighted=weighted
        )
        g.csr_buckets = None
        g.in_edges = None
        return g
