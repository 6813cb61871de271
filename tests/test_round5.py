"""Round-5 additions: duplicate-edge guard on the exact dynamic
betweenness family, bucketed CSR persistence (co-located ingest), and
MAT codec hardening (nzmax padding, integer-typed sparse payloads)."""

import struct

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.operators.betweenness import Betweenness
from networkit_spark.operators.dynbetweenness import DynBetweenness

from tests.conftest import spark  # noqa: F401


def _graph(spark, pairs, directed=False):
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    return Graph(edges, directed=directed, weighted=False)


def _events(spark, pairs):
    return spark.createDataFrame(
        [("EDGE_ADDITION", a, b, 1.0) for a, b in pairs],
        "etype string, u long, v long, w double",
    )


# ------------------------------------------------- duplicate-edge guard


def test_dynbetweenness_duplicate_insert_raises(spark):
    # re-inserting an existing edge would double-count sigma in the
    # closed-form relaxation; the guard must reject it loudly
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    dyn = DynBetweenness(g).run()
    with pytest.raises(ValueError, match="already exists"):
        dyn.update(_events(spark, [(1, 2)]))


def test_dynbetweenness_duplicate_reversed_undirected_raises(spark):
    # undirected: (v, u) is the same edge as (u, v)
    g = _graph(spark, [(0, 1), (1, 2), (2, 3)])
    dyn = DynBetweenness(g).run()
    with pytest.raises(ValueError, match="already exists"):
        dyn.update(_events(spark, [(2, 1)]))


def test_dynbetweenness_still_equals_fresh_after_guard(spark):
    # the guard must not disturb legitimate insertions
    base = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4)]
    g = _graph(spark, base)
    dyn = DynBetweenness(g).run()
    dyn.update(_events(spark, [(1, 3)]))
    fresh = Betweenness(_graph(spark, base + [(1, 3)])).run()
    got = {r["id"]: round(r["score"], 9) for r in dyn.scores().collect()}
    want = {r["id"]: round(r["score"], 9) for r in fresh.scores().collect()}
    assert got == want


# ------------------------------------------------------ bucketed CSR


def test_persist_csr_bucketed_roundtrip(spark, tmp_path):
    pairs = [(i, (i * 7 + 3) % 40) for i in range(200)]
    g = _graph(spark, pairs, directed=True)
    path = str(tmp_path / "csr_bucketed")
    g.persist_csr(path, buckets=4)
    g2 = Graph.load_csr(spark, path, directed=True)
    assert g2.csr_buckets == 4
    want = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    got = sorted((r["src"], r["dst"]) for r in g2.edges.collect())
    assert got == want
    # stored transpose carries the same edge set
    rev = sorted((r["src"], r["dst"]) for r in g2.in_edges.collect())
    assert rev == want


def test_bucketed_scan_needs_no_exchange_for_src_agg(spark, tmp_path):
    # the point of the bucketed layout: groupBy("src") straight off
    # disk plans with NO shuffle exchange (catalog-recorded hash
    # partitioning satisfies the aggregation's distribution)
    g = _graph(spark, [(i % 20, i % 13) for i in range(100)], directed=True)
    path = str(tmp_path / "csr_agg")
    g.persist_csr(path, buckets=4)
    g2 = Graph.load_csr(spark, path, directed=True)
    plan = (
        g2.edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    # the range layout, by contrast, must shuffle for the same agg
    path2 = str(tmp_path / "csr_range")
    g.persist_csr(path2, num_partitions=4)
    g3 = Graph.load_csr(spark, path2, directed=True)
    plan2 = (
        g3.edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan2


def test_load_csr_bucketed_reregisters_after_catalog_loss(spark, tmp_path):
    # a NEW session has no catalog entries: simulate by dropping the
    # tables, then load again — the DDL re-registration over the
    # existing bucketed files must reproduce the same graph
    from networkit_spark.graph import _csr_table_names

    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], directed=True)
    path = str(tmp_path / "csr_reload")
    g.persist_csr(path, buckets=2)
    fwd_t, rev_t = _csr_table_names(path)
    spark.sql(f"DROP TABLE IF EXISTS {fwd_t}")
    spark.sql(f"DROP TABLE IF EXISTS {rev_t}")
    g2 = Graph.load_csr(spark, path, directed=True)
    assert g2.csr_buckets == 2
    assert sorted((r["src"], r["dst"]) for r in g2.edges.collect()) == [
        (0, 1),
        (1, 2),
        (2, 3),
        (3, 0),
    ]


def test_load_csr_plain_layout_still_works(spark, tmp_path):
    # legacy directories (no meta file) keep loading
    import os

    g = _graph(spark, [(0, 1), (1, 2)], directed=True)
    path = str(tmp_path / "csr_legacy")
    g.persist_csr(path)
    os.remove(f"{path}/_csr_meta.json")
    g2 = Graph.load_csr(spark, path, directed=True)
    assert g2.csr_buckets is None
    assert g2.number_of_edges() == 2


# ----------------------------------------------------- salted layout


def test_salted_iterate_layout_equals_unsalted(spark):
    from networkit_spark.plans.skew import (
        hub_keys,
        salted_iterate_layout,
        salted_state,
    )

    # vertex 0 emits half of all edges — a baked-in src hub
    pairs = [(0, i % 40 + 1) for i in range(60)] + [
        (i, (i + 1) % 40) for i in range(1, 41)
    ]
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    state = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("rank", (F.col("id") + 1).cast("double"))
    )
    want = sorted(
        (r["dst"], round(r["s"], 9))
        for r in edges.join(state, edges.src == state.id)
        .groupBy("dst")
        .agg(F.sum(F.col("rank") * F.col("weight")).alias("s"))
        .collect()
    )

    hubs = hub_keys(edges, "src", num_partitions=4)
    assert [r["src"] for r in hubs.collect()] == [0]
    big_s, small_s, _ = salted_iterate_layout(
        edges, state, "src", "id", hubs, salt_from="dst", n_salts=4,
        num_partitions=4,
    )
    got = sorted(
        (r["dst"], round(r["s"], 9))
        for r in big_s.alias("c")
        .join(
            small_s.alias("g"),
            (F.col("c.src") == F.col("g.id"))
            & (F.col("c._salt") == F.col("g._salt")),
        )
        .groupBy("c.dst")
        .agg(F.sum(F.col("g.rank") * F.col("c.weight")).alias("s"))
        .collect()
    )
    assert got == want

    # round-2 state re-salting keeps the invariant
    st2 = salted_state(state, "id", hubs, "src", 4)
    assert st2.where(F.col("id") == 0).count() == 4
    assert st2.where(F.col("id") != 0).count() == state.count() - 1


def test_pagerank_salt_hubs_equals_unsalted(spark):
    from networkit_spark import PageRank

    # vertex 0 emits ~60% of all edges — qualifies as a hub under
    # HUB_PARTITION_SHARE at any partition count used in tests
    pairs = [(0, i % 50 + 1) for i in range(150)] + [
        (i, i % 7 + 1) for i in range(1, 51)
    ]
    g = _graph(spark, pairs, directed=True)
    base = {
        r["id"]: r["score"]
        for r in PageRank(g, tol=1e-9, norm="l1").run().scores().collect()
    }
    for bc in (True, False):
        salted = PageRank(
            g, tol=1e-9, norm="l1", broadcast_ranks=bc, salt_hubs=4
        ).run()
        got = {r["id"]: r["score"] for r in salted.scores().collect()}
        assert set(got) == set(base)
        assert all(abs(got[k] - base[k]) < 1e-12 for k in base), bc


def test_pagerank_salt_hubs_noop_without_hub(spark):
    from networkit_spark import PageRank

    # ring graph: perfectly uniform degrees, no qualifying hub — the
    # salted path must detect that and run the plain layout
    pairs = [(i, (i + 1) % 20) for i in range(20)]
    g = _graph(spark, pairs, directed=True)
    a = PageRank(g, tol=1e-9, norm="l1").run().scores().collect()
    b = PageRank(g, tol=1e-9, norm="l1", salt_hubs=8).run().scores().collect()
    assert sorted((r["id"], round(r["score"], 12)) for r in a) == sorted(
        (r["id"], round(r["score"], 12)) for r in b
    )


def test_pagerank_salt_hubs_validation(spark):
    import pytest as _pytest

    from networkit_spark import PageRank

    g = _graph(spark, [(0, 1)], directed=True)
    with _pytest.raises(ValueError, match="salt_hubs"):
        PageRank(g, salt_hubs=1)


# --------------------------------------------------------- MAT codec


def test_write_mat_empty_graph_nzmax_pad(spark, tmp_path):
    # nnz=0: the flags word declares nzmax=1 and ir/pr carry one pad
    # entry (scipy's convention) — strict readers size buffers from
    # nzmax; the roundtrip must come back edgeless
    from networkit_spark.sources.io import read_mat, write_mat

    g = Graph(
        spark.createDataFrame([], "src long, dst long, weight double"),
        directed=False,
        vertices=spark.range(3).select(F.col("id").cast("long")),
    )
    p = str(tmp_path / "empty.mat")
    write_mat(g, p)
    with open(p, "rb") as f:
        data = f.read()
    # array-flags sub-element: class=sparse(5), nzmax=1
    # (offset: 128 header + 8 matrix tag + 8 flags tag)
    mclass, nzmax = struct.unpack_from("<II", data, 128 + 16)
    assert (mclass & 0xFF, nzmax) == (5, 1)
    g2 = read_mat(spark, p)
    assert g2.number_of_edges() == 0


def test_read_mat_integer_typed_pr_respects_stored_zero(spark, tmp_path):
    # MATLAB compresses integral-valued double data into integer
    # element types; an explicit stored ZERO in such a payload is NOT
    # an edge. Hand-build a 3x3 sparse matrix with miUINT8 values
    # [1, 0, 1] at (1,0), (2,0), (2,1).
    from networkit_spark.sources.io import (
        _MI_INT8,
        _MI_INT32,
        _MI_MATRIX,
        _MI_UINT8,
        _MI_UINT32,
        _mat_element,
        read_mat,
    )

    n = 3
    ir = [1, 2, 2]
    jc = [0, 2, 3, 3]
    body = b"".join(
        [
            _mat_element(_MI_UINT32, struct.pack("<II", 5, 3)),
            _mat_element(_MI_INT32, struct.pack("<ii", n, n)),
            _mat_element(_MI_INT8, b"G"),
            _mat_element(_MI_INT32, struct.pack("<3i", *ir)),
            _mat_element(_MI_INT32, struct.pack("<4i", *jc)),
            _mat_element(_MI_UINT8, bytes([1, 0, 1])),
        ]
    )
    p = str(tmp_path / "intpr.mat")
    with open(p, "wb") as f:
        f.write(
            b"MATLAB 5.0 MAT-file".ljust(116)
            + b"\x00" * 8
            + struct.pack("<H", 0x0100)
            + b"IM"
        )
        f.write(_mat_element(_MI_MATRIX, body))
    g = read_mat(spark, p)
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    # (2,0) stored value 0 → dropped; (1,0) and (2,1) kept (undirected,
    # canonical min/max ordering)
    assert got == [(0, 1), (1, 2)]
