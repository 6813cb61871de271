"""Node2Vec — biased-walk validity, seeded determinism, feature shape.

Mirrors the reference test intent (FiniteEmbeddingTest.cpp: features
exist for every node and are finite) plus the walk-semantics contracts
from BiasedRandomWalk.cpp that ARE deterministic under our seeded
sampler.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph, Node2Vec


def _graph(spark, rows, directed=False):
    return Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=directed,
        weighted=True,
    )


@pytest.fixture(scope="module")
def karate_ish(spark):
    # two triangles bridged by a path — enough structure for the
    # p/q biases to matter
    edges = [
        (0, 1), (1, 2), (0, 2),
        (2, 3), (3, 4),
        (4, 5), (5, 6), (4, 6),
    ]
    return _graph(spark, [(a, b, 1.0) for a, b in edges])


def test_walks_are_paths_in_the_graph(spark, karate_ish):
    n2v = Node2Vec(
        karate_ish, walk_length=5, walks_per_node=2, dim=4, window=2, seed=3
    ).run()
    w = n2v.walks()
    a = w.select("walk_id", F.col("pos").alias("p"), F.col("node").alias("u"))
    b = w.select(
        "walk_id", (F.col("pos") - 1).alias("p"), F.col("node").alias("v")
    )
    steps = a.join(b, ["walk_id", "p"]).select("u", "v")
    sym = karate_ish.symmetrized().select(
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.lit(True).alias("ok"),
    )
    bad = steps.join(sym, ["u", "v"], "left").where(F.col("ok").isNull())
    assert bad.count() == 0
    # pos 0 is the start node encoded in the walk id
    starts = w.where(F.col("pos") == 0)
    assert (
        starts.where(F.col("node") != (F.col("walk_id") / 2).cast("long"))
        .count()
        == 0
    )


def test_seeded_determinism(spark, karate_ish):
    def run(seed):
        n2v = Node2Vec(
            karate_ish, walk_length=4, walks_per_node=2, dim=4,
            window=2, seed=seed,
        ).run()
        walks = sorted(
            (r["walk_id"], r["pos"], r["node"])
            for r in n2v.walks().collect()
        )
        feats = {
            r["id"]: tuple(round(x, 9) for x in r["feature"])
            for r in n2v.get_features().collect()
        }
        return walks, feats

    w1, f1 = run(11)
    w2, f2 = run(11)
    w3, _ = run(12)
    assert w1 == w2
    assert f1 == f2
    assert w1 != w3  # different seed must change at least one step


def test_pq_bias_forces_drift(spark):
    # path 0-1-2: from 0 the first hop is 1; with p huge (return bias
    # ~0) the only other candidate wins every time: pos 2 must be 2
    g = _graph(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    n2v = Node2Vec(
        g, p=1e12, q=1.0, walk_length=3, walks_per_node=4, dim=2,
        window=2, seed=5,
    ).run()
    w = n2v.walks()
    from_zero = w.where((F.col("walk_id") < 4) & (F.col("pos") == 2))
    rows = from_zero.collect()
    assert rows and all(r["node"] == 2 for r in rows)


def test_features_full_finite_normalized(spark, karate_ish):
    dim = 6
    n2v = Node2Vec(
        karate_ish, walk_length=5, walks_per_node=3, dim=dim,
        window=3, seed=9,
    ).run()
    rows = n2v.get_features().collect()
    assert len(rows) == 7  # one row per node
    for r in rows:
        assert len(r["feature"]) == dim
        assert all(math.isfinite(x) for x in r["feature"])
        norm = math.sqrt(sum(x * x for x in r["feature"]))
        assert norm == pytest.approx(1.0, abs=1e-9) or norm == 0.0


def test_validation(spark, karate_ish):
    with pytest.raises(ValueError):
        Node2Vec(karate_ish, p=0.0)
    with pytest.raises(ValueError):
        Node2Vec(karate_ish, walk_length=0)
