"""DegreePreservingShuffle + Curveball invariants: exact degree
sequence, simplicity, edge count, seeded determinism."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.operators.randomization import (
    Curveball,
    DegreePreservingShuffle,
)


def _er_graph(spark, n=30, m=70, seed=5):
    rng = random.Random(seed)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(m * 2))
            if a != b
        }
    )[:m]
    return Graph(
        spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
        ),
        directed=False,
        weighted=False,
    )


def _degseq(g):
    return sorted(
        r["d"]
        for r in g.symmetrized()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    )


def _edgeset(g):
    return {
        (r["src"], r["dst"])
        for r in g.canonical().select("src", "dst").collect()
    }


def test_shuffle_preserves_degree_sequence(spark):
    g = _er_graph(spark)
    out = DegreePreservingShuffle(g, seed=3).run().get_graph()
    assert _degseq(out) == _degseq(g)
    ed = _edgeset(out)
    assert len(ed) == len(_edgeset(g))
    assert all(u != v for u, v in ed)
    # permutation maps within degree classes only
    sh = DegreePreservingShuffle(g, seed=3).run()
    perm = {r["id"]: r["new_id"] for r in sh.get_permutation().collect()}
    deg = {
        r["id"]: r["d"]
        for r in g.symmetrized()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }
    for old, new in perm.items():
        assert deg.get(old, 0) == deg.get(new, 0)


def test_curveball_invariants_and_determinism(spark):
    g = _er_graph(spark)
    before = _edgeset(g)
    cb = Curveball(g, number_of_rounds=4, seed=9).run()
    out = cb.get_graph()
    after = _edgeset(out)
    assert _degseq(out) == _degseq(g)
    assert len(after) == len(before)
    assert all(u != v for u, v in after)
    assert after != before  # trades actually moved something
    # seeded determinism
    again = _edgeset(Curveball(g, number_of_rounds=4, seed=9).run().get_graph())
    assert again == after
    other = _edgeset(Curveball(g, number_of_rounds=4, seed=10).run().get_graph())
    assert other != after


def test_curveball_directed_raises(spark):
    df = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    with pytest.raises(ValueError):
        Curveball(Graph(df, directed=True, weighted=True))
