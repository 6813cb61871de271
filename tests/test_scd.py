"""PageRankNibble — ACL push invariant + sweep-cut community recovery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph
from networkit_spark.operators.scd import PageRankNibble


def _graph(spark, edges):
    return Graph(
        spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
        ),
        directed=False,
        weighted=True,
    )


def _barbell(spark):
    k4a = [(u, v) for u in range(4) for v in range(u + 1, 4)]
    k4b = [(u + 4, v + 4) for u, v in k4a]
    return _graph(spark, k4a + k4b + [(3, 4)])


def test_recovers_planted_clique(spark):
    g = _barbell(spark)
    nib = PageRankNibble(g, seeds=[0], alpha=0.1, epsilon=1e-5).run()
    assert nib.expand_seed(0) == [0, 1, 2, 3]


def test_multi_seed_batched(spark):
    g = _barbell(spark)
    nib = PageRankNibble(g, seeds=[0, 7], alpha=0.1, epsilon=1e-5).run()
    assert nib.expand_seed(0) == [0, 1, 2, 3]
    assert nib.expand_seed(7) == [4, 5, 6, 7]


def test_acl_residual_invariant_and_mass_conservation(spark):
    g = _barbell(spark)
    eps = 1e-4
    nib = PageRankNibble(g, seeds=[0], alpha=0.15, epsilon=eps).run()
    rows = nib.get_ppr().collect()
    # vol of every node
    vols = {
        r["id"]: r["vol"]
        for r in g.symmetrized()
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("vol"))
        .collect()
    }
    for r in rows:
        assert r["r"] < eps * vols[r["id"]] + 1e-12
    # p + r is a probability decomposition of the seed's unit mass
    assert sum(r["p"] + r["r"] for r in rows) == pytest.approx(1.0)


def test_validation(spark):
    g = _barbell(spark)
    with pytest.raises(ValueError):
        PageRankNibble(g, seeds=[], alpha=0.1)
    with pytest.raises(ValueError):
        PageRankNibble(g, seeds=[0], alpha=1.5)
    with pytest.raises(ValueError):
        PageRankNibble(g, seeds=[0], epsilon=0.0)
