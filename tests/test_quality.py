"""Partition quality measures + comparison measures — exact values on
hand-checkable graphs (Coverage.cpp / EdgeCut.cpp / Modularity.cpp /
Conductance.cpp / the comparison measures, SURVEY §2.5, §2.7)."""

import math

import pytest

from networkit_spark import Graph
from networkit_spark.operators.quality import (
    conductance,
    coverage,
    edge_cut,
    jaccard_measure,
    modularity,
    nmi,
    partition_intersection,
    rand_index,
)


@pytest.fixture(scope="module")
def g(spark):
    # two triangles joined by one edge (weight 1 each, 7 edges)
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    return Graph.from_edge_list(spark, edges, directed=False)


@pytest.fixture(scope="module")
def split(spark):
    return spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )


def test_coverage_and_edge_cut(g, split):
    # 6 intra edges of 7 total; the bridge 2-3 is cut
    assert coverage(g, split) == pytest.approx(6 / 7)
    assert edge_cut(g, split) == pytest.approx(1.0)


def test_modularity_two_triangles(g, split):
    # vol(C) = 7 each (3 edges*2 + bridge endpoint), 2W = 14
    # Q = 6/7 - 2*(7/14)^2 = 6/7 - 1/2
    assert modularity(g, split) == pytest.approx(6 / 7 - 0.5, abs=1e-9)


def test_conductance(g, split):
    # cut=1, vol(C0)=7, vol(rest)=7 → 1/7
    assert conductance(g, split, cluster=0) == pytest.approx(1 / 7)


def test_comparison_measures_identical(split):
    assert rand_index(split, split) == pytest.approx(1.0)
    assert jaccard_measure(split, split) == pytest.approx(1.0)
    assert nmi(split, split) == pytest.approx(1.0)


def test_comparison_measures_disagree(spark, split):
    other = spark.createDataFrame(
        [(i, i % 2) for i in range(6)], "id long, label long"
    )
    # hand-computed contingency {0,1}x{0,1} = [[2,1],[1,2]]
    ri = rand_index(split, other)
    # pairs agreeing: within both = C(2,2)*2+...; use formula result
    assert 0.0 < ri < 1.0
    assert 0.0 <= jaccard_measure(split, other) < 1.0
    assert 0.0 <= nmi(split, other) < 1.0


def test_partition_intersection(spark, split):
    other = spark.createDataFrame(
        [(i, 0 if i < 2 else 1) for i in range(6)], "id long, label long"
    )
    inter = partition_intersection(split, other)
    labels = {r["id"]: r["label"] for r in inter.collect()}
    # groups: {0,1} (0,0), {2} (0,1), {3,4,5} (1,1) → 3 dense clusters
    assert labels[0] == labels[1]
    assert labels[3] == labels[4] == labels[5]
    assert len({labels[0], labels[2], labels[3]}) == 3
    assert set(labels.values()) == {0, 1, 2}
