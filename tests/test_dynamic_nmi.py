"""DynamicNMIDistance (``cpp/community/DynamicNMIDistance.cpp``)."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators.quality import dynamic_nmi_distance


def test_dynamic_nmi_distance(spark):
    g = Graph.from_edge_list(
        spark, [(i, i + 1) for i in range(5)], directed=False
    )
    same = spark.createDataFrame(
        [(i, i % 2) for i in range(6)], "id long, label long"
    )
    relab = same.select("id", (10 - same.label).alias("label"))
    assert dynamic_nmi_distance(g, same, same) == pytest.approx(0.0)
    assert dynamic_nmi_distance(g, same, relab) == pytest.approx(0.0)
    # old partition also labels a node 99 that is NOT in the graph:
    # it must be ignored (isInBoth restriction)
    extra = same.unionAll(
        spark.createDataFrame([(99, 7)], "id long, label long")
    )
    assert dynamic_nmi_distance(g, extra, same) == pytest.approx(0.0)
    other = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, label long"
    )
    d = dynamic_nmi_distance(g, same, other)
    assert 0.0 < d <= 1.0
