"""Link-prediction index tests (KatzIndex walk counts)."""

import pytest

from networkit_spark import Graph


def test_katz_index_walk_counts(spark):
    # path 0-1-2: adjacency powers give A^l[u][v] walk counts
    from networkit_spark.operators.linkprediction import katz_index_scores

    g = Graph(
        spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
        ),
        directed=False,
        weighted=True,
    )
    pairs = spark.createDataFrame([(0, 1), (0, 2)], "u long, v long")
    out = {
        (r["u"], r["v"]): (list(r["walks"]), r["score"])
        for r in katz_index_scores(
            g, pairs, max_path_length=4, damping=0.5
        ).collect()
    }
    assert out[(0, 1)][0] == [1, 0, 2, 0]
    assert out[(0, 2)][0] == [0, 1, 0, 2]
    b = 0.5
    assert out[(0, 1)][1] == pytest.approx(1 * b + 2 * b**3)
    assert out[(0, 2)][1] == pytest.approx(1 * b**2 + 2 * b**4)
