"""Eccentricity / NeighborhoodFunction / ANF hop-plot extensions
(``cpp/distance/{Eccentricity,NeighborhoodFunction,
NeighborhoodFunctionApproximation,HopPlotApproximation}.cpp``)."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators.distance import (
    Eccentricity,
    HopPlotApproximation,
    NeighborhoodFunction,
    NeighborhoodFunctionApproximation,
)


@pytest.fixture(scope="module")
def path5(spark):
    # path 0-1-2-3-4
    return Graph.from_edge_list(
        spark, [(i, i + 1) for i in range(4)], directed=False
    )


def test_eccentricity_path(path5):
    ecc = {r["id"]: r["ecc"] for r in Eccentricity.frame(path5).collect()}
    assert ecc == {0: 4, 1: 3, 2: 2, 3: 3, 4: 4}


def test_eccentricity_get_value(path5):
    farthest, ecc = Eccentricity.get_value(path5, 0)
    assert (farthest, ecc) == (4, 4)
    # middle node: both ends at distance 2 — smallest id wins the tie
    farthest, ecc = Eccentricity.get_value(path5, 2)
    assert (farthest, ecc) == (0, 2)


def test_neighborhood_function_path(path5):
    nf = NeighborhoodFunction(path5).run().get_neighborhood_function()
    # path of 5: dist-1 pairs 8 (ordered), dist-2 6, dist-3 4, dist-4 2
    assert nf == [8, 14, 18, 20]


def test_neighborhood_function_clique(spark):
    g = Graph.from_edge_list(
        spark,
        [(i, j) for i in range(4) for j in range(i + 1, 4)],
        directed=False,
    )
    nf = NeighborhoodFunction(g).run().get_neighborhood_function()
    assert nf == [12]  # K4: all 12 ordered pairs at distance 1


def test_neighborhood_function_rejects_disconnected(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(RuntimeError, match="connected"):
        NeighborhoodFunction(g).run()


def test_neighborhood_function_rejects_directed(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        NeighborhoodFunction(g)


def test_anf_approximation_tracks_exact(spark):
    # ring of 32: exact NF known; ANF with k=64 trials should land within
    # 25% at every hop (FM error ~1/sqrt(k))
    n = 32
    g = Graph.from_edge_list(
        spark, [(i, (i + 1) % n) for i in range(n)], directed=False
    )
    exact = NeighborhoodFunction(g).run().get_neighborhood_function()
    approx = (
        NeighborhoodFunctionApproximation(g, k=64)
        .run()
        .get_neighborhood_function()
    )
    assert len(approx) >= len(exact)
    for e, a in zip(exact, approx):
        assert a == pytest.approx(e, rel=0.25)


def test_hop_plot_monotone_and_terminal(spark):
    n = 16
    g = Graph.from_edge_list(
        spark, [(i, (i + 1) % n) for i in range(n)], directed=False
    )
    plot = HopPlotApproximation(g, k=64).run().get_hop_plot()
    assert plot[0] == pytest.approx(1.0 / n)
    hops = sorted(plot)
    vals = [plot[h] for h in hops]
    assert all(b >= a - 1e-12 for a, b in zip(vals, vals[1:]))
    # fully propagated: last value ≈ 1 (connected ring)
    assert vals[-1] == pytest.approx(1.0, rel=0.2)
