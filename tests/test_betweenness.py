"""Betweenness / closeness family — golden values hand-computed with
the reference's exact conventions:

- ``Betweenness.cpp``: dependency accumulation over ALL sources; the
  undirected score is NOT halved (each ordered pair contributes), and
  ``normalized`` divides by (n-1)(n-2) for directed AND undirected.
- ``EstimateBetweenness.cpp:106``: sampled scores scale by 2n/k.
- ``Closeness.hpp:78-93``: standard = 1/Σd (×(n-1) normalized),
  generalized = (reached-1)/Σd/(n-1) (×(reached-1) normalized).
- ``HarmonicCloseness.cpp:36-47``: Σ 1/d, normalized /(n-1).
"""

import warnings

import pytest
from pyspark.sql import functions as F

from networkit_spark import (
    ApproxBetweenness,
    Betweenness,
    Closeness,
    Graph,
    HarmonicCloseness,
)
from networkit_spark.operators.betweenness import harmonic_closeness


def _graph(spark, pairs, directed=False):
    edges = spark.createDataFrame(
        [(u, v, 1.0) for u, v in pairs], "src long, dst long, weight double"
    )
    return Graph(edges, directed=directed, weighted=False)


def _scores(algo):
    return {r["id"]: r["score"] for r in algo.run().scores().collect()}


P4 = [(0, 1), (1, 2), (2, 3)]
STAR = [(0, 1), (0, 2), (0, 3)]


def test_betweenness_path_undirected(spark):
    # P4: per-source deltas sum to 4 at both interior nodes (each
    # ordered pair counted — no halving, Betweenness.cpp convention)
    got = _scores(Betweenness(_graph(spark, P4)))
    assert got == {0: 0.0, 1: 4.0, 2: 4.0, 3: 0.0}


def test_betweenness_star_normalized(spark):
    # center sits on all 3*2 ordered leaf pairs; normalized /((n-1)(n-2))
    got = _scores(Betweenness(_graph(spark, STAR), normalized=True))
    assert got[0] == pytest.approx(6.0 / (3 * 2))
    assert got[1] == got[2] == got[3] == 0.0


def test_betweenness_directed_path(spark):
    # 0→1→2→3: through 1: (0,2),(0,3); through 2: (0,3),(1,3)
    got = _scores(Betweenness(_graph(spark, P4, directed=True)))
    assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}


def test_estimate_scaling_2n_over_k(spark):
    # sampling ALL n sources ⇒ deltas equal the exact run's, scaled by
    # 2n/k = 2 (EstimateBetweenness.cpp:106)
    exact = _scores(Betweenness(_graph(spark, P4)))
    est = _scores(ApproxBetweenness(_graph(spark, P4), n_samples=4))
    assert est == {k: pytest.approx(2.0 * v) for k, v in exact.items()}


def test_betweenness_max_hops_truncation_warns(spark):
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _scores(ApproxBetweenness(_graph(spark, P4), max_hops=1))
    assert any("max_hops" in str(w.message) for w in rec)


def test_closeness_standard_path(spark):
    got = _scores(Closeness(_graph(spark, P4), variant="standard"))
    assert got[0] == pytest.approx(1.0 / 6.0)  # dists 1+2+3
    assert got[1] == pytest.approx(1.0 / 4.0)  # dists 1+1+2
    norm = _scores(
        Closeness(_graph(spark, P4), variant="standard", normalized=True)
    )
    assert norm[0] == pytest.approx(3.0 / 6.0)
    assert norm[1] == pytest.approx(3.0 / 4.0)


def test_closeness_standard_rejects_disconnected(spark):
    g = _graph(spark, [(0, 1), (2, 3)])
    with pytest.raises(RuntimeError, match="disconnected"):
        Closeness(g, variant="standard").run()


def test_closeness_generalized_disconnected(spark):
    # components {0,1} and {2}: node 0 → reached-1=1, Σd=1, /(n-1)=2
    edges = spark.createDataFrame(
        [(0, 1, 1.0)], "src long, dst long, weight double"
    )
    verts = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    g = Graph(edges, directed=False, weighted=False, vertices=verts)
    got = _scores(Closeness(g, variant="generalized"))
    assert got[0] == pytest.approx(1.0 / 1.0 / 2.0)
    assert got[2] == 0.0


def test_harmonic_closeness_path(spark):
    got = _scores(HarmonicCloseness(_graph(spark, P4)))
    assert got[0] == pytest.approx(1 + 0.5 + 1 / 3)
    assert got[1] == pytest.approx(1 + 1 + 0.5)
    norm = _scores(HarmonicCloseness(_graph(spark, P4), normalized=True))
    assert norm[0] == pytest.approx((1 + 0.5 + 1 / 3) / 3)


def test_harmonic_directed_uses_outgoing_distances(spark):
    # 0→1→2: h(0) = 1/d(0,1) + 1/d(0,2) = 1.5; h(2) = 0 (no out-paths)
    g = _graph(spark, [(0, 1), (1, 2)], directed=True)
    got = _scores(HarmonicCloseness(g))
    assert got[0] == pytest.approx(1.5)
    assert got[1] == pytest.approx(1.0)
    assert got[2] == 0.0


def test_harmonic_sampled_scales_n_over_k(spark):
    # sampling all nodes reproduces the exact scores (scale n/k = 1)
    g = _graph(spark, P4)
    exact = {r["id"]: r["score"] for r in harmonic_closeness(g).collect()}
    sampled = {
        r["id"]: r["score"] for r in harmonic_closeness(g, n_samples=4).collect()
    }
    assert sampled == {k: pytest.approx(v) for k, v in exact.items()}


def test_estimate_explicit_sources(spark):
    # P4 path, sources = {0}: only source 0's dependencies accumulate.
    # From 0: delta(1)=2 (paths to 2,3 pass through 1), delta(2)=1.
    # Scale 2n/k = 2*4/1 = 8 -> scores {1: 16, 2: 8}.
    from networkit_spark import EstimateBetweenness

    g = _graph(spark, P4)
    srcs = spark.createDataFrame([(0,)], "id long")
    s = _scores(EstimateBetweenness(g, sources=srcs))
    assert s[1] == pytest.approx(16.0)
    assert s[2] == pytest.approx(8.0)
    assert s[0] == 0.0 and s[3] == 0.0


def test_diameter_exact_and_estimate(spark):
    from networkit_spark.operators.distance import Diameter

    g = _graph(spark, P4)
    assert Diameter(g, algo="exact").run().get_diameter() == (3, 3)
    lo, hi = Diameter(g, algo="estimate").run().get_diameter()
    assert lo <= 3 <= hi
    star = _graph(spark, STAR)
    assert Diameter(star, algo="exact").run().get_diameter() == (2, 2)


def test_top_harmonic_closeness(spark):
    from networkit_spark import TopCloseness, TopHarmonicCloseness

    # star: center 0 has h=3, leaves h=1+1/2+1/2=2
    g = _graph(spark, STAR)
    tc = TopHarmonicCloseness(g, k=2).run()
    assert tc.topk_nodes_list() == [0, 1]  # tie among leaves -> smallest id
    assert tc.topk_scores_list()[0] == pytest.approx(3.0)
    t2 = TopCloseness(g, k=1).run()
    assert t2.topk_nodes_list() == [0]
