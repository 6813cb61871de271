"""PageRank golden + semantics tests (SURVEY §5).

Goldens: the 8-node weighted Matlab vector
(CentralityGTest.cpp:545-585, tol 1e-4) and reference-semantics details
(final normalization, teleport-only for no-in-edge nodes, iterate-then-
check, maxIterations)."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph, PageRank
from networkit_spark.operators.pagerank import EigenvectorCentrality, KatzCentrality
from networkit_spark.plans.iterate import CheckpointStore

from test_fixtures import PR_WEIGHTED8_GOLDEN, pr_weighted8


def scores_dict(algo):
    return {r["id"]: r["score"] for r in algo.scores().collect()}


def test_pagerank_weighted8_matlab_golden(spark):
    # unroll=8 chains rounds per job — same fixed point, ~8x fewer
    # driver round-trips on these tight-tolerance tiny-graph runs
    g = pr_weighted8(spark)
    pr = PageRank(g, damp=0.85, tol=1e-8, norm="l2", unroll=8).run()
    s = scores_dict(pr)
    for i, want in enumerate(PR_WEIGHTED8_GOLDEN):
        assert abs(s[i] - want) < 1e-4, (i, s[i], want)
    assert abs(sum(s.values()) - 1.0) < 1e-9  # final normalization


def test_pagerank_directed_dangling_no_redistribution(spark):
    # 0→1→2: node 2 is dangling; reference leaks its mass and
    # normalizes at the end (PageRank.cpp:74-78). With damp=0.85 and
    # enough iterations: unnormalized fixed point p0=t, p1=t(1+d),
    # p2=t(1+d+d²) where t=0.05, d=0.85.
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=True, num_nodes=3)
    pr = PageRank(g, damp=0.85, tol=1e-12, norm="l1", unroll=8).run()
    s = scores_dict(pr)
    t, d = 0.05, 0.85
    raw = [t, t * (1 + d), t * (1 + d + d * d)]
    total = sum(raw)
    for i in range(3):
        assert abs(s[i] - raw[i] / total) < 1e-9


def test_pagerank_uniform_on_cycle(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    pr = PageRank(g, tol=1e-10, norm="l1", unroll=8).run()
    for v in scores_dict(pr).values():
        assert abs(v - 1.0 / 3) < 1e-9


def test_pagerank_max_iterations_honored(spark):
    # mirrors the reference plumbing test (test_algorithms.py:152-177)
    g = pr_weighted8(spark)
    pr = PageRank(g, tol=1e-16, max_iterations=2).run()
    assert pr.number_of_iterations() == 2


def test_pagerank_l1_vs_l2_both_converge(spark):
    g = pr_weighted8(spark)
    s1 = scores_dict(PageRank(g, tol=1e-8, norm="l1", unroll=8).run())
    s2 = scores_dict(PageRank(g, tol=1e-8, norm="l2", unroll=8).run())
    for i in s1:
        assert abs(s1[i] - s2[i]) < 1e-6


def test_pagerank_ranking_tie_rule(spark):
    # score desc, id asc on ties (Centrality.cpp:29-41). FP summation
    # makes symmetric nodes differ at ~1e-12, so exact ties are asserted
    # on a graph with exactly-equal scores: a 4-cycle (all 0.25).
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    pr4 = PageRank(g, tol=1e-12, norm="l1", unroll=8).run()
    assert [r["id"] for r in pr4.ranking().collect()] == [0, 1, 2, 3]

    g8 = pr_weighted8(spark)
    pr = PageRank(g8, tol=1e-10, unroll=8).run()
    top = pr.ranking(k=2).collect()
    assert {top[0]["id"], top[1]["id"]} == {2, 5}
    # symmetric pairs agree to FP tolerance
    s = scores_dict(pr)
    assert abs(s[0] - s[6]) < 1e-9 and abs(s[1] - s[7]) < 1e-9


def test_pagerank_checkpoint_resume_bit_identical(spark, tmp_path):
    """Kill after iter k, resume, identical final scores (SURVEY §5)."""
    g = pr_weighted8(spark)
    full = PageRank(g, tol=1e-8, norm="l1").run()
    want = scores_dict(full)

    base = str(tmp_path / "ckpt")
    store1 = CheckpointStore(base, run_id="runA")
    partial = PageRank(g, tol=1e-8, norm="l1", max_iterations=3, store=store1)
    partial.run()
    assert store1.completed_iters()[-1] == 3

    # resume from the same run dir; continues from iter 3
    store2 = CheckpointStore(base, run_id="runA")
    resumed = PageRank(g, tol=1e-8, norm="l1", store=store2).run()
    got = scores_dict(resumed)
    for i in want:
        assert math.isclose(got[i], want[i], rel_tol=0, abs_tol=1e-12)
    # metrics + per-partition lineage were recorded
    assert any("delta" in m for m in store2.metrics())
    iters_total = resumed.number_of_iterations() + 3
    assert iters_total >= full.number_of_iterations()


def test_eigenvector_weighted8(spark):
    # reference Matlab golden (CentralityGTest.cpp:504-543), tol 1e-4
    g = pr_weighted8(spark)
    # golden tolerance is 1e-3; the symmetric graph's near-degenerate
    # eigengap makes tighter residuals cost hundreds of rounds. unroll
    # chains 16 rounds/job (normalization deferred — scale-invariant).
    ev = EigenvectorCentrality(g, tol=2e-4, unroll=16).run()
    s = scores_dict(ev)
    golden = [0.2254, 0.1503, 0.5290, 0.4508, 0.3006, 0.5290, 0.2254, 0.1503]
    for i, want in enumerate(golden):
        assert abs(abs(s[i]) - want) < 1e-3


def test_katz_runs_and_normalized(spark):
    g = pr_weighted8(spark)
    # weighted graph: λmax ≈ 7.04, so the reference default
    # α = 1/(1+maxdeg) = 1/6 DIVERGES (αλ = 1.17) — pass a convergent α
    k = KatzCentrality(g, alpha=0.1, tol=1e-6, unroll=8).run()
    s = scores_dict(k)
    norm = math.sqrt(sum(v * v for v in s.values()))
    assert abs(norm - 1.0) < 1e-6
    assert s[2] > s[0]  # hub outranks leaf


def test_katz_divergence_guard(spark):
    import pytest

    g = pr_weighted8(spark)
    # default α=1/(1+maxdeg)=1/6 > 1/λmax on this weighted graph: the
    # engine must fail loudly instead of iterating forever
    with pytest.raises(RuntimeError, match="diverging"):
        KatzCentrality(g, tol=1e-6, unroll=8).run()
