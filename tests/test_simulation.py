"""EpidemicSimulationSEIR — synchronous SEIR over the edge table.

Semantics pinned against ``cpp/simulation/EpidemicSimulationSEIR.cpp``
(the reference sweep is OpenMP-racy; the synchronous rounds here are
the deterministic variant, same divergence class as PLM/PLP):
- hand-traced exact census on a path graph at trans_p=1;
- conservation (populations sum to n every step), monotone R / S;
- trans_p=0 isolates patient zero;
- full infection on a connected graph at trans_p=1;
- seeded determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.simulation import EpidemicSimulationSEIR, S, E, I, R


def _graph(spark, pairs, n):
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, vertices=verts)


def _census(stats):
    """{t: {state: population}}"""
    out = {}
    for _zero, t, s, pop in stats:
        out.setdefault(t, {})[s] = pop
    return out


def test_seir_path_graph_exact_trace(spark):
    # path 0-1-2-3, zero=0, trans_p=1, e_time=1, i_time=1.
    # t=0: 0 infects 1 (S->E); 0: I->R (0-0>=1 is false... 0>=1 false) so
    #      0 stays I. census: S={2,3}, E={1}, I={0}.
    # t=1: 1 E->I? t-since=1>=1 yes BUT contacts come from round-start
    #      I={0}: 0 contacts 1 (already E, no-op); 0: 1-0>=1 -> R.
    #      census: S={2,3}, I={1}, R={0}.
    # t=2: I={1} contacts 0(R no-op) and 2 (S->E); 1: 2-1>=1 -> R... both
    #      apply to different nodes. census: S={3}, E={2}, R={0,1}.
    # t=3: no I (2 is E, promotes at 3-2>=1 -> I). census: S={3}, I={2}, R={0,1}.
    # t=4: 2 contacts 3 (S->E); 2 -> R. census: E={3}, R={0,1,2}.
    g = _graph(spark, [(0, 1), (1, 2), (2, 3)], 4)
    sim = EpidemicSimulationSEIR(
        g, t_max=5, trans_p=1.0, e_time=1, i_time=1, zero=0
    ).run()
    c = _census(sim.get_data())
    assert c[0] == {S: 2, E: 1, I: 1, R: 0}
    assert c[1] == {S: 2, E: 0, I: 1, R: 1}
    assert c[2] == {S: 1, E: 1, I: 0, R: 2}
    assert c[3] == {S: 1, E: 0, I: 1, R: 2}
    assert c[4] == {S: 0, E: 1, I: 0, R: 3}


def test_seir_conservation_and_monotonicity(spark):
    from networkit_spark.generators import erdos_renyi

    g = erdos_renyi(spark, 60, 0.08, seed=5)
    sim = EpidemicSimulationSEIR(
        g, t_max=12, trans_p=0.6, e_time=1, i_time=3, zero=0, seed=1
    ).run()
    c = _census(sim.get_data())
    n = g.number_of_nodes()
    prev_r, prev_s = -1, n + 1
    for t in sorted(c):
        pops = c[t]
        assert sum(pops.values()) == n
        assert pops[R] >= prev_r
        assert pops[S] <= prev_s
        prev_r, prev_s = pops[R], pops[S]


def test_seir_transp_zero_isolates_zero(spark):
    g = _graph(spark, [(0, 1), (1, 2)], 3)
    sim = EpidemicSimulationSEIR(
        g, t_max=6, trans_p=0.0, e_time=1, i_time=2, zero=1
    ).run()
    c = _census(sim.get_data())
    last = c[max(c)]
    assert last[S] == 2 and last[R] == 1 and last[E] == 0 and last[I] == 0


def test_seir_full_infection_connected(spark):
    g = _graph(spark, [(i, i + 1) for i in range(9)] + [(0, 9)], 10)
    sim = EpidemicSimulationSEIR(
        g, t_max=40, trans_p=1.0, e_time=1, i_time=2, zero=0
    ).run()
    final = {r["id"]: r["state"] for r in sim.state_frame().collect()}
    assert all(st == R for st in final.values())


def test_seir_deterministic_and_validates(spark):
    g = _graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], 4)
    a = EpidemicSimulationSEIR(g, t_max=8, trans_p=0.5, zero=2, seed=7).run()
    b = EpidemicSimulationSEIR(g, t_max=8, trans_p=0.5, zero=2, seed=7).run()
    assert a.get_data() == b.get_data()
    with pytest.raises(ValueError):
        EpidemicSimulationSEIR(g, trans_p=1.5)
    with pytest.raises(RuntimeError):
        EpidemicSimulationSEIR(g).get_data()
