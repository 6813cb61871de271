"""GCE seed expansion (``cpp/scd/GCE.cpp``) vs an in-test pure-Python
twin of the reference greedy (same formulas, same deterministic
max-dQ/min-id tie rule as the engine)."""

import pytest

from networkit_spark import Graph
from networkit_spark.operators.scd import GCE


def _gce_py(edges, seed, objective):
    """Reference greedy (GCE.cpp:44-285) with the engine's tie rule."""
    adj = {}
    for u, v, w in edges:
        if u == v:
            continue
        adj.setdefault(u, {}).setdefault(v, 0.0)
        adj.setdefault(v, {}).setdefault(u, 0.0)
        adj[u][v] += w
        adj[v][u] += w
    wdeg = {u: sum(nb.values()) for u, nb in adj.items()}
    C = {seed}
    while True:
        intW = sum(w for u in C for v, w in adj.get(u, {}).items() if v in C) / 2
        extW = sum(w for u in C for v, w in adj.get(u, {}).items() if v not in C)
        shell = {}
        for u in C:
            for v, w in adj.get(u, {}).items():
                if v not in C:
                    shell[v] = shell.get(v, 0.0) + w
        best = None
        for v in sorted(shell):
            deg_int = shell[v]
            deg_ext = wdeg[v] - deg_int
            den = extW - deg_int + deg_ext
            if objective == "M":
                num = intW + deg_int
                q = intW / extW if extW > 0 else 0.0
            else:
                bnodes = {
                    u for u in C
                    if any(x not in C for x in adj.get(u, {}))
                }
                ext_cnt = {
                    u: sum(1 for x in adj.get(u, {}) if x not in C)
                    for u in bnodes
                }
                bdiff = (1 if deg_ext > 0 else 0) - sum(
                    1 for u in adj.get(v, {}) if ext_cnt.get(u) == 1
                )
                num = 2.0 * (intW + deg_int) * (len(bnodes) + bdiff)
                q = (
                    2.0 * intW * len(bnodes) / (len(C) * extW)
                    if extW > 0 else 0.0
                )
                den = (len(C) + 1) * den
            if den > 0:
                dq = num / den - q
            elif num > 0:
                dq = float("inf")
            else:
                dq = -1.0
            if dq >= 0.0 and (best is None or dq > best[0]):
                best = (dq, v)
        if best is None:
            return C
        C.add(best[1])


EDGES = [
    # two dense pockets bridged by one edge
    (0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (0, 3, 1.0), (1, 3, 1.0),
    (2, 3, 1.0),
    (4, 5, 1.0), (4, 6, 1.0), (5, 6, 1.0), (4, 7, 1.0), (5, 7, 1.0),
    (6, 7, 1.0),
    (3, 4, 1.0),
]


@pytest.mark.parametrize("objective", ["M", "L"])
def test_gce_two_pockets(spark, objective):
    g = Graph.from_edge_list(spark, EDGES, directed=False, weighted=True)
    algo = GCE(g, seeds=[0, 5], objective=objective).run()
    for s in (0, 5):
        assert set(algo.expand_seed(s)) == _gce_py(EDGES, s, objective)


@pytest.mark.parametrize("objective", ["M", "L"])
def test_gce_weighted_random(spark, objective):
    import random

    rng = random.Random(11)
    edges = []
    for _ in range(60):
        u, v = rng.randrange(20), rng.randrange(20)
        if u != v:
            edges.append((u, v, float(rng.randint(1, 5))))
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    algo = GCE(g, seeds=[0, 7, 13], objective=objective).run()
    for s in (0, 7, 13):
        assert set(algo.expand_seed(s)) == _gce_py(edges, s, objective), (
            f"seed {s} objective {objective}"
        )


def test_gce_isolated_seed(spark):
    g = Graph.from_edge_list(
        spark, [(1, 2, 1.0)], directed=False, weighted=True, num_nodes=3
    )
    algo = GCE(g, seeds=[0]).run()
    assert algo.expand_seed(0) == [0]


def test_gce_self_loop_raises(spark):
    g = Graph.from_edge_list(
        spark, [(0, 0, 1.0), (0, 1, 1.0)], directed=False, weighted=True
    )
    with pytest.raises(RuntimeError, match="self-loops"):
        GCE(g, seeds=[0]).run()


def test_gce_bad_objective(spark):
    g = Graph.from_edge_list(spark, [(0, 1, 1.0)], directed=False)
    with pytest.raises(ValueError, match="objective"):
        GCE(g, seeds=[0], objective="X")
