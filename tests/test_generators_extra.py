"""Round-3 generators (``cpp/generators/{PowerlawDegreeSequence,
StochasticBlockmodel,RegularRingLattice,HavelHakimi,
DorogovtsevMendes}.cpp``)."""

import pytest

from networkit_spark.generators import (
    PowerlawDegreeSequence,
    dorogovtsev_mendes,
    havel_hakimi,
    regular_ring_lattice,
    stochastic_blockmodel,
)


def test_powerlaw_degree_sequence():
    pds = PowerlawDegreeSequence(2, 20, -2.5).run()
    avg = pds.get_expected_average_degree()
    assert 2 <= avg <= 20
    seq = pds.get_degree_sequence(101, seed=1)
    assert all(2 <= d <= 20 for d in seq)
    assert sum(seq) % 2 == 0
    assert seq == pds.get_degree_sequence(101, seed=1)  # deterministic
    # fitting: minimum chosen so expected average ≈ requested
    pds2 = PowerlawDegreeSequence(1, 50, -2.2)
    pds2.set_minimum_from_average_degree(8.0)
    pds2.run()
    assert pds2.get_expected_average_degree() == pytest.approx(8.0, rel=0.35)
    with pytest.raises(ValueError, match="gamma"):
        PowerlawDegreeSequence(1, 5, 0.5)


def test_stochastic_blockmodel(spark):
    # two blocks, dense inside block 0, empty elsewhere
    membership = [0] * 6 + [1] * 6
    aff = [[1.0, 0.0], [0.0, 0.0]]
    g = stochastic_blockmodel(spark, 12, membership, aff, seed=3)
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    assert len(edges) == 15  # C(6,2) inside block 0
    assert all(u < 6 and v < 6 for u, v in edges)
    with pytest.raises(ValueError, match="membership"):
        stochastic_blockmodel(spark, 5, [0] * 4, aff)


def test_regular_ring_lattice(spark):
    g = regular_ring_lattice(spark, 8, 2)
    assert g.number_of_edges() == 8 * 2
    degs = {r["id"]: r["out_deg"] for r in g.degrees().collect()}
    assert set(degs.values()) == {4}
    with pytest.raises(ValueError):
        regular_ring_lattice(spark, 4, 2)


def test_havel_hakimi(spark):
    degs = [3, 3, 2, 2, 2, 2]
    g = havel_hakimi(spark, degs)
    got = {r["id"]: r["out_deg"] for r in g.degrees().collect()}
    assert [got[i] for i in range(6)] == degs
    with pytest.raises(ValueError, match="graphical"):
        havel_hakimi(spark, [3, 1])  # odd sum
    with pytest.raises(ValueError, match="graphical"):
        havel_hakimi(spark, [5, 1, 1, 1])  # max degree exceeds peers


def test_dorogovtsev_mendes(spark):
    g = dorogovtsev_mendes(spark, 20, seed=4)
    assert g.number_of_nodes() == 20
    # 3 seed edges + 2 per added node
    assert g.number_of_edges() == 3 + 2 * 17
    # determinism
    g2 = dorogovtsev_mendes(spark, 20, seed=4)
    assert sorted(map(tuple, g.edges.collect())) == sorted(
        map(tuple, g2.edges.collect())
    )
