"""nx2spark / spark2nx adapter (``networkit/nxadapter.py:20-76``) —
roundtrip-tested when networkx is installed (it is, in this container),
MissingDependencyError contract tested when it is not."""

import pytest

from networkit_spark import Graph
from networkit_spark.sources import nxadapter


def test_missing_dependency_contract(spark):
    if nxadapter.have_nx:
        pytest.skip("networkx installed — guard branch not reachable")
    with pytest.raises(nxadapter.MissingDependencyError):
        nxadapter.nx2spark(spark, object())
    g = Graph.from_edge_list(spark, [(0, 1)], num_nodes=2)
    with pytest.raises(nxadapter.MissingDependencyError):
        nxadapter.spark2nx(g)


@pytest.mark.skipif(not nxadapter.have_nx, reason="needs networkx")
def test_roundtrip(spark):
    import networkx as nx

    nxg = nx.Graph()
    nxg.add_edge("a", "b", w=2.0)
    nxg.add_edge("b", "c", w=0.5)
    g = nxadapter.nx2spark(spark, nxg, weight_attr="w")
    assert g.number_of_nodes() == 3 and g.number_of_edges() == 2
    back = nxadapter.spark2nx(g)
    assert back.number_of_nodes() == 3 and back.number_of_edges() == 2
