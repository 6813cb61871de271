"""Shared golden micro-graphs, replicated as code from the reference's
unit tests (FIXTURES.md §3)."""

from networkit_spark import Graph

# 20-node / 15-edge graph with exactly 5 components
# (cpp/components/test/ConnectedComponentsGTest.cpp:31-63)
CC_TINY20_EDGES = [
    (0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 19),
    (3, 5), (5, 6), (6, 7), (7, 9),
    (10, 11), (10, 18), (10, 12), (18, 17),
    (13, 14),
]
CC_TINY20_N = 20

# 8-node weighted graph with Matlab-derived PageRank golden vector
# (cpp/centrality/test/CentralityGTest.cpp:545-585)
PR_WEIGHTED8_EDGES = [
    (0, 2, 3.0), (1, 2, 2.0), (2, 3, 3.0), (2, 4, 2.0), (2, 5, 1.5),
    (3, 5, 3.0), (4, 5, 2.0), (5, 6, 3.0), (5, 7, 2.0),
]
PR_WEIGHTED8_GOLDEN = [0.0753, 0.0565, 0.2552, 0.1319, 0.0942, 0.2552, 0.0753, 0.0565]


def cc_tiny20(spark) -> Graph:
    return Graph.from_edge_list(spark, CC_TINY20_EDGES, num_nodes=CC_TINY20_N)


def pr_weighted8(spark) -> Graph:
    return Graph.from_edge_list(
        spark, PR_WEIGHTED8_EDGES, weighted=True, num_nodes=8
    )
