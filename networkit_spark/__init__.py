"""networkit_spark — a from-scratch, PySpark-native link-graph analytics engine.

Re-expresses the query surface of the NetworKit graph-analysis core
(reference: /root/reference, C++17/OpenMP + Cython) as idiomatic Spark
DataFrame programs: an immutable ``edges`` DataFrame plus iterative
message-passing rounds (join → groupBy-agg → window) driven from the
driver, with explicit skew handling, lineage-truncating checkpoints, and
no per-row Python in any algorithm inner loop.

The public API mirrors the reference's lifecycle
(``Algo(G, params).run()`` then accessors — see
``/root/reference/networkit/base.pyx:26-29`` and
``include/networkit/base/Algorithm.hpp:31``) so a NetworKit user can map
their workflow 1:1 onto this engine.
"""

from networkit_spark.graph import Graph
from networkit_spark.session import get_spark

from networkit_spark.operators.degree import (
    DegreeCentrality,
    LaplacianCentrality,
    LocalPartitionCoverage,
    PermanenceCentrality,
    Sfigality,
)
from networkit_spark.operators.group import (
    ApproxGroupBetweenness,
    GroupCloseness,
    GroupDegree,
)
from networkit_spark.operators.kpath import KPathCentrality
from networkit_spark.operators.pagerank import PageRank
from networkit_spark.operators.components import (
    ConnectedComponents,
    WeaklyConnectedComponents,
)
from networkit_spark.operators.plp import PLP, LPDegreeOrdered
from networkit_spark.operators.triangles import (
    LocalClusteringCoefficient,
    TriangleEdgeScore,
    GlobalClusteringCoefficient,
)

from networkit_spark.operators.pagerank import (
    EigenvectorCentrality,
    KatzCentrality,
)
from networkit_spark.operators.kcore import CoreDecomposition
from networkit_spark.operators.distance import (
    APSP,
    BFS,
    Diameter,
    Dijkstra,
    EffectiveDiameter,
    EffectiveDiameterApproximation,
)
from networkit_spark.operators.coarsening import (
    MatchingCoarsening,
    ParallelPartitionCoarsening,
)
from networkit_spark.operators.plm import PLM
from networkit_spark.operators.scc import StronglyConnectedComponents
from networkit_spark.operators.betweenness import (
    ApproxBetweenness,
    Betweenness,
    Closeness,
    EstimateBetweenness,
    HarmonicCloseness,
    TopCloseness,
    TopHarmonicCloseness,
)
from networkit_spark.operators.correlation import Assortativity
from networkit_spark.operators.dyncomponents import (
    DynConnectedComponents,
    DynWeaklyConnectedComponents,
)
from networkit_spark.operators.spanning import (
    KruskalMSF,
    MinimumSpanningForest,
    RandomMaximumSpanningForest,
    SpanningForest,
    UnionMaximumSpanningForest,
)
from networkit_spark.operators.node2vec import Node2Vec
from networkit_spark.operators.biconnected import BiconnectedComponents
from networkit_spark.operators.kadabra import KadabraBetweenness
from networkit_spark.operators.matching import LocalMaxMatcher
from networkit_spark.operators.cliques import MaximalCliques
from networkit_spark.operators.agglomerative import ParallelAgglomerativeClusterer
from networkit_spark.operators.algebraic import (
    ApproxSpanningEdge,
    CommuteTimeDistance,
    SpanningEdgeCentrality,
)
from networkit_spark.operators.approxcloseness import ApproxCloseness
from networkit_spark.operators.scd import GCE, PageRankNibble
from networkit_spark.operators.simulation import EpidemicSimulationSEIR
from networkit_spark.operators.reachability import (
    AllSimplePaths,
    ReachableNodes,
)
from networkit_spark.streaming.difference import GraphDifference
from networkit_spark.operators.randomization import (
    Curveball,
    DegreePreservingShuffle,
)
from networkit_spark.operators.cutclustering import CutClustering
from networkit_spark.operators.flow import EdmondsKarp
from networkit_spark.operators.independentset import Luby
from networkit_spark.operators.distance import (
    AffectedNodes,
    Eccentricity,
    HopPlotApproximation,
    NeighborhoodFunction,
    NeighborhoodFunctionApproximation,
    ReverseBFS,
)
from networkit_spark.operators import graphtools
from networkit_spark.operators.spectral import (
    SpectralColoring,
    SpectralPartitioner,
    adjacency_eigenvectors,
    laplacian_eigenvectors,
)
from networkit_spark.sources import graphio
from networkit_spark.operators.distance_extras import (
    AStar,
    AStarGeneral,
    BidirectionalBFS,
    BidirectionalDijkstra,
    NeighborhoodFunctionHeuristic,
)
from networkit_spark.operators.gedwalk import GedWalk
from networkit_spark.operators.layout import MaxentStress, PivotMDS
from networkit_spark.operators.dyndistance import DynAPSP, DynBFS, DynDijkstra
from networkit_spark.operators.dynkatz import DynKatzCentrality
from networkit_spark.operators.dynbetweenness import (
    DynApproxBetweenness,
    DynBetweenness,
    DynBetweennessOneNode,
)
from networkit_spark.operators.dyntopcloseness import DynTopHarmonicCloseness

__all__ = [
    "ApproxBetweenness",
    "ApproxCloseness",
    "ApproxGroupBetweenness",
    "GroupCloseness",
    "GroupDegree",
    "KPathCentrality",
    "LaplacianCentrality",
    "LocalPartitionCoverage",
    "PermanenceCentrality",
    "Sfigality",
    "Betweenness",
    "Closeness",
    "EstimateBetweenness",
    "HarmonicCloseness",
    "TopCloseness",
    "TopHarmonicCloseness",
    "APSP",
    "Assortativity",
    "BFS",
    "CoreDecomposition",
    "Diameter",
    "Dijkstra",
    "DynAPSP",
    "DynApproxBetweenness",
    "DynBetweenness",
    "DynBetweennessOneNode",
    "DynTopHarmonicCloseness",
    "DynBFS",
    "DynConnectedComponents",
    "DynDijkstra",
    "DynKatzCentrality",
    "DynWeaklyConnectedComponents",
    "CommuteTimeDistance",
    "CutClustering",
    "EdmondsKarp",
    "Luby",
    "AffectedNodes",
    "Eccentricity",
    "ReverseBFS",
    "SpectralColoring",
    "SpectralPartitioner",
    "adjacency_eigenvectors",
    "laplacian_eigenvectors",
    "graphio",
    "graphtools",
    "HopPlotApproximation",
    "NeighborhoodFunction",
    "NeighborhoodFunctionApproximation",
    "BidirectionalBFS",
    "AStar",
    "AStarGeneral",
    "ApproxSpanningEdge",
    "BidirectionalDijkstra",
    "NeighborhoodFunctionHeuristic",
    "GedWalk",
    "GraphDifference",
    "BiconnectedComponents",
    "AllSimplePaths",
    "Curveball",
    "DegreePreservingShuffle",
    "KadabraBetweenness",
    "LocalMaxMatcher",
    "MaximalCliques",
    "KruskalMSF",
    "MinimumSpanningForest",
    "GCE",
    "PageRankNibble",
    "Node2Vec",
    "RandomMaximumSpanningForest",
    "SpanningEdgeCentrality",
    "SpanningForest",
    "UnionMaximumSpanningForest",
    "EffectiveDiameter",
    "EffectiveDiameterApproximation",
    "EpidemicSimulationSEIR",
    "ParallelAgglomerativeClusterer",
    "MatchingCoarsening",
    "ParallelPartitionCoarsening",
    "PLM",
    "StronglyConnectedComponents",
    "Graph",
    "get_spark",
    "DegreeCentrality",
    "PageRank",
    "ReachableNodes",
    "EigenvectorCentrality",
    "KatzCentrality",
    "ConnectedComponents",
    "WeaklyConnectedComponents",
    "PLP",
    "LPDegreeOrdered",
    "LocalClusteringCoefficient",
    "TriangleEdgeScore",
    "GlobalClusteringCoefficient",
]

__version__ = "0.1.0"
