"""Algorithm lifecycle base classes.

Mirrors the reference's construct → run → assureFinished → accessors
protocol (``include/networkit/base/Algorithm.hpp:16,31,44-46``;
Python-side ``with nogil: self._this.run()`` in
``networkit/base.pyx:26-29``). Constructors validate preconditions
eagerly (e.g. LCC throws on directed input,
``cpp/centrality/LocalClusteringCoefficient.cpp:6-9``); accessors raise
until ``run()`` has completed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


class Algorithm:
    def __init__(self, graph: Graph) -> None:
        self.graph = graph
        self.has_run = False

    def run(self) -> "Algorithm":
        self._run()
        self.has_run = True
        return self

    def _run(self) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def assure_finished(self) -> None:
        """``Algorithm::assureFinished`` (``Algorithm.hpp:44-46``)."""
        if not self.has_run:
            raise RuntimeError(
                f"{type(self).__name__}: call run() before accessing results"
            )


class Centrality(Algorithm):
    """Base for per-node score algorithms (``Centrality.hpp:92-93``).

    ``_scores`` is a DataFrame ``(id: long, score: double)`` set by
    subclasses' ``_run``.
    """

    def __init__(self, graph: Graph) -> None:
        super().__init__(graph)
        self._scores: DataFrame | None = None

    def scores(self) -> DataFrame:
        """Score vector as a DataFrame (``Centrality::scores``,
        ``cpp/centrality/Centrality.cpp:43-46``)."""
        self.assure_finished()
        return self._scores

    def score(self, node: int) -> float:
        self.assure_finished()
        row = self._scores.where(F.col("id") == node).collect()
        if not row:
            raise KeyError(node)
        return row[0]["score"]

    def ranking(self, k: int | None = None) -> DataFrame:
        """Sorted (score desc, **id asc on ties**) — the load-bearing tie
        rule from ``Centrality::ranking`` (``Centrality.cpp:29-41``),
        asserted by the reference's wiki-Vote golden test
        (``CentralityGTest.cpp:475-502``)."""
        self.assure_finished()
        ranked = self._scores.orderBy(F.desc("score"), F.asc("id"))
        return ranked.limit(k) if k is not None else ranked

    def rank_per_node(self) -> DataFrame:
        """Dense rank of each node by score (helper mirrored from
        ``networkit/test/test_algorithms.py:179-186``)."""
        self.assure_finished()
        # distributed rank: range sort + zipWithIndex instead of a global
        # single-partition row_number window
        spark = self._scores.sparkSession
        ordered = self._scores.orderBy(F.desc("score"), F.asc("id"))
        rdd = ordered.rdd.zipWithIndex().map(lambda t: (t[0]["id"], t[1] + 1))
        return spark.createDataFrame(rdd, "id long, rank long")
