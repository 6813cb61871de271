"""Matching — distributed local-max weighted matching.

Reference: ``LocalMaxMatcher`` (``cpp/matching/LocalMaxMatcher.cpp:
18-80``, ``include/networkit/matching/Matcher.hpp:20-52``): rounds of
(1) every edge tests whether it is locally maximum at both endpoints,
(2) endpoints that picked each other match, (3) edges touching matched
nodes drop out; repeat until no edges remain. This is the classic
½-approximation local-max algorithm (Preis 1999; the round-based
formulation converges in O(log m) rounds w.h.p. — Birn et al. 2013,
"Efficient Parallel and External Matching", public results).

Documented divergence: the reference perturbs each weight with
``Aux::Random::real(1e-6)`` to break ties (making its output
non-deterministic); this engine breaks ties with the deterministic
total order ``(weight, min endpoint, max endpoint)`` instead — on
distinct weights the outputs coincide, on ties ours is reproducible.

Spark plan per round (all JVM-side):

    per-node best incident edge = one groupBy(max struct) over the
    symmetric edge view; agreement = edges joined to both endpoints'
    bests; matched nodes anti-join the remaining edges.

The groupBy folds hub candidates map-side; each round is two
vertex-keyed shuffles; the remaining-edge frame shrinks monotonically
and is re-materialized every round (linear plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer


class LocalMaxMatcher(Algorithm):
    def __init__(self, graph: Graph, max_rounds: int = 200) -> None:
        if graph.directed:
            raise ValueError(
                "Matcher only defined for undirected graphs "
                "(LocalMaxMatcher.cpp ctor)"
            )
        super().__init__(graph)
        self.max_rounds = max_rounds
        self._matching: DataFrame | None = None
        self._rounds = 0

    def _run(self) -> None:
        mat = Materializer()
        remaining = (
            self.graph.canonical()
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
        remaining = mat.cut(0, remaining)
        matched_edges = []
        r = 0
        while r < self.max_rounds:
            r += 1
            if remaining.limit(1).count() == 0:
                break
            # deterministic local-max key: (w, src, dst) lexicographic
            key = F.struct(
                F.col("weight"), F.col("src").alias("a"), F.col("dst").alias("b")
            )
            sym = remaining.select(
                F.col("src").alias("id"), key.alias("k")
            ).unionAll(remaining.select(F.col("dst").alias("id"), key.alias("k")))
            best = sym.groupBy("id").agg(F.max("k").alias("k"))
            agree = (
                remaining.join(
                    best.select(F.col("id").alias("src"), F.col("k").alias("ks")),
                    "src",
                )
                .join(
                    best.select(F.col("id").alias("dst"), F.col("k").alias("kd")),
                    "dst",
                )
                .where(
                    (F.col("ks.a") == F.col("src"))
                    & (F.col("ks.b") == F.col("dst"))
                    & (F.col("kd.a") == F.col("src"))
                    & (F.col("kd.b") == F.col("dst"))
                )
                .select("src", "dst", "weight")
            )
            agree = mat.cut(r * 2, agree)
            if agree.limit(1).count() == 0:
                # no edge is locally max at both ends only when nothing
                # remains; guard against a logic regression
                break
            matched_edges.append(agree)
            gone = agree.select(F.col("src").alias("id")).unionAll(
                agree.select(F.col("dst").alias("id"))
            )
            remaining = mat.cut(
                r * 2 + 1,
                remaining.join(
                    gone.withColumnRenamed("id", "src"), "src", "left_anti"
                ).join(gone.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .select("src", "dst", "weight"),
            )
        else:
            raise RuntimeError(
                f"local-max matching did not drain in {self.max_rounds} rounds"
            )
        self._rounds = r
        if matched_edges:
            out = matched_edges[0]
            for m in matched_edges[1:]:
                out = out.unionAll(m)
            self._matching = out.localCheckpoint()
        else:
            spark = self.graph.edges.sparkSession
            self._matching = spark.createDataFrame(
                [], "src long, dst long, weight double"
            )

    # ------------------------------------------------------- accessors
    def get_matching(self) -> DataFrame:
        """``(src, dst, weight)`` matched edges (src < dst), a valid
        matching: no node appears twice (``Matcher::getMatching``)."""
        self.assure_finished()
        return self._matching

    def matching_size(self) -> int:
        """Number of matched edges (``Matching::size``)."""
        self.assure_finished()
        return self._matching.count()

    def matching_weight(self) -> float:
        """Total matched weight (``Matching::weight``)."""
        self.assure_finished()
        row = self._matching.agg(F.sum("weight").alias("w")).collect()[0]
        return float(row["w"] or 0.0)

    def number_of_rounds(self) -> int:
        self.assure_finished()
        return self._rounds


class PathGrowingMatcher(Algorithm):
    """Path-growing ½-approximate weighted matching
    (``cpp/matching/PathGrowingMatcher.cpp:25-152``, Drake & Hougardy):
    repeatedly grow a path from the highest-degree alive vertex along
    the heaviest alive incident edge, alternately assigning edges to
    two matchings, and return the heavier one.

    The algorithm is a single sequential path walk over shared mutable
    degree state — inherently order-dependent, so (like the exact-LFR
    generator) it runs DRIVER-SIDE at fixture scale, guarded by an
    edge-count ceiling; :class:`LocalMaxMatcher` is the same-guarantee
    (½-approx) distributed path for engine-scale graphs.

    Documented divergences from the reference's unpinned internals:
    ties inside its BucketPQ bucket (same degree) and among equal-weight
    neighbors follow container order there; here both break to the
    smallest node id, making runs reproducible. Self-loops raise, as in
    the reference ctor.
    """

    _MAX_DRIVER_EDGES = 2_000_000

    def __init__(self, graph: Graph) -> None:
        if graph.directed:
            raise ValueError("matching is defined on undirected graphs")
        super().__init__(graph)
        self._matching: list[tuple[int, int]] | None = None
        self._weight = 0.0

    def _run(self) -> None:
        g = self.graph
        if g.number_of_self_loops() > 0:
            raise ValueError("G has self-loops and cannot be processed")
        m = g.number_of_edges()
        if m > self._MAX_DRIVER_EDGES:
            raise ValueError(
                f"PathGrowingMatcher is a sequential fixture-scale "
                f"algorithm ({m} edges > {self._MAX_DRIVER_EDGES}); use "
                "LocalMaxMatcher for engine-scale matching"
            )
        adj: dict[int, dict[int, float]] = {}
        for r in g.canonical().collect():
            u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
            adj.setdefault(u, {})[v] = w
            adj.setdefault(v, {})[u] = w
        degrees = {u: len(nb) for u, nb in adj.items()}
        alive = {u for u, d in degrees.items() if d > 0}
        # count from the deduped adjacency, not the raw edge frame —
        # multi-edges collapse in the dict and must not inflate the
        # termination counter
        num_edges = sum(degrees.values()) // 2
        m1: list[tuple[int, int]] = []
        m2: list[tuple[int, int]] = []
        take_m1 = True
        while num_edges > 0:
            # highest alive degree, tie → smallest id (BucketPQ extractMin
            # on key = −degree)
            v = min(alive, key=lambda u: (-degrees[u], u))
            while degrees[v] > 0:
                # heaviest alive neighbor; strict > over ascending ids
                # keeps the smallest id among ties (documented rule)
                best_n, best_w = None, float("-inf")
                for u, w in sorted(adj[v].items()):
                    if u in alive and w > best_w:
                        best_n, best_w = u, w
                (m1 if take_m1 else m2).append((v, best_n))
                take_m1 = not take_m1
                for u in list(adj[v]):
                    if u in alive:
                        degrees[u] -= 1
                        num_edges -= 1
                        if degrees[u] == 0:
                            alive.discard(u)
                alive.discard(v)
                v = best_n
        def weight(match):
            return sum(adj[a][b] for a, b in match)
        w1, w2 = weight(m1), weight(m2)
        self._matching = m1 if w1 > w2 else m2
        self._weight = max(w1, w2)

    def get_matching(self) -> DataFrame:
        """``(u, v)`` matched pairs (u < v), like ``Matcher::getMatching``."""
        self.assure_finished()
        spark = self.graph.edges.sparkSession
        rows = [(min(a, b), max(a, b)) for a, b in self._matching]
        df = spark.createDataFrame(rows or [(0, 0)], "u long, v long")
        return df.where(F.lit(bool(rows)))

    def matching_weight(self) -> float:
        """``Matching::weight``."""
        self.assure_finished()
        return self._weight
