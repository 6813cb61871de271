"""Distance-module extras: per-edge distances, s-t queries, volume,
sampled neighborhood function.

Reference surface:

- ``cpp/distance/JaccardDistance.cpp:17-40`` — per-edge
  ``1 − t/(deg u + deg v − t)`` from edge triangle counts.
- ``cpp/distance/AdamicAdarDistance.cpp:17-66`` — per-edge
  ``1 / Σ_{w ∈ N(u)∩N(v)} 1/log deg(w)`` (edges in no triangle get the
  reference's ``1/0 = +inf``).
- ``cpp/distance/GraphDistance.cpp:13-29`` — s-t distance wrappers over
  BFS / Dijkstra.
- ``cpp/distance/BidirectionalBFS.cpp:16-121`` — alternating smaller-
  frontier level expansion; ``d(s,t)`` = number of expansions when the
  balls meet, ``inf`` when they never do. Weighted input is treated as
  unweighted, like the reference's WARN path.
- ``cpp/distance/BidirectionalDijkstra.cpp`` — weighted s-t distance;
  the alternating priority-queue schedule is a sequential execution
  detail, the RESULT contract (exact weighted distance) is re-expressed
  as two-sided bounded relaxation with best-distance pruning.
- ``cpp/distance/Volume.cpp:14-70`` — average ball size |{v : d(u,v) ≤
  r}| over sampled start nodes (single and multi-radius). The
  reference's discovery loop never re-queues a min-update
  (``Volume.cpp:25-32``), so its weighted ball can undercount; here the
  ball is the exact bounded-relaxation ball (identical on unweighted
  graphs) — documented divergence.
- ``cpp/distance/NeighborhoodFunctionHeuristic.cpp:21-138`` — sampled
  neighborhood function with the reference's exact endpoint
  enhancements (N(1) = 2m, N(diameter) = n(n−1)) and cumulative
  rounded interpolation between; SPLIT (degree-sorted every (n/k)-th
  node) and RANDOM strategies.

All sampling/tie choices are md5-seeded and partitioning-independent;
random draws diverge from the reference's RNG stream by construction
(documented — the reference is seed-incompatible across its own
versions too).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.dedup import portable_hash32
from networkit_spark.plans.iterate import Materializer


# --------------------------------------------------------------- per-edge
def jaccard_distance_scores(graph: Graph) -> DataFrame:
    """``(u, v, score)`` per canonical edge — JaccardDistance
    (``JaccardDistance.cpp:38-40``)."""
    from networkit_spark.operators.triangles import TriangleEdgeScore

    tri = TriangleEdgeScore(graph).run().edge_scores()
    deg = graph.degrees().select("id", F.col("out_deg").cast("double").alias("d"))
    return (
        tri.join(deg.withColumnRenamed("id", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            "u", "v",
            (
                1.0
                - F.col("score")
                / (F.col("du") + F.col("dv") - F.col("score"))
            ).alias("score"),
        )
    )


def adamic_adar_distance_scores(graph: Graph) -> DataFrame:
    """``(u, v, score)`` per canonical edge — AdamicAdarDistance
    (``AdamicAdarDistance.cpp:30-59``): the triple loop over marked
    neighborhoods is one wedge join; common neighbors always have
    degree ≥ 2, so ``log deg(w)`` never vanishes; triangle-free edges
    get +inf exactly like the reference's ``1/0``."""
    if graph.directed:
        raise ValueError("AdamicAdarDistance requires an undirected graph")
    sym = (
        graph.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    canon = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("d")
    )
    nu = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    nv = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    aa = (
        canon.join(nu, "u")
        .join(nv, ["v", "w"])
        .join(deg.withColumnRenamed("id", "w"), "w")
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.log(F.col("d").cast("double"))).alias("aa"))
    )
    return canon.join(aa, ["u", "v"], "left").select(
        "u", "v",
        F.when(F.col("aa") > 0, 1.0 / F.col("aa"))
        .otherwise(F.lit(float("inf")))
        .alias("score"),
    )


# ----------------------------------------------------------- s-t queries
def weighted_distance(graph: Graph, u: int, v: int) -> float:
    """``GraphDistance::weightedDistance`` — Dijkstra from u, read v."""
    from networkit_spark.operators.distance import Dijkstra

    algo = Dijkstra(graph, u).run()
    rows = algo.distances().where(F.col("id") == v).collect()
    return float(rows[0]["dist"]) if rows else float("inf")


def unweighted_distance(graph: Graph, u: int, v: int) -> float:
    """``GraphDistance::unweightedDistance`` — BFS from u, read v."""
    from networkit_spark.operators.distance import BFS

    algo = BFS(graph, u).run()
    rows = algo.distances().where(F.col("id") == v).collect()
    return float(rows[0]["dist"]) if rows else float("inf")


class BidirectionalBFS(Algorithm):
    """Hop distance s→t by growing two balls, always expanding the
    smaller frontier (``BidirectionalBFS.cpp:16-121``). Distance = the
    number of level expansions when an edge connects the balls."""

    def __init__(self, graph: Graph, source: int, target: int,
                 max_rounds: int = 10_000) -> None:
        super().__init__(graph)
        self.source = int(source)
        self.target = int(target)
        self.max_rounds = max_rounds
        self._dist: float | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        if self.source == self.target:
            self._dist = 0.0
            return
        mat = Materializer()
        fwd = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst").where(F.col("src") != F.col("dst"))
            .distinct().persist()
        )
        bwd = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        s_seen = mat.cut(0, spark.createDataFrame([(self.source,)], "id long"))
        t_seen = mat.cut(0, spark.createDataFrame([(self.target,)], "id long"))
        s_front, t_front = s_seen, t_seen
        dist = 0
        met = False
        for _ in range(self.max_rounds):
            ns, nt = s_front.count(), t_front.count()
            if ns == 0 or nt == 0:
                break
            dist += 1
            if ns <= nt:
                edges, front, seen, other = fwd, s_front, s_seen, t_seen
                from_source = True
            else:
                edges, front, seen, other = bwd, t_front, t_seen, s_seen
                from_source = False
            nxt = (
                edges.join(
                    front.withColumnRenamed("id", "src").hint("shuffle_hash"),
                    "src",
                )
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(seen, "id", "left_anti")
            )
            nxt = mat.cut(dist, nxt)
            if nxt.join(other, "id", "left_semi").limit(1).count() > 0:
                met = True
                break
            seen = mat.cut(dist, seen.unionAll(nxt))
            if from_source:
                s_front, s_seen = nxt, seen
            else:
                t_front, t_seen = nxt, seen
        fwd.unpersist()
        self._dist = float(dist) if met else float("inf")

    def get_distance(self) -> float:
        """``STSP::getDistance`` — +inf when target is unreachable."""
        self.assure_finished()
        return self._dist


class BidirectionalDijkstra(Algorithm):
    """Weighted s→t distance (``BidirectionalDijkstra.cpp``). Exact
    result via two-sided relaxation: forward distances from s, backward
    from t, rounds prune states above the best meeting distance."""

    def __init__(self, graph: Graph, source: int, target: int,
                 max_rounds: int = 10_000) -> None:
        super().__init__(graph)
        self.source = int(source)
        self.target = int(target)
        self.max_rounds = max_rounds
        self._dist: float | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        if g.edges.where(F.col("weight") < 0).limit(1).count():
            raise ValueError("Dijkstra requires non-negative edge weights")
        if self.source == self.target:
            self._dist = 0.0
            return
        mat = Materializer()
        base = (g.edges if g.directed else g.symmetrized()).where(
            F.col("src") != F.col("dst")
        )
        fwd = base.groupBy("src", "dst").agg(F.min("weight").alias("w")).persist()
        bwd = fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
        state = spark.createDataFrame(
            [(0, self.source, 0.0), (1, self.target, 0.0)],
            "side int, id long, d double",
        ).withColumn("improved", F.lit(True))
        state = mat.cut(0, state)
        best = float("inf")
        for rnd in range(1, self.max_rounds + 1):
            frontier = state.where("improved")
            if frontier.limit(1).count() == 0:
                break
            gathered = None
            for side, edges in ((0, fwd), (1, bwd)):
                part = (
                    edges.join(
                        frontier.where(F.col("side") == side)
                        .select(F.col("id").alias("src"), F.col("d").alias("du"))
                        .hint("shuffle_hash"),
                        "src",
                    )
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.min(F.col("du") + F.col("w")).alias("cand"))
                    .select(F.lit(side).alias("side"), "id", "cand")
                )
                gathered = part if gathered is None else gathered.unionAll(part)
            gathered = gathered.where(F.col("cand") < F.lit(best))
            merged = (
                state.select("side", "id", "d")
                .join(gathered, ["side", "id"], "full_outer")
                .select(
                    "side", "id",
                    F.least(
                        F.coalesce("d", F.lit(float("inf"))),
                        F.coalesce("cand", F.lit(float("inf"))),
                    ).alias("d"),
                    (F.col("d").isNull() | (F.col("cand") < F.col("d"))).alias(
                        "improved"
                    ),
                )
            )
            state = mat.cut(rnd, merged)
            meet = (
                state.where("side = 0")
                .select("id", F.col("d").alias("ds"))
                .join(
                    state.where("side = 1").select("id", F.col("d").alias("dt")),
                    "id",
                )
                .agg(F.min(F.col("ds") + F.col("dt")).alias("b"))
                .collect()[0]["b"]
            )
            if meet is not None and meet < best:
                best = float(meet)
        else:
            fwd.unpersist()
            raise RuntimeError(
                f"bidirectional relaxation did not settle in "
                f"{self.max_rounds} rounds"
            )
        fwd.unpersist()
        self._dist = best

    def get_distance(self) -> float:
        """``STSP::getDistance`` — +inf when target is unreachable."""
        self.assure_finished()
        return self._dist


class AStar(Algorithm):
    """A* s→t shortest path (``distance/AStar.hpp:18-69`` /
    ``distance/AStarGeneral.hpp:22-150``): Dijkstra whose priority-queue
    order is biased by a per-node lower bound ``heu(u)`` on the distance
    to the target. The pop order is a sequential-execution detail; the
    RESULT contract — the exact weighted s→t distance whenever the
    heuristic is admissible (the only case the reference guarantees) —
    is re-expressed as bounded relaxation: per round every improved node
    relaxes its out-edges, and a candidate ``(u, d)`` is pruned when
    ``d + heu(u) ≥`` the best target distance seen so far. With the
    zero heuristic this degenerates to plain distributed Dijkstra; a
    tighter admissible heuristic prunes more of the frontier, which is
    exactly the reference's speedup mechanism.

    ``heuristic`` is a list (indexed by node id, matching the
    reference's ``distanceHeu`` vector), a dict, or an ``(id, heu)``
    DataFrame; every vertex must have a value
    (``AStar.hpp:37-40`` throws on a size mismatch — here any uncovered
    vertex raises).

    ``get_path()`` reconstructs the node sequence from min-parent
    pointers; the parent map for reached nodes is collected to the
    driver — the same O(n) state as the reference's ``pred`` array.
    """

    def __init__(self, graph: Graph, heuristic, source: int, target: int,
                 store_pred: bool = True, max_rounds: int = 10_000) -> None:
        super().__init__(graph)
        self.heuristic = heuristic
        self.source = int(source)
        self.target = int(target)
        self.store_pred = bool(store_pred)
        self.max_rounds = max_rounds
        self._dist: float | None = None
        self._path: list[int] | None = None

    def _heu_frame(self) -> DataFrame:
        spark = self.graph.edges.sparkSession
        h = self.heuristic
        if isinstance(h, DataFrame):
            heu = h.select("id", F.col("heu").cast("double"))
        elif isinstance(h, dict):
            heu = spark.createDataFrame(
                [(int(k), float(v)) for k, v in h.items()], "id long, heu double"
            )
        else:
            heu = spark.createDataFrame(
                [(i, float(v)) for i, v in enumerate(h)], "id long, heu double"
            )
        covered = self.graph.vertices.join(heu, "id", "left_anti")
        if covered.limit(1).count():
            raise ValueError(
                "the heuristic must provide a lower bound for every node "
                "(AStar.hpp:37-40 size check)"
            )
        return heu

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        if g.edges.where(F.col("weight") < 0).limit(1).count():
            raise ValueError("AStar requires non-negative edge weights")
        heu = self._heu_frame().persist()
        heu.count()
        if self.source == self.target:
            self._dist, self._path = 0.0, [self.source]
            heu.unpersist()
            return
        mat = Materializer()
        edges = (
            (g.edges if g.directed else g.symmetrized())
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.min("weight").alias("w"))
            .persist()
        )
        state = mat.cut(0, spark.createDataFrame(
            [(self.source, 0.0, None)], "id long, d double, parent long"
        ).withColumn("improved", F.lit(True)))
        best = float("inf")
        for rnd in range(1, self.max_rounds + 1):
            frontier = state.where("improved")
            if frontier.limit(1).count() == 0:
                break
            gathered = (
                edges.join(
                    frontier.select(
                        F.col("id").alias("src"), F.col("d").alias("du")
                    ).hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min(F.struct((F.col("du") + F.col("w")).alias("cand"),
                                    F.col("src").alias("parent"))).alias("m"))
                .select("id", F.col("m.cand").alias("cand"),
                        F.col("m.parent").alias("cand_parent"))
            )
            # admissible-bound pruning: d(u) + heu(u) ≥ best target
            # distance can never improve the answer
            gathered = gathered.join(heu, "id").where(
                F.col("cand") + F.col("heu") < F.lit(best)
            ).drop("heu")
            merged = (
                state.select("id", "d", "parent")
                .join(gathered, "id", "full_outer")
                .select(
                    "id",
                    F.least(
                        F.coalesce("d", F.lit(float("inf"))),
                        F.coalesce("cand", F.lit(float("inf"))),
                    ).alias("d"),
                    F.when(
                        F.col("d").isNull() | (F.col("cand") < F.col("d")),
                        F.col("cand_parent"),
                    ).otherwise(F.col("parent")).alias("parent"),
                    (F.col("d").isNull() | (F.col("cand") < F.col("d"))).alias(
                        "improved"
                    ),
                )
            )
            state = mat.cut(rnd, merged)
            row = state.where(F.col("id") == self.target).collect()
            if row and row[0]["d"] < best:
                best = float(row[0]["d"])
        else:
            edges.unpersist()
            heu.unpersist()
            raise RuntimeError(
                f"A* relaxation did not settle in {self.max_rounds} rounds"
            )
        self._dist = best
        if self.store_pred and best != float("inf"):
            parents = {
                r["id"]: r["parent"]
                for r in state.select("id", "parent").collect()
            }
            path = [self.target]
            while path[-1] != self.source:
                path.append(parents[path[-1]])
            self._path = list(reversed(path))
        edges.unpersist()
        heu.unpersist()

    def get_distance(self) -> float:
        """``STSP::getDistance`` — +inf when the target is unreachable."""
        self.assure_finished()
        return self._dist

    def get_path(self) -> list[int]:
        """``STSP::getPath`` — node sequence source…target (empty when
        unreachable or ``store_pred=False``)."""
        self.assure_finished()
        return list(self._path) if self._path else []


class AStarGeneral(AStar):
    """``AStarGeneral<Heuristic>`` — A* with an arbitrary heuristic
    callable ``node → lower bound``. Everything else is :class:`AStar`.

    Python boundary note: this is the ONE place in the distance family
    where user Python runs per element. A plain scalar callable can
    only be driven element-at-a-time (``s.map`` inside the Arrow batch
    — batch transfer is still vectorized; only the call itself is
    per-row). Pass ``vectorized=True`` when ``heu`` accepts a numpy
    array of ids and returns an array of bounds — then the whole batch
    is one call and nothing runs per row. The landmark-heuristic
    :class:`AStar` has no Python in it at all."""

    def __init__(self, graph: Graph, heu, source: int, target: int,
                 store_pred: bool = True, max_rounds: int = 10_000,
                 vectorized: bool = False) -> None:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        if vectorized:
            fn = pandas_udf(
                lambda s: pd.Series(heu(s.to_numpy()), dtype="float64"),
                "double",
            )
        else:
            fn = pandas_udf(lambda s: s.map(lambda i: float(heu(int(i)))),
                            "double")
        frame = graph.vertices.select("id", fn(F.col("id")).alias("heu"))
        super().__init__(graph, frame, source, target, store_pred, max_rounds)


# ---------------------------------------------------------------- volume
def volume(graph: Graph, r: float, samples: int, seed: int = 42) -> float:
    """``Volume::volume(G, r, samples)`` — mean exact-ball size over
    seeded sample nodes."""
    return volumes(graph, [r], samples, seed)[0]


def volumes(
    graph: Graph, rs: list[float], samples: int, seed: int = 42
) -> list[float]:
    """``Volume::volume(G, rs, samples)`` — one bounded multi-source
    relaxation at max(rs), then one threshold aggregation per radius."""
    if not rs:
        return []
    if samples <= 0:
        raise ValueError("samples must be positive")
    spark = graph.edges.sparkSession
    mat = Materializer()
    rmax = max(rs)
    starts = [
        row["id"]
        for row in graph.vertices.select(
            "id",
            portable_hash32(F.col("id").cast("string"), f"vol{seed}").alias("h"),
        ).orderBy("h", "id").limit(samples).collect()
    ]
    if len(starts) < samples:
        raise ValueError("samples exceeds the number of nodes")
    adj = (
        graph.symmetrized()
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("w"))
        .persist()
    )
    state = spark.createDataFrame(
        [(s, s, 0.0) for s in starts], "s long, id long, d double"
    ).withColumn("improved", F.lit(True))
    state = mat.cut(0, state)
    for rnd in range(1, 10_001):
        frontier = state.where("improved")
        if frontier.limit(1).count() == 0:
            break
        gathered = (
            adj.join(
                frontier.select(
                    F.col("id").alias("src"), "s", F.col("d").alias("du")
                ).hint("shuffle_hash"),
                "src",
            )
            .groupBy("s", F.col("dst").alias("id"))
            .agg(F.min(F.col("du") + F.col("w")).alias("cand"))
            .where(F.col("cand") <= F.lit(float(rmax)))
        )
        merged = (
            state.select("s", "id", "d")
            .join(gathered, ["s", "id"], "full_outer")
            .select(
                "s", "id",
                F.least(
                    F.coalesce("d", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("d"),
                (F.col("d").isNull() | (F.col("cand") < F.col("d"))).alias(
                    "improved"
                ),
            )
        )
        state = mat.cut(rnd, merged)
    else:
        adj.unpersist()
        raise RuntimeError("ball relaxation did not settle in 10000 rounds")
    adj.unpersist()
    counts = state.agg(
        *[
            F.count(F.when(F.col("d") <= float(r), F.lit(1))).alias(f"c{i}")
            for i, r in enumerate(rs)
        ]
    ).collect()[0]
    return [counts[f"c{i}"] / float(samples) for i in range(len(rs))]


# --------------------------------------- sampled neighborhood function
class NeighborhoodFunctionHeuristic(Algorithm):
    """``NeighborhoodFunctionHeuristic.cpp:21-138`` — sample k start
    nodes (SPLIT: every (n/k)-th node of the (degree, id)-sorted order;
    RANDOM: seeded hash draw), batch-BFS from all of them, scale
    per-distance pair counts by n/k cumulatively, and pin the exact
    endpoints N(1) = 2m and N(diameter) = n(n−1)."""

    SPLIT = "split"
    RANDOM = "random"

    def __init__(
        self,
        graph: Graph,
        n_samples: int = 0,
        strategy: str = "split",
        seed: int = 42,
    ) -> None:
        if graph.directed:
            raise ValueError(
                "current implementation can only deal with undirected graphs"
            )
        if strategy not in (self.SPLIT, self.RANDOM):
            raise ValueError("unknown strategy, choose either split or random")
        super().__init__(graph)
        self.n_samples = int(n_samples)
        self.strategy = strategy
        self.seed = int(seed)
        self._nf: list[int] | None = None

    def _run(self) -> None:
        from networkit_spark.operators.components import ConnectedComponents
        from networkit_spark.operators.distance import APSP, Diameter

        g = self.graph
        cc = ConnectedComponents(g).run()
        if cc.number_of_components() > 1:
            raise RuntimeError(
                "current implementation only runs on graphs with 1 "
                "connected component"
            )
        n = g.number_of_nodes()
        m = g.canonical().where(F.col("src") != F.col("dst")).count()
        k = self.n_samples or int(
            math.ceil(max(0.15 * n, math.sqrt(m)))
        )
        k = min(k, n)
        dia = int(Diameter(g, algo="exact").run().get_diameter()[0])
        if self.strategy == self.SPLIT:
            deg = g.degrees().select("id", F.col("out_deg").alias("degree"))
            step = max(n // k, 1)
            ordered = deg.orderBy(F.asc("degree"), F.asc("id")).limit(
                (k - 1) * step + 1
            ).collect()
            starts = [ordered[i * step]["id"] for i in range(k)]
        else:
            starts = [
                r["id"]
                for r in g.vertices.select(
                    "id",
                    portable_hash32(
                        F.col("id").cast("string"), f"nfh{self.seed}"
                    ).alias("h"),
                ).orderBy("h", "id").limit(k).collect()
            ]
        dists = APSP(g, sources=starts).run().distances()
        hist = {
            int(r["dist"]): int(r["cnt"])
            for r in dists.where(F.col("dist") > 0)
            .groupBy("dist")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        result = [0] * dia
        result[0] = 2 * m
        result[dia - 1] = n * (n - 1)
        norm = n / float(k)
        for dist in range(2, dia):
            result[dist - 1] = int(round(hist.get(dist, 0) * norm))
            result[dist - 1] += result[dist - 2]
        self._nf = result

    def get_neighborhood_function(self) -> list[int]:
        """``getNeighborhoodFunction`` — N(h) for h = 1..diameter."""
        self.assure_finished()
        return self._nf


class IncompleteDijkstra:
    """Lazy multi-source Dijkstra iterator — ``hasNext()``/``next()``
    yielding settled ``(node, dist)`` pairs in nondecreasing distance.

    Reference: ``IncompleteDijkstra``
    (``include/networkit/distance/IncompleteDijkstra.hpp:29-54``,
    ``cpp/distance/IncompleteDijkstra.cpp:17-62``): a binary-heap
    Dijkstra whose frontier is PULLED one settled node at a time by the
    caller; ``explored`` nodes are treated as absent. This is an
    inherently sequential driver-pull API (each ``next()`` depends on
    every prior pop), so like the reference it is a small-graph utility
    — the adjacency is collected to the driver once; distributed
    single/multi-source distances are :class:`~networkit_spark.
    operators.distance.Dijkstra` / ``APSP``. The reference's only
    internal consumer (ApproxCloseness) is ported against the
    distributed path already.
    """

    def __init__(self, graph, sources, explored=None) -> None:
        import heapq

        if graph is None:
            raise ValueError("G is null")
        self._adj: dict[int, list[tuple[int, float]]] = {}
        for r in graph.symmetrized().collect() if not graph.directed else graph.edges.collect():
            self._adj.setdefault(int(r["src"]), []).append(
                (int(r["dst"]), float(r["weight"]))
            )
        self._explored = set(int(x) for x in explored) if explored else set()
        self._dists: dict[int, float] = {}
        self._heap: list[tuple[float, int]] = []
        self._settled: set[int] = set()
        heapq.heapify(self._heap)
        for s in sources:
            s = int(s)
            if s not in self._explored:
                self._dists[s] = 0.0
                heapq.heappush(self._heap, (0.0, s))

    def _peek(self):
        import heapq

        # lazy-deletion heap: skip stale entries
        while self._heap:
            d, u = self._heap[0]
            if u in self._settled or d > self._dists.get(u, float("inf")):
                heapq.heappop(self._heap)
                continue
            return d, u
        return None

    def has_next(self) -> bool:
        """``hasNext``."""
        return self._peek() is not None

    def next(self) -> tuple[int, float]:
        """``next`` — settle and return the nearest unsettled node;
        raises when exhausted (``IncompleteDijkstra.cpp:41-43``)."""
        import heapq

        top = self._peek()
        if top is None:
            raise ValueError("No next element")
        dist_u, u = top
        heapq.heappop(self._heap)  # _peek left the live entry on top
        self._settled.add(u)
        for v, w in self._adj.get(u, ()):
            if v in self._explored or v in self._settled:
                continue
            nd = dist_u + w
            if nd < self._dists.get(v, float("inf")):
                self._dists[v] = nd
                heapq.heappush(self._heap, (nd, v))
        return (u, dist_u)
