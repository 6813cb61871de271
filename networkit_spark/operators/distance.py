"""Distance family — BFS frontier expansion, hop distribution, ANF
effective-diameter approximation.

Reference: ``cpp/distance/BFS.cpp`` (single-source shortest hops; 79 LoC),
``cpp/distance/EffectiveDiameterApproximation.cpp:19-128`` (ANF: k
Flajolet–Martin bitmasks per node, OR-propagated per hop, effective
diameter = first hop where the estimated reachable-pairs count reaches
``ratio`` of the total).

Spark plans:
- BFS = the Pregel skeleton shared with PageRank/CC: a frontier DataFrame
  joined against the (symmetric for undirected) edge table each round,
  anti-joined against visited, lineage-cut. O(diameter) rounds; each
  round shuffles only frontier-adjacent edges.
- ANF = per-node bitmask state OR-aggregated over in-neighbors per hop
  (``groupBy(dst).agg(bit_or(mask))``); masks are ``k`` longs packed in
  an array column. The reference's per-hop estimate Σ 2^b / 0.77351 is
  reproduced exactly (``EffectiveDiameterApproximation.cpp:56-77``), with
  its bit-position rule b = index of lowest zero bit, averaged over k
  trials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer


class BFS(Algorithm):
    """Single-source hop distances (unweighted shortest paths).

    ``distances()`` → ``(id, dist)`` for reached nodes only, like the
    reference's ``getDistances`` with unreachable = absent (the C++ uses
    an infinity sentinel; a left join against vertices restores that view
    via ``distances_with_unreachable``).
    """

    def __init__(self, graph: Graph, source: int, max_hops: int | None = None) -> None:
        super().__init__(graph)
        self.source = source
        self.max_hops = max_hops
        self._dist: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        nbrs = (g.edges if g.directed else g.symmetrized()).select("src", "dst")
        nbrs = nbrs.persist()
        mat = Materializer()
        frontier = spark.createDataFrame([(self.source,)], "id long")
        dist = frontier.select("id", F.lit(0).alias("dist"))
        dist = mat.cut(0, dist)
        hop = 0
        while True:
            hop += 1
            if self.max_hops is not None and hop > self.max_hops:
                break
            nxt = (
                nbrs.join(frontier, nbrs.src == frontier.id)
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(dist, "id", "left_anti")
            )
            nxt = mat.cut(hop, nxt)
            if nxt.limit(1).count() == 0:
                break
            dist = mat.cut(hop, dist.unionAll(nxt.select("id", F.lit(hop).alias("dist"))))
            frontier = nxt
        self._dist = dist
        nbrs.unpersist()

    def distances(self) -> DataFrame:
        self.assure_finished()
        return self._dist

    def distances_with_unreachable(self) -> DataFrame:
        """``(id, dist)`` with unreachable nodes as dist = -1 (the
        reference reports infinity; -1 keeps the column integral)."""
        self.assure_finished()
        return self.graph.vertices.join(self._dist, "id", "left").select(
            "id", F.coalesce("dist", F.lit(-1)).alias("dist")
        )

    def eccentricity(self) -> int:
        """Max hop reached from the source."""
        self.assure_finished()
        return self._dist.agg(F.max("dist")).collect()[0][0] or 0


def hop_histogram(graph: Graph, source: int) -> DataFrame:
    """``(dist, count)`` — BFS level sizes from ``source``."""
    bfs = BFS(graph, source).run()
    return bfs.distances().groupBy("dist").agg(F.count(F.lit(1)).alias("count"))


class Diameter(Algorithm):
    """Graph diameter (``cpp/distance/Diameter.cpp``, 327 LoC).

    Reference modes: ``DiameterAlgo.EXACT`` (iFub), ``ESTIMATED_RANGE``
    (double sweep with an error factor), ``ESTIMATED_SAMPLES``.
    ``getDiameter()`` returns a ``(lower, upper)`` pair in every mode
    (equal in exact mode) — the same contract as the reference's
    ``std::pair<count, count>``.

    Spark re-expression:

    - ``exact``: one **batched** BFS from every vertex at once (state
      rows ``(source, id)``, one join-agg per hop) — the diameter is the
      last hop with a non-empty frontier, so no per-source bookkeeping
      at all. O(diameter) rounds, O(n·reachable) state: correct at any
      scale but quadratic state on dense giant components — the estimate
      is the scale path, exactly as in the reference (iFub also degrades
      to many BFS on adversarial graphs).
    - ``estimate``: the classic double sweep — BFS from a max-degree
      vertex, then BFS from the farthest vertex found; the second
      eccentricity is a lower bound and twice it an upper bound.
    """

    def __init__(self, graph: Graph, algo: str = "estimate") -> None:
        if algo not in ("exact", "estimate"):
            raise ValueError("algo must be 'exact' or 'estimate'")
        super().__init__(graph)
        self.algo = algo
        self._lower = 0
        self._upper = 0

    def _run(self) -> None:
        g = self.graph
        if self.algo == "exact":
            mat = Materializer()
            nbrs = (
                (g.edges if g.directed else g.symmetrized())
                .select("src", "dst")
                .where(F.col("src") != F.col("dst"))
                .distinct()
                .persist()
            )
            layer = mat.cut(
                0, g.vertices.select(F.col("id").alias("source"), "id")
            )
            visited = layer
            hop = 0
            while True:
                nxt = (
                    nbrs.join(layer, nbrs.src == layer.id)
                    .select("source", F.col("dst").alias("id"))
                    .distinct()
                    .join(visited, ["source", "id"], "left_anti")
                )
                nxt = mat.cut(hop + 1, nxt)
                if nxt.limit(1).count() == 0:
                    break
                hop += 1
                visited = mat.cut(hop, visited.unionAll(nxt))
                layer = nxt
            nbrs.unpersist()
            self._lower = self._upper = hop
            return
        # estimate: double sweep
        start_row = (
            g.degrees().orderBy(F.desc("out_deg"), F.asc("id")).limit(1).collect()
        )
        if not start_row:
            return
        start = start_row[0]["id"]
        b1 = BFS(g, start).run()
        far = (
            b1.distances().orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()
        )
        if not far:
            return
        b2 = BFS(g, far[0]["id"]).run()
        ecc = b2.eccentricity()
        self._lower, self._upper = ecc, 2 * ecc

    def get_diameter(self) -> tuple[int, int]:
        self.assure_finished()
        return self._lower, self._upper


class APSP(Algorithm):
    """All-pairs (or some-pairs) hop distances — ``cpp/distance/APSP.cpp``
    runs one SSSP per source sequentially; ``SPSP.cpp`` restricts to a
    source subset. Here all sources advance in ONE batched BFS: state
    rows ``(source, id, dist)``, one join-agg per hop — O(diameter)
    rounds regardless of source count, the per-round shuffle carries the
    whole frontier so adding sources adds rows, not rounds.

    At web scale all-pairs state is O(n·reachable) — use ``sources=`` for
    the SPSP-style landmark subset (the scale path); all-pairs is the
    test-scale / small-component path, same as the reference (APSP holds
    an n×n matrix in memory).
    """

    def __init__(
        self, graph: Graph, sources: list[int] | None = None, max_hops: int = 10_000
    ) -> None:
        super().__init__(graph)
        self.sources = sources
        self.max_hops = max_hops
        self._dist: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        mat = Materializer()
        nbrs = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        srcs = g.vertices.select(F.col("id").alias("source"))
        if self.sources is not None:
            spark = g.edges.sparkSession
            wanted = spark.createDataFrame(
                [(int(s),) for s in self.sources], "source long"
            )
            srcs = srcs.join(wanted, "source")
        layer = mat.cut(
            0, srcs.select("source", F.col("source").alias("id"))
        )
        visited = mat.cut(0, layer.withColumn("dist", F.lit(0)))
        hop = 0
        while hop < self.max_hops:
            nxt = (
                nbrs.join(layer.hint("shuffle_hash"), nbrs.src == layer.id)
                .select("source", F.col("dst").alias("id"))
                .distinct()
                .join(visited.select("source", "id"), ["source", "id"], "left_anti")
            )
            nxt = mat.cut(hop + 1, nxt)
            if nxt.limit(1).count() == 0:
                break
            hop += 1
            visited = mat.cut(
                hop, visited.unionAll(nxt.withColumn("dist", F.lit(hop)))
            )
            layer = nxt
        nbrs.unpersist()
        self._dist = visited

    def distances(self) -> DataFrame:
        """``(source, id, dist)`` for reached pairs (unreachable pairs
        absent — the reference stores ∞ there)."""
        self.assure_finished()
        return self._dist


class EffectiveDiameterApproximation(Algorithm):
    """ANF sketch effective diameter
    (``cpp/distance/EffectiveDiameterApproximation.cpp:19-128``).

    ``k`` FM bitmasks per node, ``r`` extra high bits; per hop every
    node ORs its neighbors' masks; reachable-count estimate per hop is
    ``Σ_u 2^(avg lowest-zero-bit) / 0.77351``; the effective diameter is
    the first hop where the estimate ≥ ratio · n, with the reference's
    final interpolation left out (we report the integer hop, which is
    what its tests assert within ±1).
    """

    def __init__(
        self,
        graph: Graph,
        ratio: float = 0.9,
        k: int = 16,
        r: int = 7,
        seed: int = 42,
        max_hops: int = 100,
    ) -> None:
        if graph.directed:
            raise ValueError("effective diameter requires an undirected graph")
        super().__init__(graph)
        self.ratio = ratio
        self.k = k
        self.r = r
        self.seed = seed
        self.max_hops = max_hops
        self._effective_diameter: float | None = None

    def _init_masks(self) -> DataFrame:
        """Seed mask per (node, trial): geometric bit via the reference's
        ``Aux::Random::real() < 2^-i`` cascade — here the position of the
        lowest SET bit of a 30-bit md5-derived draw, which is exactly
        geometric(1/2) using only integer ops: portable bit-identically
        to ANSI SQL (no libm log2 whose last-ULP could flip a floor),
        so the whole sketch propagation sits behind the DuckDB oracle."""
        from networkit_spark.operators.dedup import portable_hash32

        g = self.graph
        trials = F.sequence(F.lit(0), F.lit(self.k - 1))
        per_trial = g.vertices.select("id", F.explode(trials).alias("trial"))
        width = 30  # enough for n up to 2^30 with r guard bits
        h = portable_hash32(
            F.concat(F.col("id").cast("string"), F.lit(":"), F.col("trial")),
            f"anf{self.seed}",
        ) % F.lit(1 << width)
        # lowest set bit position = popcount((h & -h) - 1); h = 0 (p =
        # 2^-30) takes the top position
        bitpos = F.when(h == 0, F.lit(width - 1)).otherwise(
            F.least(
                F.bit_count(h.bitwiseAND(-h) - 1).cast("int"), F.lit(width - 1)
            )
        )
        # 2^bitpos as a long (shiftleft needs a literal shift; pow is
        # exact for bitpos < 53)
        return per_trial.select(
            "id", "trial", F.pow(F.lit(2.0), bitpos).cast("long").alias("mask")
        )

    def _run(self) -> None:
        g = self.graph
        n = g.number_of_nodes()
        if n == 0:
            self._effective_diameter = 0.0
            return
        # flagged self-loop rows keep each node's own mask in the bit_or
        # gather — single reference to `masks` per round (plans/
        # iterate.py) — and carry the previous mask through the same
        # aggregation, so the changed-count is a scan of the materialized
        # round output rather than an old⋈new join job per hop
        sym = (
            g.symmetrized()
            .select("src", "dst", F.lit(False).alias("is_self"))
            .unionAll(
                g.vertices.select(
                    F.col("id").alias("src"), F.col("id").alias("dst"),
                    F.lit(True).alias("is_self"),
                )
            )
            .persist()
        )
        mat = Materializer()
        masks = mat.cut(0, self._init_masks())

        def estimate(m: DataFrame) -> float:
            # lowest zero bit b per mask = trailing-ones count =
            # popcount((mask XOR (mask+1)) >> 1) — integer-only, same
            # expression in the SQL oracle; estimate = sum over nodes of
            # 2^(avg_b) / 0.77351  (EffectiveDiameterApproximation.cpp:56-77)
            lowest_zero = F.bit_count(
                F.shiftright(F.col("mask").bitwiseXOR(F.col("mask") + 1), 1)
            )
            per_node = m.groupBy("id").agg(F.avg(lowest_zero).alias("b"))
            row = per_node.agg(
                F.sum(F.pow(F.lit(2.0), F.col("b")) / F.lit(0.77351)).alias("est")
            ).collect()[0]
            return row["est"] or 0.0

        # propagate until the sketches stop changing, recording the
        # reachable-pairs estimate after every hop
        per_hop: list[tuple[int, float]] = []
        hop = 0
        while hop < self.max_hops:
            hop += 1
            new_masks = (
                sym.join(masks, sym.src == masks.id)
                .groupBy(F.col("dst").alias("id"), "trial")
                .agg(
                    F.bit_or("mask").alias("mask"),
                    # exactly one self row per (id, trial) → previous mask
                    F.max(F.when(F.col("is_self"), F.col("mask"))).alias(
                        "old_mask"
                    ),
                )
            )
            new_masks = mat.cut(hop, new_masks)
            changed = new_masks.where(
                F.col("mask") != F.col("old_mask")
            ).count()
            masks = new_masks.select("id", "trial", "mask")
            per_hop.append((hop, estimate(masks)))
            if changed == 0:
                break
        # effective diameter = first hop whose estimate reaches ratio of
        # the final (fully-propagated) estimate
        final_est = per_hop[-1][1] if per_hop else 0.0
        self._effective_diameter = float(per_hop[-1][0]) if per_hop else 0.0
        for h, e in per_hop:
            if final_est > 0 and e >= self.ratio * final_est:
                self._effective_diameter = float(h)
                break
        sym.unpersist()

    def get_effective_diameter(self) -> float:
        self.assure_finished()
        return self._effective_diameter


class EffectiveDiameter(Algorithm):
    """Exact effective diameter
    (``cpp/distance/EffectiveDiameter.cpp:24-85``): for every node the
    smallest ``h ≥ 1`` whose ball ``|{u : d(v,u) ≤ h}|`` reaches
    ``ceil(ratio · n)``, averaged over nodes. The reference expands per-
    node reachability bitsets one hop at a time and credits the hop at
    which each node crosses the threshold — so a node whose 0-ball
    already suffices still contributes 1 (its first check happens after
    the first expansion); ``max(1, ·)`` below reproduces that.

    Spark re-expression: the bitset propagation IS an all-source BFS, so
    reuse the batched :class:`APSP` frontier machinery (one join-agg per
    hop for every source at once), then the per-node crossing hop is a
    cumulative count over the ``(source, dist)`` histogram — no O(n²)
    driver state. Exact all-pairs state is O(n·reachable), the same
    memory class as the reference's per-node bitsets; the ANF
    :class:`EffectiveDiameterApproximation` is the at-scale variant,
    exactly as in the reference.

    Guards match the reference ctor: directed graphs and graphs with
    more than one connected component raise.
    """

    def __init__(self, graph: Graph, ratio: float = 0.9,
                 max_hops: int = 10_000) -> None:
        if graph.directed:
            raise ValueError(
                "current implementation can only deal with undirected graphs"
            )
        super().__init__(graph)
        self.ratio = float(ratio)
        self.max_hops = max_hops
        self._effective_diameter: float | None = None

    def _run(self) -> None:
        import math

        n = self.graph.number_of_nodes()
        threshold = int(math.ceil(self.ratio * n))
        dist = APSP(self.graph, max_hops=self.max_hops).run().distances()
        # connectivity guard (reference ctor runs ConnectedComponents):
        # in a single undirected component every source reaches all n.
        reach = dist.groupBy("source").count()
        if reach.agg(F.min("count")).collect()[0][0] < n:
            raise ValueError(
                "current implementation only runs on graphs with 1 "
                "connected component"
            )
        w = Window.partitionBy("source").orderBy("dist")
        per_node = (
            dist.groupBy("source", "dist")
            .count()
            .withColumn("cum", F.sum("count").over(w))
            .where(F.col("cum") >= threshold)
            .groupBy("source")
            .agg(F.greatest(F.min("dist"), F.lit(1)).alias("h"))
        )
        total = per_node.agg(F.sum("h").alias("s")).collect()[0]["s"]
        self._effective_diameter = float(total) / float(n)

    def get_effective_diameter(self) -> float:
        self.assure_finished()
        return self._effective_diameter


class Dijkstra(Algorithm):
    """Single-source weighted shortest paths (``cpp/distance/Dijkstra.cpp``
    — priority-queue Dijkstra in the reference; heap order is a
    sequential-execution detail, the RESULT is the weighted distance
    vector).

    Spark re-expression: distributed Bellman-Ford-style relaxation — per
    round every improved vertex relaxes its out-edges
    (``frontier ⋈ edges → min(dist + w) per dst → keep strict
    improvements``). Rounds ≤ longest shortest path in hops; each round
    shuffles only frontier-adjacent edges. Negative weights are rejected
    like the reference (``Dijkstra.cpp`` requires non-negative).
    """

    def __init__(self, graph: Graph, source: int, max_rounds: int = 10_000) -> None:
        super().__init__(graph)
        self.source = source
        self.max_rounds = max_rounds
        self._dist: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        neg = g.edges.where(F.col("weight") < 0).limit(1).count()
        if neg:
            raise ValueError(
                "Dijkstra requires non-negative edge weights (Dijkstra.cpp)"
            )
        nbrs = (g.edges if g.directed else g.symmetrized()).select(
            "src", "dst", "weight"
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        nbrs = nbrs.repartition(shuffle_parts, "src").persist()
        mat = Materializer()
        merged = spark.createDataFrame(
            [(self.source, 0.0, True)], "id long, dist double, changed boolean"
        )
        merged = mat.cut(0, merged)
        rounds = 0
        while rounds < self.max_rounds:
            rounds += 1
            # ONE materialization per round: relax the changed frontier,
            # full-outer-merge onto the running distances, and flag strict
            # improvements in the same plan (each checkpointed input is
            # referenced once — single-reference rule, PLANS.md).
            frontier = merged.where("changed").select("id", "dist")
            relaxed = (
                nbrs.join(frontier.hint("shuffle_hash"), nbrs.src == frontier.id)
                .groupBy(F.col("dst").alias("nid"))
                .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
            )
            prev = merged.select("id", "dist")
            merged = mat.cut(
                rounds,
                prev.join(relaxed, prev.id == relaxed.nid, "full").select(
                    F.coalesce("id", "nid").alias("id"),
                    F.least("dist", "cand").alias("dist"),
                    # strict improvements only (dist may shrink repeatedly
                    # on weighted graphs, unlike hop-BFS)
                    F.coalesce(
                        F.col("dist").isNull()
                        | (F.col("cand") < F.col("dist")),
                        F.lit(False),
                    ).alias("changed"),
                ),
            )
            if merged.where("changed").limit(1).count() == 0:
                break
        else:
            raise RuntimeError(
                f"Dijkstra did not converge in {self.max_rounds} rounds"
            )
        self._dist = merged.select("id", "dist")
        nbrs.unpersist()

    def distances(self) -> DataFrame:
        """``(id, dist)`` for reached nodes (unreachable absent, like
        BFS.distances)."""
        self.assure_finished()
        return self._dist

    def distance(self, t: int) -> float:
        self.assure_finished()
        rows = self._dist.where(F.col("id") == t).collect()
        if not rows:
            return float("inf")
        return rows[0]["dist"]


class Eccentricity:
    """Per-node eccentricity (``cpp/distance/Eccentricity.cpp:13-23`` —
    ``getValue(G, u)`` runs one BFS and returns (argmax node, max
    dist)). Batched here: ONE multi-source BFS (the APSP frame) serves
    every node, so the round count is O(diameter) total, not per node.

    Documented divergence: the reference's argmax node is the last node
    the BFS visits (adjacency-order-dependent, nondeterministic under
    its own OpenMP scheduling); we return the SMALLEST node id at the
    maximum distance — a deterministic representative of the same
    distance value. The eccentricity VALUE matches exactly.
    """

    @staticmethod
    def frame(graph: Graph, sources: list[int] | None = None) -> DataFrame:
        """``(id, farthest, ecc)`` for every (or selected) source."""
        apsp = APSP(graph, sources=sources).run()
        d = apsp.distances()
        return (
            d.groupBy(F.col("source").alias("id"))
            .agg(
                F.max("dist").alias("ecc"),
                F.min_by(
                    F.col("id"), F.struct(-F.col("dist"), F.col("id"))
                ).alias("farthest"),
            )
            .select("id", "farthest", "ecc")
        )

    @staticmethod
    def get_value(graph: Graph, u: int) -> tuple[int, int]:
        """(argmax node, eccentricity) — the reference's static API."""
        row = Eccentricity.frame(graph, sources=[u]).collect()
        if not row:
            raise KeyError(u)
        return int(row[0]["farthest"]), int(row[0]["ecc"])


class NeighborhoodFunction(Algorithm):
    """Exact neighborhood function
    (``cpp/distance/NeighborhoodFunction.cpp:28-55``): ``NF(h)`` = number
    of ordered node pairs at hop distance ``1..h``; the reference runs a
    BFS per node and histograms distances — here ONE batched multi-source
    BFS produces the full distance frame and the histogram is a single
    aggregation. Like the reference ctor we reject directed graphs; the
    single-component precondition is asserted cheaply from the result
    (reached pairs must equal n·(n−1)) rather than with an extra CC run.
    """

    def __init__(self, graph: Graph, max_hops: int = 10_000) -> None:
        if graph.directed:
            raise ValueError(
                "NeighborhoodFunction requires an undirected graph "
                "(NeighborhoodFunction.cpp ctor)"
            )
        super().__init__(graph)
        self.max_hops = max_hops
        self._values: list[int] = []

    def _run(self) -> None:
        g = self.graph
        d = APSP(g, max_hops=self.max_hops).run().distances()
        hist = {
            int(r["dist"]): int(r["c"])
            for r in d.where(F.col("dist") > 0)
            .groupBy("dist")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        n = g.number_of_nodes()
        reached = sum(hist.values())
        if reached != n * (n - 1):
            raise RuntimeError(
                "NeighborhoodFunction requires a connected graph "
                "(NeighborhoodFunction.cpp ctor precondition): "
                f"{reached} reached pairs != n(n-1) = {n * (n - 1)}"
            )
        out, acc = [], 0
        for h in range(1, (max(hist) if hist else 0) + 1):
            acc += hist.get(h, 0)
            out.append(acc)
        self._values = out

    def get_neighborhood_function(self) -> list[int]:
        self.assure_finished()
        return list(self._values)


def _anf_per_hop(
    graph: Graph, k: int, r: int, seed: int, max_hops: int
) -> tuple[list[float], int]:
    """Shared ANF propagation: per-hop sum over nodes of the
    Flajolet-Martin reachable-count estimate ``min(2^avg_b / 0.77351, n)``
    (per-node clamp = the reference's "enforce monotonicity",
    ``HopPlotApproximation.cpp:103-106``). Same integer-portable mask
    machinery as EffectiveDiameterApproximation; returns (estimates for
    h = 1.., n)."""
    from networkit_spark.plans.iterate import Materializer

    n = graph.number_of_nodes()
    if n == 0:
        return [], 0
    proto = EffectiveDiameterApproximation(graph, k=k, r=r, seed=seed)
    sym = (
        graph.symmetrized()
        .select("src", "dst", F.lit(False).alias("is_self"))
        .unionAll(
            graph.vertices.select(
                F.col("id").alias("src"), F.col("id").alias("dst"),
                F.lit(True).alias("is_self"),
            )
        )
        .persist()
    )
    mat = Materializer()
    masks = mat.cut(0, proto._init_masks())

    def estimate(m: DataFrame) -> float:
        lowest_zero = F.bit_count(
            F.shiftright(F.col("mask").bitwiseXOR(F.col("mask") + 1), 1)
        )
        per_node = m.groupBy("id").agg(F.avg(lowest_zero).alias("b"))
        row = per_node.agg(
            F.sum(
                F.least(
                    F.pow(F.lit(2.0), F.col("b")) / F.lit(0.77351),
                    F.lit(float(n)),
                )
            ).alias("est")
        ).collect()[0]
        return row["est"] or 0.0

    per_hop: list[float] = []
    hop = 0
    while hop < max_hops:
        hop += 1
        new_masks = (
            sym.join(masks, sym.src == masks.id)
            .groupBy(F.col("dst").alias("id"), "trial")
            .agg(
                F.bit_or("mask").alias("mask"),
                F.max(F.when(F.col("is_self"), F.col("mask"))).alias("old_mask"),
            )
        )
        new_masks = mat.cut(hop, new_masks)
        changed = new_masks.where(F.col("mask") != F.col("old_mask")).count()
        masks = new_masks.select("id", "trial", "mask")
        per_hop.append(estimate(masks))
        if changed == 0:
            break
    sym.unpersist()
    return per_hop, n


class NeighborhoodFunctionApproximation(Algorithm):
    """ANF neighborhood-function estimate
    (``cpp/distance/NeighborhoodFunctionApproximation.cpp``): per hop the
    summed per-node reachable estimates (clamped at n per node), i.e.
    ordered pairs including self-pairs; subtract n for the exact-NF
    convention. Accuracy is pytest-asserted against the exact NF."""

    def __init__(
        self, graph: Graph, k: int = 16, r: int = 7, seed: int = 42,
        max_hops: int = 100,
    ) -> None:
        if graph.directed:
            raise ValueError("requires an undirected graph")
        super().__init__(graph)
        self.k, self.r, self.seed, self.max_hops = k, r, seed, max_hops
        self._values: list[float] = []

    def _run(self) -> None:
        per_hop, n = _anf_per_hop(
            self.graph, self.k, self.r, self.seed, self.max_hops
        )
        # pairs excluding self (the exact NF convention)
        self._values = [max(e - n, 0.0) for e in per_hop]

    def get_neighborhood_function(self) -> list[float]:
        self.assure_finished()
        return list(self._values)


class HopPlotApproximation(Algorithm):
    """ANF hop plot (``cpp/distance/HopPlotApproximation.cpp:24-140``):
    fraction of connected node pairs per hop; ``hopPlot[0] = 1/n``
    (every node reaches itself). Documented divergence: the reference
    accumulates finished nodes twice in its per-round total
    (``:121-131`` adds n inside the sweep AND counts the shrunken
    active list after it); we use the clean ``Σ_u est(u) / n²``, clamped
    to 1, which is the quantity its comment describes."""

    def __init__(
        self, graph: Graph, k: int = 16, r: int = 7, seed: int = 42,
        max_hops: int = 100,
    ) -> None:
        if graph.directed:
            raise ValueError(
                "current implementation can only deal with undirected "
                "graphs (HopPlotApproximation.cpp ctor)"
            )
        super().__init__(graph)
        self.k, self.r, self.seed, self.max_hops = k, r, seed, max_hops
        self._plot: dict[int, float] = {}

    def _run(self) -> None:
        per_hop, n = _anf_per_hop(
            self.graph, self.k, self.r, self.seed, self.max_hops
        )
        plot = {0: 1.0 / n if n else 0.0}
        for h, est in enumerate(per_hop, start=1):
            plot[h] = min(est / (n * n), 1.0) if n else 0.0
        self._plot = plot

    def get_hop_plot(self) -> dict[int, float]:
        self.assure_finished()
        return dict(self._plot)


class ReverseBFS(BFS):
    """Hop distances following IN-edges (``cpp/distance/ReverseBFS.cpp``):
    identical to :class:`BFS` on the transposed graph; on undirected
    graphs the two coincide (the reference walks ``forInNeighborsOf``,
    which is the same neighborhood there). Same plan as BFS — the
    transpose is a projection swap, no extra shuffle."""

    def _run(self) -> None:
        base = self.graph.transpose() if self.graph.directed else self.graph
        inner = BFS(base, self.source, self.max_hops).run()
        self._dist = inner.distances()


class AffectedNodes(Algorithm):
    """Nodes whose shortest-path distances change under one edge event
    (``cpp/distance/AffectedNodes.cpp:16-460``), plus the level-based
    harmonic-closeness improvement bounds the reference derives for
    insertions (used by its dynamic top-harmonic-closeness machinery).

    Contract (the reference's usage contract): ``graph`` is the
    CURRENT graph — for ``EDGE_ADDITION`` the event edge is already
    present, for ``EDGE_REMOVAL`` already absent.

    Spark re-expression: every ingredient is one of four batched BFS
    runs (forward/reverse, with/without the event edge) over filtered
    views of the edge table — the reference's pruned "affected" BFS
    (``getAffectedNodes``, ``:393-437``) finds exactly the nodes whose
    full-BFS distance strictly improved (an improved node's shortest
    path runs through the event edge, so its predecessor is improved
    too — the pruned frontier loses nobody), so affected sets are a
    join of two distance frames, no custom traversal. The level
    histograms behind the closeness/improvement formulas are
    O(diameter)-row aggregates collected to the driver; the O(L²)
    improvement table is driver-side arithmetic on those histograms,
    exactly the reference's double loop (``:151-168``).

    Outputs: :meth:`nodes` (affected ids), :meth:`distances`
    ``(id, dist)`` — distance to the modification per affected node —
    and for additions :meth:`improvements` ``(id, improvement)`` plus
    the ``closeness_u`` / ``closeness_v`` scalars.
    """

    def __init__(self, graph: Graph, etype: str, u: int, v: int) -> None:
        from networkit_spark.streaming.events import EDGE_ADDITION, EDGE_REMOVAL

        if etype not in (EDGE_ADDITION, EDGE_REMOVAL):
            raise ValueError(f"unsupported event type {etype!r}")
        super().__init__(graph)
        self.etype = etype
        self.u, self.v = int(u), int(v)
        self._nodes: DataFrame | None = None
        self._distances: DataFrame | None = None
        self._improvements: DataFrame | None = None
        self.closeness_u: float = 0.0
        self.closeness_v: float = 0.0

    # -- helpers -----------------------------------------------------------
    def _without_event_edge(self) -> Graph:
        g, u, v = self.graph, self.u, self.v
        if g.directed:
            drop = (F.col("src") == u) & (F.col("dst") == v)
        else:
            drop = ((F.col("src") == u) & (F.col("dst") == v)) | (
                (F.col("src") == v) & (F.col("dst") == u)
            )
        return Graph(
            g.edges.where(~drop),
            directed=g.directed,
            weighted=g.weighted,
            vertices=g.vertices,
        )

    def _with_event_edge(self) -> Graph:
        g = self.graph
        spark = g.edges.sparkSession
        extra = spark.createDataFrame(
            [(self.u, self.v, 1.0)], "src long, dst long, weight double"
        )
        return Graph(
            g.edges.unionByName(extra),
            directed=g.directed,
            weighted=g.weighted,
            vertices=g.vertices,
        )

    @staticmethod
    def _dist(graph: Graph, source: int, reverse: bool = False) -> DataFrame:
        algo = (ReverseBFS if reverse else BFS)(graph, source)
        return algo.run().distances()

    @staticmethod
    def _hist(dist: DataFrame) -> dict[int, int]:
        rows = dist.groupBy("dist").agg(F.count(F.lit(1)).alias("c")).collect()
        return {int(r["dist"]): int(r["c"]) for r in rows}

    @staticmethod
    def _improved(new: DataFrame, old: DataFrame) -> DataFrame:
        """ids where the new distance strictly beats the old (absent old
        = unreachable = +inf)."""
        o = old.select("id", F.col("dist").alias("old_dist"))
        return (
            new.join(o, "id", "left")
            .where(F.col("old_dist").isNull() | (F.col("dist") < F.col("old_dist")))
            .select("id")
        )

    @staticmethod
    def _level_improvement(
        hist_new: dict[int, int], hist_old: dict[int, int], levels_i: int
    ) -> dict[int, float]:
        """``levelImprovement[i] = Σ_j (new[j] − old[j]) / (i + j)``
        (``AffectedNodes.cpp:151-168``). The reference bounds j by the
        max NEW level — old-histogram mass at deeper levels is excluded,
        reproduced exactly here."""
        levels_j = max(hist_new, default=0)
        out: dict[int, float] = {}
        for i in range(1, levels_i + 1):
            out[i] = sum(
                (hist_new.get(j, 0) - hist_old.get(j, 0)) / float(i + j)
                for j in range(1, levels_j + 1)
            )
        return out

    @staticmethod
    def _harmonic(hist: dict[int, int]) -> float:
        return sum(c / float(i) for i, c in hist.items() if i >= 1)

    def _lookup_join(
        self, base: DataFrame, key_col: str, table: dict[int, float]
    ) -> DataFrame:
        spark = self.graph.edges.sparkSession
        rows = [(int(k), float(val)) for k, val in table.items()]
        lk = spark.createDataFrame(rows or [(-1, 0.0)], "k long, improvement double")
        return (
            base.join(F.broadcast(lk), base[key_col] == lk["k"], "left")
            .na.fill({"improvement": 0.0})
            .select("id", "improvement")
        )

    # -- run ---------------------------------------------------------------
    def _run(self) -> None:
        from networkit_spark.streaming.events import EDGE_ADDITION

        if self.etype == EDGE_ADDITION:
            self._added()
        else:
            self._removed()

    def _added(self) -> None:
        g, u, v = self.graph, self.u, self.v
        g_old = self._without_event_edge()
        if not g.directed:
            old_u = self._dist(g_old, u).persist()
            old_v = self._dist(g_old, v).persist()
            new_u = self._dist(g, u).persist()
            new_v = self._dist(g, v).persist()
            aff_u = self._improved(new_u, old_u)
            aff_v = self._improved(new_v, old_v)
            # provably disjoint: improving toward u needs old_v+1 < old_u,
            # toward v the reverse — both cannot hold
            nodes = aff_u.unionAll(aff_v)
            ou = old_u.select("id", F.col("dist").alias("du"))
            ov = old_v.select("id", F.col("dist").alias("dv"))
            self._distances = (
                nodes.join(ou, "id", "left")
                .join(ov, "id", "left")
                .select("id", F.least("du", "dv").alias("dist"))
            )
            h_old_u, h_old_v = self._hist(old_u), self._hist(old_v)
            h_new_u, h_new_v = self._hist(new_u), self._hist(new_v)
            self.closeness_u = self._harmonic(h_new_u)
            self.closeness_v = self._harmonic(h_new_v)
            lvl_u = max(h_new_u, default=0)
            lvl_v = max(h_new_v, default=0)
            imp_u = self._level_improvement(h_new_v, h_old_v, lvl_u)
            imp_v = self._level_improvement(h_new_u, h_old_u, lvl_v)
            # improvements[w] = levelImprovementU[newDist_v(w)] for w
            # affected toward u, and symmetrically (:170-177)
            nv = new_v.select("id", F.col("dist").alias("key"))
            nu = new_u.select("id", F.col("dist").alias("key"))
            iu = self._lookup_join(aff_u.join(nv, "id", "left"), "key", imp_u)
            iv = self._lookup_join(aff_v.join(nu, "id", "left"), "key", imp_v)
            self._improvements = iu.unionAll(iv)
            self._nodes = nodes
            return
        # directed insertion (:181-253): two reverse searches from v
        # (old = skip the in-edge from u), forward pair from u for the
        # closeness histograms
        rev_new_u = self._dist(g, u, reverse=True)
        rev_old_v = self._dist(g_old, v, reverse=True).persist()
        rev_new_v = self._dist(g, v, reverse=True).persist()
        aff = self._improved(rev_new_v, rev_old_v)
        rov = rev_old_v.select("id", F.col("dist").alias("dv"))
        rnu = rev_new_u.select("id", F.col("dist").alias("du"))
        self._distances = (
            aff.join(rov, "id", "left")
            .join(rnu, "id", "left")
            .select("id", F.least("dv", "du").alias("dist"))
        )
        fwd_old_u = self._dist(g_old, u)
        fwd_new_u = self._dist(g, u)
        h_old_fu, h_new_fu = self._hist(fwd_old_u), self._hist(fwd_new_u)
        self.closeness_u = self._harmonic(h_new_fu)
        lvl_v = max(self._hist(rev_new_v), default=0)
        imp_v = self._level_improvement(h_new_fu, h_old_fu, lvl_v)
        # improvements[w] = levelImprovementV[newDist_rev_v(w) − 1] (:248-251)
        keyed = aff.join(
            rev_new_v.select("id", (F.col("dist") - F.lit(1)).alias("key")),
            "id",
            "left",
        )
        self._improvements = self._lookup_join(keyed, "key", imp_v)
        self._nodes = aff

    def _removed(self) -> None:
        g, u, v = self.graph, self.u, self.v
        g_plus = self._with_event_edge()
        spark = g.edges.sparkSession
        if not g.directed:
            cur_u = self._dist(g, u).persist()
            cur_v = self._dist(g, v).persist()
            plus_u = self._dist(g_plus, u)
            plus_v = self._dist(g_plus, v)
            # getAffectedNodes(·, ·, additionalStartNeighbor) seeds the
            # opposite endpoint as affected unconditionally (:273-279)
            seed_v = spark.createDataFrame([(v,)], "id long")
            seed_u = spark.createDataFrame([(u,)], "id long")
            aff_u = self._improved(plus_u, cur_u).unionAll(seed_v).distinct()
            aff_v = self._improved(plus_v, cur_v).unionAll(seed_u).distinct()
            nodes = aff_u.unionAll(aff_v).distinct()
            cu = cur_u.select("id", F.col("dist").alias("du"))
            cv = cur_v.select("id", F.col("dist").alias("dv"))
            self._distances = (
                nodes.join(cu, "id", "left")
                .join(cv, "id", "left")
                .select("id", F.least("du", "dv").alias("dist"))
            )
            self._nodes = nodes
            return
        rev_cur_v = self._dist(g, v, reverse=True).persist()
        rev_plus_v = self._dist(g_plus, v, reverse=True)
        seed_u = spark.createDataFrame([(u,)], "id long")
        aff = self._improved(rev_plus_v, rev_cur_v).unionAll(seed_u).distinct()
        self._distances = aff.join(
            rev_cur_v.select("id", "dist"), "id", "left"
        ).select("id", "dist")
        self._nodes = aff

    # -- accessors ----------------------------------------------------------
    def nodes(self) -> DataFrame:
        """Affected node ids (``getNodes``)."""
        self.assure_finished()
        return self._nodes

    def distances(self) -> DataFrame:
        """``(id, dist)`` — distance to the edge modification per
        affected node (``getDistances``, restricted to affected nodes;
        the reference's array holds ∞ elsewhere). ``dist`` is NULL when
        the node was unreachable from both endpoints before the event."""
        self.assure_finished()
        return self._distances

    def improvements(self) -> DataFrame:
        """``(id, improvement)`` — harmonic-closeness improvement upper
        bounds (``getImprovements``); insertions only."""
        self.assure_finished()
        if self._improvements is None:
            raise RuntimeError("improvements are computed for EDGE_ADDITION only")
        return self._improvements
