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

from pyspark.sql import DataFrame, functions as F

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
