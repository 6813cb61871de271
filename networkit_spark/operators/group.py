"""Group centrality — greedy group-degree maximization.

Reference: ``cpp/centrality/GroupDegree.cpp:43-127`` — greedy selection
of k nodes maximizing the group degree (number of nodes adjacent to the
group; optionally counting group members themselves via
``countGroupNodes``). The reference maintains a lazy bucket priority
queue with incremental gain updates; this engine recomputes the EXACT
marginal gain for every candidate each step as one join-agg (k driver
rounds, each a single distributed pass — no per-node queue state).

Deliberate divergences, documented:

- ties break toward the smallest node id (the reference inherits the
  unspecified extraction order of its bucket PQ);
- gains are exact every round; the reference's lazy recompute drops the
  "+1 for covering the candidate itself" term for
  ``countGroupNodes=true`` after the first extraction
  (``GroupDegree.cpp:97-126`` recomputes only neighbor coverage), so
  its selections can differ by that off-by-one on specific graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.distance import APSP, BFS
from networkit_spark.plans.iterate import Materializer, local_cut


class GroupDegree(Algorithm):
    def __init__(
        self, graph: Graph, k: int = 5, count_group_nodes: bool = False
    ) -> None:
        if k <= 0:
            raise ValueError("k must be between 1 and n")
        super().__init__(graph)
        self.k = k
        self.count_group_nodes = count_group_nodes
        self._group: list[int] = []
        self._score = 0

    def _run(self) -> None:
        g = self.graph
        # the reference ctor (GroupDegree.cpp) also throws for k > n;
        # checked here (not in __init__) so construction stays lazy —
        # counting n is a Spark job
        if self.k > g.number_of_nodes():
            raise ValueError("k must be between 1 and n")
        spark = g.edges.sparkSession
        out_adj = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        group: list[int] = []
        # covered = group ∪ N_out(group), as (id) rows
        covered = spark.createDataFrame([], "id long")
        for _ in range(self.k):
            cand = out_adj.join(
                covered.withColumnRenamed("id", "dst"), "dst", "left_anti"
            ).groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("nbr_gain")
            )
            base = g.vertices.join(cand, "id", "left").select(
                "id", F.coalesce("nbr_gain", F.lit(0)).alias("nbr_gain")
            )
            if group:
                base = base.where(~F.col("id").isin(group))
            in_cov = covered.select(F.col("id"), F.lit(1).alias("cov"))
            base = base.join(in_cov, "id", "left").select(
                "id", "nbr_gain", F.coalesce("cov", F.lit(0)).alias("cov")
            )
            if self.count_group_nodes:
                gain = F.col("nbr_gain") + (1 - F.col("cov"))
            else:
                gain = F.col("nbr_gain") - F.col("cov")
            pick = (
                base.select("id", gain.alias("gain"))
                .orderBy(F.desc("gain"), F.asc("id"))
                .limit(1)
                .collect()
            )
            if not pick:
                break
            u = pick[0]["id"]
            group.append(u)
            newly = (
                out_adj.where(F.col("src") == u)
                .select(F.col("dst").alias("id"))
                .unionAll(spark.createDataFrame([(u,)], "id long"))
            )
            covered = local_cut(
                covered.unionAll(newly).distinct()
            )
        self._group = group
        n_cov = covered.count()
        # groupScore = |reachable| (− k when group members don't count:
        # GroupDegree.hpp:96-102)
        self._score = n_cov - (0 if self.count_group_nodes else len(group))
        out_adj.unpersist()

    def group_max_degree(self) -> list[int]:
        """``GroupDegree::groupMaxDegree`` (``GroupDegree.hpp:86-89``)."""
        self.assure_finished()
        return self._group

    def get_score(self) -> int:
        """``GroupDegree::getScore`` (``GroupDegree.hpp:91-94``)."""
        self.assure_finished()
        return self._score


class GroupCloseness(Algorithm):
    """Greedy group-closeness maximization —
    ``cpp/centrality/GroupCloseness.cpp:83-205``: start from the top
    closeness node (``H == 0``; max-degree node when ``H > 0``,
    ``GroupCloseness.cpp:103-109``), then ``k − 1`` greedy rounds each
    adding the node whose addition most decreases the group farness
    ``Σ_v d(v, S)``. The reference evaluates candidates one at a time
    through a lazy bucket queue with submodular bounds (a sequential
    optimization that does not change the argmax); this engine scores
    EVERY candidate per round in one batched pruned BFS.

    Key identity (why batching is exact): the reference's
    ``computeImprovement`` BFS relaxes from ``u`` only where it improves
    the current field ``d``; because ``d`` is a true distance field
    (triangle inequality holds), a relaxation path blocked at an
    unimproved vertex ``x`` cannot improve anything past ``x`` either
    (``d[w] ≤ d[x] + dist(x, w) ≤ dist(u, w)``), so
    ``improvement(u) = Σ_v max(0, d[v] − dist(u, v))`` exactly — the
    batched frontier only carries pairs ``(u, v)`` with
    ``dist(u, v) < d[v]``, the same pruning the reference applies
    per-candidate.

    Candidate filter mirrors ``GroupCloseness.cpp:183-184``: only nodes
    with ``deg > 1``, ``d > 0`` and not (``d == 1`` and ``deg == 2``)
    are evaluated. ``H > 0`` bounds the improvement BFS to parent level
    ``≤ H`` (children up to ``H + 1`` counted, matching the pop-order
    break at ``GroupCloseness.cpp:36``), while the post-pick distance
    update is always unbounded (``newDistances(S[i], n, G, 0)``,
    ``GroupCloseness.cpp:200``).

    Documented divergences:

    - ties break toward the smallest node id (the reference's OpenMP
      race on ``imp > currentImpr`` makes its ties nondeterministic);
    - unreachable vertices take the finite sentinel ``d = n`` instead
      of the reference's ``(count)∞`` (whose improvement sums overflow
      uint64 on disconnected graphs); qualitative behavior — candidates
      covering unreached components dominate — is preserved without the
      overflow.
    """

    def __init__(self, graph: Graph, k: int = 5, h: int = 0) -> None:
        if k <= 0:
            raise ValueError("k must be between 1 and n")
        super().__init__(graph)
        self.k = k
        self.h = int(h)
        self._group: list[int] = []
        self._d: DataFrame | None = None

    def _pruned_bfs(
        self, sym: DataFrame, sources: DataFrame, d: DataFrame, h: int
    ):
        """Batched multi-source BFS relaxing only improving pairs.

        ``sources``: (u) rows. Returns (u, v, nd) with
        ``nd = dist(u, v) < d[v]`` (parent level capped at ``h`` when
        ``h > 0``).
        """
        mat = Materializer()
        dcol = d.select(F.col("id").alias("v"), F.col("d").alias("cur"))
        frontier = mat.cut(
            0,
            sources.select(
                F.col("u"), F.col("u").alias("v"), F.lit(0).alias("nd")
            ),
        )
        best = frontier
        level = 0
        while True:
            if h > 0 and level > h:
                break
            nxt = (
                sym.join(frontier.hint("shuffle_hash"), sym.src == frontier.v)
                .select("u", F.col("dst").alias("v"))
                .distinct()
                .withColumn("nd", F.lit(level + 1))
                .join(dcol, "v")
                .where(F.col("nd") < F.col("cur"))
                .drop("cur")
                .join(best.select("u", "v"), ["u", "v"], "left_anti")
                .select("u", "v", "nd")
            )
            nxt = mat.cut(level + 1, nxt)
            if nxt.limit(1).count() == 0:
                break
            level += 1
            best = mat.cut(level, best.unionAll(nxt))
            frontier = nxt
        return best

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        n = g.number_of_nodes()
        if self.k > n:
            raise ValueError("k must be between 1 and n")
        sym = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        deg = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        # S[0]: top closeness node for H == 0 (TopCloseness(G, 1),
        # GroupCloseness.cpp:104-107), max-degree node for H > 0
        # (GroupCloseness.cpp:100-109; its std::sort tie is unspecified
        # — smallest id here)
        if self.h == 0:
            from networkit_spark.operators.betweenness import TopCloseness

            top = TopCloseness(g, 1).run().topk_nodes_list()[0]
        else:
            top = deg.orderBy(F.desc("deg"), F.asc("id")).limit(1).collect()[
                0
            ]["id"]
        group = [int(top)]
        # d[v] = dist(v, S); sentinel n for unreached (see docstring)
        bfs = BFS(g, int(top)).run()
        d = local_cut(
            g.vertices.join(
                bfs.distances().withColumnRenamed("dist", "d0"), "id", "left"
            ).select("id", F.coalesce("d0", F.lit(n)).alias("d"))
        )
        for _ in range(1, self.k):
            in_group = F.col("id").isin([int(x) for x in group])
            cand = (
                d.join(deg, "id", "left")
                .select("id", "d", F.coalesce("deg", F.lit(0)).alias("deg"))
                .where(
                    (F.col("deg") > 1)
                    & (F.col("d") > 0)
                    & ~((F.col("d") == 1) & (F.col("deg") == 2))
                    & ~in_group
                )
                .select(F.col("id").alias("u"))
            )
            reached = self._pruned_bfs(sym, cand, d, self.h)
            imp = (
                reached.join(
                    d.select(F.col("id").alias("v"), "d"), "v"
                )
                .groupBy("u")
                .agg(F.sum(F.col("d") - F.col("nd")).alias("improvement"))
            )
            pick = (
                imp.orderBy(F.desc("improvement"), F.asc("u"))
                .limit(1)
                .collect()
            )
            if not pick:
                break
            u = int(pick[0]["u"])
            group.append(u)
            if self.h == 0:
                upd = reached.where(F.col("u") == u)
            else:
                upd = self._pruned_bfs(
                    sym,
                    spark.createDataFrame([(u,)], "u long"),
                    d,
                    0,
                )
            d = local_cut(
                d.join(
                    upd.select(F.col("v").alias("id"), "nd"), "id", "left"
                ).select("id", F.least("d", F.col("nd")).alias("d"))
            )
        sym.unpersist()
        self._group = group
        self._d = d

    def group_max_closeness(self) -> list[int]:
        """``GroupCloseness::groupMaxCloseness`` (reference accessor)."""
        self.assure_finished()
        return self._group

    def distances(self) -> DataFrame:
        """Final ``(id, d)`` distance-to-group field (sentinel ``n``
        for unreachable)."""
        self.assure_finished()
        return self._d

    def compute_farness(self) -> float:
        """``GroupCloseness::computeFarness`` of the selected group —
        Σ of reached distances (the reference's visited-only sum,
        ``GroupCloseness.cpp:208-237``)."""
        self.assure_finished()
        n = self.graph.number_of_nodes()
        return float(
            self._d.where(F.col("d") < n)
            .agg(F.sum("d").alias("s"))
            .collect()[0]["s"]
        )


class ApproxGroupBetweenness(Algorithm):
    """Sampled group-betweenness maximization —
    ``cpp/centrality/ApproxGroupBetweenness.cpp:37-141`` (Mahmoody,
    Tsourakakis & Upfal, "Scalable Betweenness Centrality Maximization
    via Sampling", KDD 2016): draw ``⌈k·ln(n)/ε²⌉`` random (s, t)
    pairs, for each sample one uniform shortest s→t path and keep its
    INTERIOR vertices as a hyperedge, then greedily pick the k nodes
    covering the most uncovered hyperedges.

    Spark re-expression:

    - all samples' BFS trees advance together (one batched
      ``(source, id, dist)`` frontier — the EstimateBetweenness shape;
      duplicate sources deduped);
    - the backward path walk advances ALL samples one step per round
      (``O(max dist)`` rounds): a step joins the walk head with its
      predecessor set ``{u : (u→cur) ∧ dist(s,u)+1 = dist(s,cur)}`` and
      keeps the min seeded-hash candidate;
    - greedy max-coverage is k join-agg rounds (the GroupDegree shape):
      count alive hyperedges per node, pick the max, anti-join away the
      hyperedges it covers.

    Documented divergences (the reference is RNG-order-dependent, so
    bit-parity is not meaningful): sampling and the uniform
    predecessor choice use seeded ``xxhash64`` draws instead of a
    global RNG (deterministic under a fixed seed); greedy ties break
    toward the smallest node id (reference: bucket-queue order); the
    reference picks its per-step predecessor uniformly from the
    predecessor LIST (``Aux::Random::integer``), which is the same
    distribution as min-hash over the same set.
    """

    def __init__(
        self,
        graph: Graph,
        group_size: int,
        epsilon: float = 0.1,
        seed: int = 42,
        max_hops: int = 10_000,
    ) -> None:
        super().__init__(graph)
        if graph.directed:
            raise ValueError("the graph must be undirected")
        if epsilon <= 0:
            raise ValueError("epsilon must be greater than 0")
        self.group_size = int(group_size)
        self.epsilon = float(epsilon)
        self.seed = int(seed)
        self.max_hops = max_hops
        self._group: list[int] = []

    def _run(self) -> None:
        import math

        g = self.graph
        spark = g.edges.sparkSession
        n = g.number_of_nodes()
        if self.group_size == 0 or self.group_size >= n:
            # reference ctor contract (ApproxGroupBetweenness.cpp:27-30)
            raise ValueError("the group size must be between 1 and n-1")
        samples = max(
            1, int(self.group_size * math.log(n) / (self.epsilon**2))
        )
        sym = (
            g.symmetrized()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        # deterministic (s, t) draws: rank vertices once, index by
        # seeded hash of the sample id (t re-drawn with a lane salt; a
        # residual s == t collision just yields an empty hyperedge,
        # which the reference also tolerates via its components check)
        from pyspark.sql import Window

        ranked = g.vertices.select(
            "id",
            (F.row_number().over(Window.orderBy("id")) - 1).alias("pos"),
        )
        sids = spark.range(samples).select(F.col("id").alias("sample"))
        draws = (
            sids.select(
                "sample",
                F.pmod(
                    F.xxhash64(F.col("sample"), F.lit("s"), F.lit(self.seed)),
                    F.lit(n),
                ).alias("spos"),
                F.pmod(
                    F.xxhash64(F.col("sample"), F.lit("t"), F.lit(self.seed)),
                    F.lit(n),
                ).alias("tpos"),
            )
            .join(
                ranked.select(F.col("pos").alias("spos"), F.col("id").alias("s")),
                "spos",
            )
            .join(
                ranked.select(F.col("pos").alias("tpos"), F.col("id").alias("t")),
                "tpos",
            )
            .select("sample", "s", "t")
            .where(F.col("s") != F.col("t"))
        )
        draws = local_cut(draws)
        # batched BFS from the distinct sources
        srcs = [int(r["s"]) for r in draws.select("s").distinct().collect()]
        apsp = APSP(g, sources=srcs, max_hops=self.max_hops).run()
        dist = apsp.distances().withColumnRenamed("source", "s").persist()
        # per-sample target distance; unreachable pairs drop out (the
        # reference's empty-hyperedge case)
        heads = local_cut(
            draws.join(
                dist.select("s", F.col("id").alias("t"), F.col("dist").alias("td")),
                ["s", "t"],
            ).select("sample", "s", F.col("t").alias("cur"), F.col("td").alias("rem"))
        )
        mat = Materializer()
        interiors = []
        step = 0
        # walk back rem-1 predecessors; stop when every walk is at rem <= 1
        while True:
            alive = heads.where(F.col("rem") > 1)
            if alive.limit(1).count() == 0:
                break
            step += 1
            cand = (
                alive.join(
                    sym.select(F.col("dst").alias("cur"), F.col("src").alias("p")),
                    "cur",
                )
                .join(
                    dist.select(
                        "s", F.col("id").alias("p"), F.col("dist").alias("pd")
                    ),
                    ["s", "p"],
                )
                .where(F.col("pd") == F.col("rem") - 1)
            )
            w = Window.partitionBy("sample").orderBy(
                F.xxhash64("sample", "p", F.lit(step), F.lit(self.seed)),
                F.asc("p"),
            )
            nxt = (
                cand.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") == 1)
                .select(
                    "sample",
                    "s",
                    F.col("p").alias("cur"),
                    (F.col("rem") - 1).alias("rem"),
                )
            )
            nxt = mat.cut(step, nxt)
            interiors.append(nxt.select("sample", F.col("cur").alias("id")))
            heads = nxt
        if interiors:
            hyper = interiors[0]
            for part in interiors[1:]:
                hyper = hyper.unionAll(part)
            hyper = local_cut(hyper.distinct())
        else:
            hyper = spark.createDataFrame([], "sample long, id long")
        dist.unpersist()
        # greedy max coverage, k rounds
        group: list[int] = []
        alive = hyper
        for _ in range(self.group_size):
            counts = alive.groupBy("id").agg(
                F.countDistinct("sample").alias("cov")
            )
            if group:
                counts = counts.where(~F.col("id").isin(group))
            pick = (
                counts.orderBy(F.desc("cov"), F.asc("id")).limit(1).collect()
            )
            if not pick:
                # all hyperedges covered — fall back to smallest
                # unpicked vertices (reference: extracts remaining queue
                # order; deterministic here)
                rest = (
                    g.vertices.where(~F.col("id").isin(group))
                    .orderBy("id")
                    .limit(self.group_size - len(group))
                    .collect()
                )
                group.extend(int(r["id"]) for r in rest)
                break
            u = int(pick[0]["id"])
            group.append(u)
            covered = alive.where(F.col("id") == u).select("sample")
            alive = local_cut(
                alive.join(covered, "sample", "left_anti")
            )
        sym.unpersist()
        self._group = group

    def group_max_betweenness(self) -> list[int]:
        """``ApproxGroupBetweenness::groupMaxBetweenness``."""
        self.assure_finished()
        return self._group
