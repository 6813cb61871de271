"""KPathCentrality — random self-avoiding walk sampling.

Reference (``cpp/centrality/KPathCentrality.cpp:18-103``): run
``t = 2k²·n^(1−2α)·ln(n)`` self-avoiding random walks, each from a
uniform start node with uniform length ℓ ∈ [1, k]; every VISIT (not
just first) increments the visited node's counter; score(v) =
``k·n·counter[v]/t``. Weighted graphs step to an unexplored neighbor
with probability ∝ 1/w (``KPathCentrality.cpp:62-84``).

Differences from the reference, by design: all randomness comes from
seeded ``xxhash64`` draws (start node, walk length, per-step neighbor
choice), so results are bit-reproducible at any parallelism — the
reference's shared ``Aux::Random`` is not. Weighted choice uses the
Efraimidis–Spirakis key ``u^(1/p)`` with ``p = 1/w`` (argmax == draw
∝ 1/w), the standard distributed weighted-sampling reduction.

Spark plan: every walk advances in the SAME round — state
``(wid, cur, visited, remaining)`` joins the adjacency once per round
(k rounds total, k ≈ ln(n+m)), candidate filtering by
``array_contains`` on the ≤k-element visited array, per-walk argmax by
one min/max aggregation. All t walks run at once; no driver loop over
walks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph, zip_dense_rank
from networkit_spark.operators.base import Centrality
from networkit_spark.plans.iterate import local_cut


class KPathCentrality(Centrality):
    def __init__(
        self,
        graph: Graph,
        alpha: float = 0.2,
        k: int = 0,
        num_walks: int | None = None,
        seed: int = 42,
    ) -> None:
        if not (-0.5 <= alpha <= 0.5):
            raise RuntimeError("alpha must lie in interval [-0.5, 0.5]")
        if k < 0:
            raise RuntimeError("k must be an integer")
        super().__init__(graph)
        self.alpha = alpha
        self.k = k
        self.num_walks = num_walks  # override for tests / budget control
        self.seed = seed

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        n = g.number_of_nodes()
        m = g.number_of_edges()
        if n == 0:
            self._scores = g.vertices.select("id", F.lit(0.0).alias("score"))
            return
        k = self.k if self.k > 0 else max(int(math.log(n + m)), 1)
        t = (
            self.num_walks
            if self.num_walks is not None
            else max(
                int(2.0 * k * k * (n ** (1 - 2 * self.alpha)) * math.log(n)), 1
            )
        )
        sym = (
            g.symmetrized()
            .select("src", "dst", "weight")
            .where(F.col("src") != F.col("dst"))
            .persist()
        )
        # dense 0..n-1 index per vertex for uniform start-node draws
        idx = zip_dense_rank(g.vertices, "id", "pos")
        walks = spark.range(t).select(F.col("id").alias("wid"))
        starts = (
            walks.select(
                "wid",
                (F.pmod(F.xxhash64("wid", F.lit(self.seed)), F.lit(n))).alias(
                    "pos"
                ),
                (
                    F.lit(1)
                    + F.pmod(
                        F.xxhash64("wid", F.lit("len"), F.lit(self.seed)),
                        F.lit(k),
                    )
                ).alias("remaining"),
            )
            .join(F.broadcast(idx), "pos")
            .select(
                "wid",
                F.col("id").alias("cur"),
                F.array(F.col("id")).alias("visited"),
                "remaining",
            )
        )
        state = local_cut(starts)
        visit_counts: DataFrame | None = None
        weighted = g.weighted
        for step in range(k):
            frontier = state.where(F.col("remaining") > 0)
            cand = frontier.join(sym, frontier.cur == sym.src).where(
                ~F.array_contains(F.col("visited"), F.col("dst"))
            )
            u01 = (
                F.xxhash64("wid", "dst", F.lit(step), F.lit(self.seed)).cast(
                    "double"
                )
                / F.lit(float(2**63))
            ) / 2.0 + 0.5
            if weighted:
                # Efraimidis–Spirakis: argmax u^(1/p), p ∝ 1/w ⇒
                # key = u^w maximized  (draw probability ∝ 1/w)
                key = F.pow(u01, F.col("weight"))
            else:
                key = u01
            pick = local_cut(
                cand.groupBy("wid")
                .agg(F.max(F.struct(key.alias("k"), F.col("dst").alias("nxt"))).alias("p"))
                .select("wid", F.col("p.nxt").alias("nxt"))
            )  # materialized once: feeds both the state update and counts
            new_state = (
                state.join(pick, "wid", "left")
                .select(
                    "wid",
                    F.coalesce("nxt", F.col("cur")).alias("cur"),
                    F.when(
                        F.col("nxt").isNotNull(),
                        F.array_union("visited", F.array("nxt")),
                    )
                    .otherwise(F.col("visited"))
                    .alias("visited"),
                    F.when(
                        F.col("nxt").isNotNull(), F.col("remaining") - 1
                    )
                    .otherwise(F.lit(0))
                    .alias("remaining"),
                )
            )
            state = local_cut(new_state)
            step_visits = pick.groupBy(F.col("nxt").alias("id")).agg(
                F.count(F.lit(1)).alias("c")
            )
            visit_counts = (
                step_visits
                if visit_counts is None
                else local_cut(
                    visit_counts.unionAll(step_visits)
                    .groupBy("id")
                    .agg(F.sum("c").alias("c"))
                )
            )
            if state.where(F.col("remaining") > 0).isEmpty():
                break
        counts = visit_counts if visit_counts is not None else (
            g.vertices.select("id", F.lit(0).alias("c")).limit(0)
        )
        self._scores = g.vertices.join(counts, "id", "left").select(
            "id",
            (
                F.lit(float(k) * n)
                * F.coalesce("c", F.lit(0)).cast("double")
                / F.lit(float(t))
            ).alias("score"),
        )
        sym.unpersist()


def exact_kpath_expectation(graph: Graph, k: int) -> DataFrame:
    """Exact expectation of the KADABRA-style κ-path estimator:
    ``E[score(v)] = Σ_{paths} P(path)·(k − depth(v) + 1)`` over all
    self-avoiding walks of length ≤ k (uniform start, uniform length
    ℓ ∈ [1, k], uniform unexplored-neighbor steps — the unweighted
    measure of ``KPathCentrality.cpp:62-84``). The ``(k − d + 1)``
    factor is k·P(ℓ ≥ d): a visit at depth d happens iff the drawn
    length reaches it.

    Validation twin for the sampler (the ε-contract gate in
    ``__spark_entry__.q_kpath`` hashes it against an independent DuckDB
    recursion): exhaustive O(n·Δ^(k−1)) path enumeration, so fixture
    scale only — but fully distributed: each depth is one join of the
    path-state frame against the adjacency plus one count-agg for the
    per-state branching factor; no driver loop over paths.
    """
    g = graph
    sym = (
        g.symmetrized()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    state = g.vertices.select(
        F.col("id").alias("s"),
        F.col("id").alias("cur"),
        F.array(F.col("id")).alias("visited"),
        F.lit(0).alias("depth"),
        F.lit(1.0).alias("prob"),
    )
    acc: DataFrame | None = None
    for _ in range(k):
        cand = state.join(sym, state.cur == sym.src).where(
            ~F.array_contains(F.col("visited"), F.col("dst"))
        )
        nc = cand.groupBy("s", "visited").agg(
            F.count(F.lit(1)).alias("nc")
        )
        step = local_cut(
            cand.join(nc, ["s", "visited"]).select(
                "s",
                F.col("dst").alias("cur"),
                F.array_union("visited", F.array("dst")).alias("visited"),
                (F.col("depth") + 1).alias("depth"),
                (F.col("prob") / F.col("nc")).alias("prob"),
            )
        )
        contrib = step.groupBy(F.col("cur").alias("id")).agg(
            F.sum(
                F.col("prob") * (F.lit(k) - F.col("depth") + F.lit(1))
            ).alias("ex")
        )
        acc = (
            contrib
            if acc is None
            else local_cut(
                acc.unionAll(contrib).groupBy("id").agg(F.sum("ex").alias("ex"))
            )
        )
        state = step
    empty = g.vertices.select("id", F.lit(0.0).alias("ex")).limit(0)
    return g.vertices.join(acc if acc is not None else empty, "id", "left").select(
        "id", F.coalesce("ex", F.lit(0.0)).alias("exact")
    )
