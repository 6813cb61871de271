"""Maximal independent set — Luby's algorithm as synchronous rounds.

Reference: ``cpp/independentset/Luby.cpp:14-100`` — per round every
still-active node enters the candidate set S with probability
``1/(2·ω'(u))`` where ``ω'`` is the weighted degree restricted to
active neighbors (isolated active nodes have ω' = 0 → probability ∞ →
always selected, which is what terminates them); conflicting candidate
pairs drop the endpoint with the smaller active weighted degree (ties
drop the second endpoint of the edge, ``Luby.cpp:60-70``); survivors
join I and are deactivated together with their neighbors.

Spark plan per round (all JVM-side, one materialized state frame):

    alive edges = sym ⋈ state(src active) ⋈ state(dst active)
    ω' = groupBy(src).sum(weight)
    S  = active ∧ (ω' null ∨ u32(id, round) / 2³² < 1/(2ω'))
    losers = canonical alive S-S edges → smaller-ω' endpoint
             (tie → greater id, the canonical second endpoint)
    S' = S ∖ losers;  deactivate S' ∪ N(S')

Determinism contract: the reference draws ``Aux::Random::probability()``
(seeded Mersenne twister) and resolves conflicts under a benign OpenMP
race (``Luby.cpp:57-75`` mutates S while scanning edges), so its exact
output is run-dependent. This implementation replaces both with
deterministic choices — the md5-lane uniform ``portable_hash32(id ||
round)`` (bit-reproducible in ANSI SQL, same trick as MinHash/ANF) and
the one-shot loser rule above (every conflicted edge eliminates its
loser simultaneously; the surviving set is independent by the same
argument — any S'-internal edge would have designated one endpoint a
loser). Independence + maximality of the final set are invariant-tested
(``IndependentSetFinder::isIndependentSet``,
``cpp/independentset/IndependentSetFinder.cpp:17-30``).

Scale shape: the state is one (id, active, in_mis) frame; each round is
two shuffle-hash joins against the persisted edge table plus one
hash aggregation — no windows, no driver-side node loops. Expected
round count is O(log n) whp (Luby 1986); the budget guard fails loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.dedup import portable_hash32
from networkit_spark.plans.iterate import Materializer

_U32 = 4294967296.0


class Luby(Algorithm):
    """``Luby().run(G)`` analog; returns per-node membership flags."""

    def __init__(
        self, graph: Graph, seed: int = 0, max_rounds: int = 200
    ) -> None:
        if graph.directed:
            raise ValueError(
                "Luby requires an undirected graph (independent sets are "
                "defined on the underlying undirected adjacency)"
            )
        super().__init__(graph)
        self.seed = seed
        self.max_rounds = max_rounds
        self._flags: DataFrame | None = None
        self._iterations = 0

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        canon = (
            g.canonical()
            .select("src", "dst", "weight")
            .where(F.col("src") != F.col("dst"))  # Luby.cpp:58 skips loops
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
        sym = canon.unionAll(
            canon.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        sym = sym.repartition(shuffle_parts, "src").persist()

        state = g.vertices.select(
            "id", F.lit(True).alias("active"), F.lit(False).alias("in_mis")
        )
        state = mat.cut(0, state)

        r = 0
        while r < self.max_rounds:
            r += 1
            act = state.where("active").select("id")
            # alive edges: both endpoints still active (state referenced
            # twice — legal post-local_cut, stats are stripped)
            e_act = (
                sym.join(
                    act.hint("shuffle_hash").withColumnRenamed("id", "src"),
                    "src",
                )
                .join(
                    act.hint("shuffle_hash").withColumnRenamed("id", "dst"),
                    "dst",
                )
                .select("src", "dst", "weight")
            )
            wdeg = e_act.groupBy(F.col("src").alias("id")).agg(
                F.sum("weight").alias("wd")
            )
            u = portable_hash32(
                F.col("id").cast("string"), f"luby{self.seed}r{r}"
            ) / F.lit(_U32)
            s_nodes = (
                act.join(wdeg.hint("shuffle_hash"), "id", "left")
                .where(F.col("wd").isNull() | (u < 1.0 / (2.0 * F.col("wd"))))
                .select("id", F.coalesce("wd", F.lit(0.0)).alias("wd"))
            )
            # losers of conflicted canonical S-S edges: smaller ω' loses,
            # tie drops the (canonically greater) second endpoint
            s_a = s_nodes.select(F.col("id").alias("src"), F.col("wd").alias("w_src"))
            s_b = s_nodes.select(F.col("id").alias("dst"), F.col("wd").alias("w_dst"))
            losers = (
                e_act.where(F.col("src") < F.col("dst"))
                .join(s_a, "src")
                .join(s_b, "dst")
                .select(
                    F.when(F.col("w_dst") > F.col("w_src"), F.col("src"))
                    .otherwise(F.col("dst"))
                    .alias("id")
                )
                .distinct()
            )
            s_prime = s_nodes.select("id").join(losers, "id", "left_anti")
            deact = s_prime.unionAll(
                e_act.join(
                    s_prime.withColumnRenamed("id", "src").hint("shuffle_hash"),
                    "src",
                ).select(F.col("dst").alias("id"))
            ).distinct()
            new_state = (
                state.join(
                    s_prime.withColumn("won", F.lit(True)), "id", "left"
                )
                .join(deact.withColumn("dead", F.lit(True)), "id", "left")
                .select(
                    "id",
                    (F.col("active") & F.col("dead").isNull()).alias("active"),
                    (F.col("in_mis") | F.col("won").isNotNull()).alias("in_mis"),
                )
            )
            state = mat.cut(r, new_state)
            remaining = state.where("active").count()
            if remaining == 0:
                break
        else:
            sym.unpersist()
            raise RuntimeError(
                f"Luby did not converge in {self.max_rounds} rounds — "
                "raise max_rounds"
            )
        self._iterations = r
        self._flags = state.select("id", "in_mis")
        sym.unpersist()

    def flags(self) -> DataFrame:
        """``(id, in_mis)`` — the ``std::vector<bool>`` analog."""
        self.assure_finished()
        return self._flags

    def members(self) -> DataFrame:
        self.assure_finished()
        return self._flags.where("in_mis").select("id")

    def number_of_iterations(self) -> int:
        self.assure_finished()
        return self._iterations


def is_independent_set(graph: Graph, members: DataFrame) -> bool:
    """``IndependentSetFinder::isIndependentSet``
    (``cpp/independentset/IndependentSetFinder.cpp:17-30``): no non-loop
    edge with both endpoints in the set."""
    m_src = members.select(F.col("id").alias("src"))
    m_dst = members.select(F.col("id").alias("dst"))
    bad = (
        graph.canonical()
        .where(F.col("src") != F.col("dst"))
        .join(m_src, "src")
        .join(m_dst, "dst")
        .limit(1)
        .count()
    )
    return bad == 0


def is_maximal(graph: Graph, members: DataFrame) -> bool:
    """Maximality: every non-member has a member neighbor."""
    sym = graph.symmetrized().where(F.col("src") != F.col("dst"))
    covered = (
        sym.join(members.select(F.col("id").alias("dst")), "dst")
        .select(F.col("src").alias("id"))
        .distinct()
    )
    uncovered = (
        graph.vertices.join(members, "id", "left_anti")
        .join(covered, "id", "left_anti")
        .limit(1)
        .count()
    )
    return uncovered == 0
