"""Selective community detection — PageRankNibble (seed-set expansion).

Reference: ``PageRankNibble`` (``cpp/scd/PageRankNibble.cpp:18-97``,
``include/networkit/scd/PageRankNibble.hpp:25-52``) over
``ApproximatePageRank`` (``cpp/scd/ApproximatePageRank.cpp:17-57``) —
Andersen, Chung & Lang, "Local Graph Partitioning using PageRank
Vectors" (FOCS 2006, public): push-style personalized PageRank with
lazy 1/2 walk until every residual satisfies ``r(v) < ε·vol(v)``, then
the best-conductance sweep cut over the support ordered by
``p(v)/vol(v)``.

Spark re-expression, batched over BOTH the active set and the seeds:

- state is ONE frame ``(seed, id, p, r)``; each round pushes EVERY
  active node of EVERY seed simultaneously (active ⇔ r ≥ ε·vol). The
  ACL invariant ``p + PPR(r) = PPR(seed)`` holds per push and is
  order-independent, so the batch push terminates with the same
  ε-guarantee as the reference's queue (documented divergence: exact
  support/values can differ within the ε bound, since the reference's
  pop order is queue-dependent).
- the sweep is windows per seed: rank = row_number over
  (p/vol desc, id asc — the reference's parallel sort leaves ties
  unspecified; ours is deterministic), prefix cut via ±w rank deltas
  (an edge inside the support opens at min rank and closes at max
  rank; an edge leaving the support never closes), prefix volume via
  cumulative weighted degree, conductance = cut/min(vol, total−vol)
  with the reference's strict-improvement, size < n rule (an isolated
  seed yields NaN conductance everywhere → empty community, matching
  the reference's bestSweepSetIndex = 0).

ACL bounds the support size by O(1/(ε·α)), so the per-seed window
partitions are constant-bounded — no skew at any graph scale; the push
rounds are vertex-keyed join-aggs shared across all seeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer


class PageRankNibble(Algorithm):
    def __init__(
        self,
        graph: Graph,
        seeds: list[int],
        alpha: float = 0.1,
        epsilon: float = 1e-4,
        max_rounds: int = 500,
    ) -> None:
        if not (0 < alpha < 1):
            raise ValueError("alpha must be in (0, 1)")
        if epsilon <= 0:
            raise ValueError("epsilon must be positive")
        if not seeds:
            raise ValueError("at least one seed required")
        super().__init__(graph)
        self.seeds = [int(s) for s in seeds]
        self.alpha = float(alpha)
        self.epsilon = float(epsilon)
        self.max_rounds = max_rounds
        self._communities: DataFrame | None = None
        self._ppr: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        adj = (
            (g.edges if g.directed else g.symmetrized())
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("w"))
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        adj = adj.repartition(shuffle_parts, "src").persist()
        vol = adj.groupBy(F.col("src").alias("id")).agg(
            F.sum("w").alias("vol")
        )
        vol = mat.cut(0, vol)
        tot_row = vol.agg(F.sum("vol").alias("t")).collect()[0]
        total_volume = float(tot_row["t"] or 0.0)

        a, eps = self.alpha, self.epsilon
        state = spark.createDataFrame(
            [(s, s) for s in self.seeds], "seed long, id long"
        ).select("seed", "id", F.lit(0.0).alias("p"), F.lit(1.0).alias("r"))
        state = state.join(vol, "id", "left").select(
            "seed", "id", "p", "r", F.coalesce("vol", F.lit(0.0)).alias("v")
        )
        state = mat.cut(1, state)

        for rnd in range(2, self.max_rounds + 2):
            # active: r ≥ ε·vol (isolated nodes v=0 hold their residual
            # forever in the reference too — pushing to no neighbors)
            is_active = (F.col("r") >= eps * F.col("v")) & (F.col("v") > 0)
            n_active = state.where(is_active).limit(1).count()
            if n_active == 0:
                break
            act = state.where(is_active)
            mass = (
                adj.join(
                    act.select(
                        F.col("id").alias("src"), "seed",
                        F.col("r").alias("r_u"), F.col("v").alias("v_u"),
                    ).hint("shuffle_hash"),
                    "src",
                )
                .groupBy("seed", F.col("dst").alias("id"))
                .agg(
                    F.sum(
                        F.lit(1.0 - a) * F.col("r_u") * F.col("w")
                        / (F.lit(2.0) * F.col("v_u"))
                    ).alias("dr")
                )
            )
            updated = state.select(
                "seed", "id",
                F.when(is_active, F.col("p") + a * F.col("r"))
                .otherwise(F.col("p"))
                .alias("p"),
                F.when(is_active, (1.0 - a) * F.col("r") / 2.0)
                .otherwise(F.col("r"))
                .alias("r"),
                "v",
            )
            merged = (
                updated.join(mass, ["seed", "id"], "full_outer")
                .join(vol.withColumnRenamed("vol", "v2"), "id", "left")
                .select(
                    "seed", "id",
                    F.coalesce("p", F.lit(0.0)).alias("p"),
                    (
                        F.coalesce("r", F.lit(0.0))
                        + F.coalesce("dr", F.lit(0.0))
                    ).alias("r"),
                    F.coalesce("v", "v2", F.lit(0.0)).alias("v"),
                )
            )
            state = mat.cut(rnd, merged)
        else:
            adj.unpersist()
            raise RuntimeError(
                f"ACL push did not drain in {self.max_rounds} rounds — "
                "raise max_rounds or epsilon"
            )

        self._ppr = state.select("seed", "id", "p", "r")

        # ---------------- sweep cut per seed (windows over the support)
        support = state.select(
            "seed", "id", "p", "v",
            (F.col("p") / F.when(F.col("v") > 0, F.col("v")).otherwise(
                F.lit(float("nan"))
            )).alias("score"),
        )
        w_rank = Window.partitionBy("seed").orderBy(
            F.desc("score"), F.asc("id")
        )
        ranked = support.select(
            "seed", "id", "v", F.row_number().over(w_rank).alias("rk")
        )
        ranked = mat.cut(10_000, ranked)
        ru = ranked.select(
            "seed", F.col("id").alias("src"), F.col("rk").alias("rk_u")
        )
        rv = ranked.select(
            "seed", F.col("id").alias("dst"), F.col("rk").alias("rk_v")
        )
        # rank deltas: every support edge opens at its endpoint's rank;
        # it closes at the other endpoint's rank only if that endpoint
        # is in the support
        inc = (
            adj.join(ru.hint("shuffle_hash"), "src")
            .join(rv, ["seed", "dst"], "left")
            .select(
                "seed", "w",
                F.col("rk_u").alias("rk"),
                F.when(
                    F.col("rk_v").isNotNull() & (F.col("rk_v") < F.col("rk_u")),
                    -F.col("w"),
                ).otherwise(F.col("w")).alias("delta"),
            )
        )
        deltas = inc.groupBy("seed", "rk").agg(F.sum("delta").alias("d"))
        w_cum = (
            Window.partitionBy("seed")
            .orderBy("rk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        sweep = (
            ranked.join(deltas, ["seed", "rk"], "left")
            .select(
                "seed", "id", "rk", "v",
                F.coalesce("d", F.lit(0.0)).alias("d"),
            )
            .withColumn("cut", F.sum("d").over(w_cum))
            .withColumn("volp", F.sum("v").over(w_cum))
        )
        n = g.number_of_nodes()
        denom = F.least(F.col("volp"), F.lit(total_volume) - F.col("volp"))
        cond = F.when(denom > 0, F.col("cut") / denom).otherwise(
            F.lit(float("nan"))
        )
        sweep = sweep.withColumn("cond", cond).where(F.col("rk") < n)
        sweep = mat.cut(10_001, sweep)
        # the reference scans in rank order keeping strict improvements:
        # best index = the EARLIEST rank achieving the minimum
        best = (
            sweep.where(~F.isnan("cond"))
            .groupBy("seed")
            .agg(
                F.min_by(
                    F.struct(F.col("rk").alias("rk")),
                    F.struct(F.col("cond").alias("c"), F.col("rk").alias("r")),
                ).alias("b")
            )
            .select("seed", F.col("b.rk").alias("best_rk"))
        )
        self._communities = (
            ranked.join(best, "seed")
            .where(F.col("rk") <= F.col("best_rk"))
            .select("seed", "id")
            .localCheckpoint()
        )
        adj.unpersist()

    # ------------------------------------------------------- accessors
    def get_communities(self) -> DataFrame:
        """``(seed, id)`` — one row per member of each seed's best
        sweep community (``PageRankNibble::run``); seeds with no
        finite-conductance prefix have no rows (empty set)."""
        self.assure_finished()
        return self._communities

    def expand_seed(self, seed: int) -> list[int]:
        """``PageRankNibble::expandSeed`` — member list for one seed."""
        self.assure_finished()
        return sorted(
            r["id"]
            for r in self._communities.where(F.col("seed") == seed).collect()
        )

    def get_ppr(self) -> DataFrame:
        """``(seed, id, p, r)`` — the converged approximate PPR state
        (``ApproximatePageRank::run``); every r < ε·vol."""
        self.assure_finished()
        return self._ppr
