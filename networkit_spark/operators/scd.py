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


class GCE(Algorithm):
    """Greedy Community Expansion (``cpp/scd/GCE.cpp:44-285``,
    ``include/networkit/scd/GCE.hpp``): per seed, grow a community one
    node at a time, always adding the shell node with the best quality
    delta, until no shell node improves (``dQ >= 0`` qualifies, exactly
    like the reference's ``dQ >= dQMax`` scan seeded with ``dQMax =
    0.0``). Objectives:

    - ``"M"``: Q = intW / extW; the incremental ``currentQ`` the
      reference accumulates equals intW/extW of the current community
      (deltas telescope), so Q is computed closed-form per round.
    - ``"L"``: Q = 2·intW·|boundary| / (|C|·extW) with the boundary
      bookkeeping of ``GCE.cpp:147-183`` re-expressed as closed-form
      counts: bdiff(v) = [degExt(v) > 0] − #{u ∈ N(v)∩C :
      extNbrs(u) == 1}.

    Spark shape: ALL seeds expand in one shared round — membership is a
    small ``(seed, id)`` frame broadcast against the symmetric
    adjacency; degInt/degExt/intW/extW/boundary are join-aggregates;
    the per-seed argmax is a ``max_by`` hash aggregation. One node joins
    each active seed per round, so rounds = the largest community size
    — the same O(result-size) driver-loop budget as GroupDegree, fine
    for the small local communities SCD produces.

    Documented divergence: the reference scans an ``unordered_map`` and
    keeps the LAST maximum (nondeterministic tie order); here ties break
    to the smallest node id, deterministically across partitionings.
    Graphs with self-loops raise like the reference ctor (``GCE.cpp:40``).
    """

    def __init__(
        self,
        graph: Graph,
        seeds: list[int],
        objective: str = "M",
        max_rounds: int = 1000,
    ) -> None:
        if objective not in ("M", "L"):
            raise ValueError("unknown objective function (use 'M' or 'L')")
        if not seeds:
            raise ValueError("at least one seed required")
        super().__init__(graph)
        self.seeds = [int(s) for s in seeds]
        self.objective = objective
        self.max_rounds = max_rounds
        self._communities: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        if g.edges.where(F.col("src") == F.col("dst")).limit(1).count():
            raise RuntimeError("Graphs with self-loops are not supported in GCE")
        mat = Materializer()
        adj = (
            (g.edges if g.directed else g.symmetrized())
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("w"))
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        adj = adj.repartition(shuffle_parts, "dst").persist()
        wdeg = adj.groupBy(F.col("src").alias("id")).agg(
            F.sum("w").alias("wdeg"), F.count("*").alias("nbrs")
        )
        wdeg = mat.cut(0, wdeg)

        memb = spark.createDataFrame(
            [(s, s) for s in self.seeds], "seed long, id long"
        )
        memb = mat.cut(1, memb)

        for rnd in range(2, self.max_rounds + 2):
            # every (seed, src) touching the community from either side
            touch = adj.join(
                F.broadcast(memb.withColumnRenamed("id", "dst")), "dst"
            )
            inside = memb.withColumnRenamed("id", "src").withColumn(
                "is_in", F.lit(True)
            )
            touch = touch.join(F.broadcast(inside), ["seed", "src"], "left")
            touch = mat.cut(rnd, touch.select(
                "seed", "src", "w", F.coalesce("is_in", F.lit(False)).alias("is_in")
            ))

            # community scalars: internal edges appear twice in the
            # symmetric view, boundary edges once (from the outside end)
            scal = touch.groupBy("seed").agg(
                (F.sum(F.when(F.col("is_in"), F.col("w"))) / 2.0).alias("intW"),
                F.sum(F.when(~F.col("is_in"), F.col("w"))).alias("extW"),
            ).select(
                "seed",
                F.coalesce("intW", F.lit(0.0)).alias("intW"),
                F.coalesce("extW", F.lit(0.0)).alias("extW"),
            )
            cand = (
                touch.where(~F.col("is_in"))
                .groupBy("seed", F.col("src").alias("id"))
                .agg(F.sum("w").alias("degInt"))
                .join(wdeg, "id")
                .select(
                    "seed", "id", "degInt",
                    (F.col("wdeg") - F.col("degInt")).alias("degExt"),
                )
            )
            # ANSI mode: every division sits behind a den>0 guard. A zero
            # denominator means "adding v closes the component" — the
            # reference's double math yields +inf there (node added), or
            # 0/0 = NaN for L (NaN >= dQMax is FALSE in C++ → node NOT
            # added; Spark orders NaN above all doubles, so we encode the
            # disqualified case as -1.0 instead).
            if self.objective == "M":
                num = F.col("intW") + F.col("degInt")
                den = F.col("extW") - F.col("degInt") + F.col("degExt")
                q = F.when(F.col("extW") > 0, F.col("intW") / F.col("extW")).otherwise(F.lit(0.0))
                dq = (
                    F.when(den > 0, num / den - q)
                    .when(num > 0, F.lit(float("inf")))
                    .otherwise(F.lit(-1.0))
                )
                scored = cand.join(F.broadcast(scal), "seed").select(
                    "seed", "id", dq.alias("dq")
                )
            else:
                comm_stats = self._l_stats(memb, adj, wdeg, cand)
                num = (
                    2.0 * (F.col("intW") + F.col("degInt"))
                    * (
                        F.col("bsize")
                        + F.when(F.col("degExt") > 0, 1).otherwise(0)
                        - F.coalesce("nbn", F.lit(0))
                    ).cast("double")
                )
                den = (F.col("csize") + 1).cast("double") * (
                    F.col("extW") - F.col("degInt") + F.col("degExt")
                )
                q = F.when(
                    F.col("extW") > 0,
                    2.0 * F.col("intW") * F.col("bsize")
                    / (F.col("csize").cast("double") * F.col("extW")),
                ).otherwise(F.lit(0.0))
                dq = (
                    F.when(den > 0, num / den - q)
                    .when(num > 0, F.lit(float("inf")))
                    .otherwise(F.lit(-1.0))
                )
                scored = (
                    cand.join(F.broadcast(scal), "seed")
                    .join(F.broadcast(comm_stats["per_seed"]), "seed")
                    .join(comm_stats["nbn"], ["seed", "id"], "left")
                    .select("seed", "id", dq.alias("dq"))
                )
            picks = (
                scored.where(F.col("dq") >= 0.0)
                .groupBy("seed")
                .agg(
                    F.max_by(
                        F.struct(F.col("id").alias("id")),
                        F.struct(F.col("dq").alias("q"), (-F.col("id")).alias("t")),
                    ).alias("b")
                )
                .select("seed", F.col("b.id").alias("id"))
            )
            picks = picks.localCheckpoint()
            if picks.limit(1).count() == 0:
                break
            memb = mat.cut(rnd, memb.unionAll(picks))
        else:
            adj.unpersist()
            raise RuntimeError(
                f"GCE did not stall in {self.max_rounds} rounds — "
                "raise max_rounds"
            )
        adj.unpersist()
        self._communities = memb

    @staticmethod
    def _l_stats(memb, adj, wdeg, cand):
        """Boundary statistics for objective L: per seed the community
        size and boundary size; per candidate the count of community
        neighbors with exactly one external neighbor (``GCE.cpp:163-183``
        ``numBoundaryNeighbors`` closed-form)."""
        # external-neighbor COUNT per community node
        comm_src = memb.withColumnRenamed("id", "src")
        out_edges = adj.join(F.broadcast(comm_src), "src").join(
            F.broadcast(
                memb.select("seed", F.col("id").alias("dst")).withColumn(
                    "dst_in", F.lit(True)
                )
            ),
            ["seed", "dst"],
            "left",
        )
        ext_cnt = (
            out_edges.where(F.col("dst_in").isNull())
            .groupBy("seed", "src")
            .agg(F.count("*").alias("ext_nbrs"))
        )
        per_seed = (
            memb.groupBy("seed")
            .agg(F.count("*").alias("csize"))
            .join(
                ext_cnt.groupBy("seed").agg(F.count("*").alias("bsize")),
                "seed",
                "left",
            )
            .select(
                "seed", "csize", F.coalesce("bsize", F.lit(0)).alias("bsize")
            )
        )
        # candidate v: # community neighbors u with ext_nbrs(u) == 1
        lasts = ext_cnt.where(F.col("ext_nbrs") == 1).select(
            "seed", F.col("src").alias("dst")
        )
        nbn = (
            adj.join(F.broadcast(lasts), "dst")
            .join(
                cand.select("seed", F.col("id").alias("src")),
                ["seed", "src"],
            )
            .groupBy("seed", F.col("src").alias("id"))
            .agg(F.count("*").alias("nbn"))
        )
        return {"per_seed": per_seed, "nbn": nbn}

    # ------------------------------------------------------- accessors
    def get_communities(self) -> DataFrame:
        """``(seed, id)`` — one row per member of each seed's expanded
        community (``GCE::run`` over the seed set)."""
        self.assure_finished()
        return self._communities

    def expand_seed(self, seed: int) -> list[int]:
        """``GCE::expandSeed`` — sorted member list for one seed."""
        self.assure_finished()
        return sorted(
            r["id"]
            for r in self._communities.where(F.col("seed") == seed).collect()
        )
