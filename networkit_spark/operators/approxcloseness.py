"""ApproxCloseness — sampling + pivoting closeness estimation.

Reference: ``cpp/centrality/ApproxCloseness.cpp:66-117,287-367`` (the
undirected estimator of Cohen, Delling, Pajor, Werneck, "Computing
classic closeness centrality, at scale", COSN 2014 — public paper):
sample k pivots, run one SSSP per pivot, and estimate every node's
farness as ``HSum + HCSum + LCSum/p`` where the per-(sample, node)
distances split into an exactly-summed close set (LC), an exactly
summed far set (HC), and a binned tail estimate (HSum/HNum) taken from
the node's closest pivot.

Spark re-expression — the reference's sequential scans collapse into
closed forms over ONE batched k-source distance frame ``(s, id, d)``:

- k-source SSSP: one relaxation loop keyed by ``(s, id)`` — rounds =
  shortest-path hop length, the frontier carries all samples at once
  (same shape as ``APSP``; weights honored, so BFS and Dijkstra are the
  same loop here).
- closest pivot: ``min(struct(d, s))`` per node (ties → smallest
  sample id; the reference's multi-source Dijkstra settles ties in
  priority-queue order, which is nondeterministic — documented
  divergence).
- LC/HC split per (s, u) row, closed form: LC iff ``ε == 0`` or
  ``d(s,u) ≤ δ(u)·(1/ε − 1)`` or ``d(s, pivot(u)) ≤ δ(u)/ε``; HC
  otherwise. The reference evaluates exactly this predicate through an
  online deferred-list scan (``runOnPivot``, ``ApproxCloseness.cpp:
  309-333``) but silently DROPS a pair from both sums when the pivot
  was scanned before the node and lies farther than ``δ/ε`` (the
  push to an already-flushed list) — a scan-order artifact; here the
  pair is classified HC symmetrically. Documented divergence.
- HSum/HNum tail: per sample, ``Σ d(s,v)`` / count over non-sampled v
  with ``d(s,v) > δ(u)/ε`` — the reference's threshold bins +
  reverse tail scan equal an ordered cumulative sum, so both come from
  one window over per-distance aggregates unioned with the threshold
  markers (strict inequality ⇒ marker rows sort AFTER equal distance
  values). Per-sample partitions hold one row per distinct distance
  value plus one per pivot-assigned node — bounded for hop distances,
  and never wider than the SSSP state this estimator already pays for.

Directed graphs raise: the reference's directed variant
(``computeClosenessForDirected*``, ``ApproxCloseness.cpp:128-265``)
prunes each scan by a mutable cross-iteration visit counter in
``forNodesInRandomOrder`` order — an inherently sequential async
artifact with no order-free result contract to re-express.

The input must be connected (``ApproxCloseness.hpp:32``) — verified,
raises RuntimeError otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Centrality
from networkit_spark.operators.dedup import portable_hash32
from networkit_spark.plans.iterate import Materializer


class ApproxCloseness(Centrality):
    def __init__(
        self,
        graph: Graph,
        n_samples: int,
        epsilon: float = 0.1,
        normalized: bool = False,
        seed: int = 0,
        max_rounds: int = 10_000,
    ) -> None:
        if graph.directed:
            raise ValueError(
                "ApproxCloseness here supports undirected graphs only — the "
                "reference's directed path is a sequential pruned scan with "
                "no order-free contract (see module docstring)"
            )
        if n_samples <= 0:
            raise ValueError("n_samples must be positive")
        if epsilon < 0:
            raise ValueError("epsilon must be >= 0")
        super().__init__(graph)
        self.normalized = normalized
        self.n_samples = int(n_samples)
        self.epsilon = float(epsilon)
        self.seed = int(seed)
        self.max_rounds = max_rounds
        self._sqerr: DataFrame | None = None

    def _sample_nodes(self) -> list[int]:
        """k distinct seeded samples — md5-ordered node ids (the
        reference draws uniformly without replacement,
        ``ApproxCloseness.cpp:70-77``; a hash order is the
        partitioning-independent analog)."""
        rows = (
            self.graph.vertices.select(
                "id", portable_hash32(F.col("id").cast("string"),
                                      f"acl{self.seed}").alias("h")
            )
            .orderBy("h", "id")
            .limit(self.n_samples)
            .collect()
        )
        if len(rows) < self.n_samples:
            raise ValueError("n_samples exceeds the number of nodes")
        return [r["id"] for r in rows]

    def _multi_source_distances(self, samples: list[int]) -> DataFrame:
        """Batched k-source weighted SSSP: ``(s, id, d)`` for every
        reached pair — one relaxation join per hop level, all samples
        in the same frontier."""
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        if g.edges.where(F.col("weight") < 0).limit(1).count():
            raise ValueError("ApproxCloseness requires non-negative weights")
        adj = (
            g.symmetrized()
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.min("weight").alias("w"))
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        adj = adj.repartition(shuffle_parts, "src").persist()
        state = spark.createDataFrame(
            [(s, s, 0.0) for s in samples], "s long, id long, d double"
        )
        state = mat.cut(0, state.withColumn("improved", F.lit(True)))
        for rnd in range(1, self.max_rounds + 1):
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
                    (
                        F.col("d").isNull()
                        | (F.col("cand") < F.col("d"))
                    ).alias("improved"),
                )
            )
            state = mat.cut(rnd, merged)
        else:
            adj.unpersist()
            raise RuntimeError(
                f"k-source SSSP did not settle in {self.max_rounds} rounds"
            )
        adj.unpersist()
        return state.select("s", "id", "d")

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        n = g.number_of_nodes()
        k, eps = self.n_samples, self.epsilon
        samples = self._sample_nodes()
        samp_df = spark.createDataFrame([(s,) for s in samples], "id long")

        dist = mat.cut(100, self._multi_source_distances(samples))
        reached = dist.count()
        if reached != k * n:
            raise RuntimeError(
                "ApproxCloseness requires a connected graph "
                f"(reached {reached} of {k * n} sample-node pairs)"
            )

        # exact farness of the sampled nodes (runOnPivot's scoreData
        # accumulation over the full order)
        samp_far = dist.groupBy(F.col("s").alias("id")).agg(
            F.sum("d").alias("farness")
        )

        # closest pivot per node: delta = min d, pivot = argmin (tie →
        # smallest sample id)
        piv = (
            dist.groupBy("id")
            .agg(F.min(F.struct(F.col("d").alias("d"), F.col("s").alias("s"))).alias("p"))
            .select("id", F.col("p.d").alias("delta"), F.col("p.s").alias("pivot"))
        )
        piv = mat.cut(101, piv)

        # per-(sample, node) classification rows for NON-sampled nodes
        ss = dist.join(
            samp_df.withColumnRenamed("id", "sid"),
            dist.id == F.col("sid"),
        ).select(F.col("s"), F.col("sid").alias("pivot"), F.col("d").alias("dsp"))
        rows = (
            dist.join(samp_df.withColumn("is_s", F.lit(True)), "id", "left")
            .where(F.col("is_s").isNull())
            .join(piv, "id")
            .join(F.broadcast(ss), ["s", "pivot"])
        )
        if eps == 0.0:
            is_lc = F.lit(True)
        else:
            is_lc = (
                (F.col("d") <= F.col("delta") * (1.0 / eps - 1.0))
                | (F.col("dsp") <= F.col("delta") / eps)
            )
        per_node = rows.groupBy("id").agg(
            F.sum(F.when(is_lc, F.col("d"))).alias("LCSum"),
            F.count(F.when(is_lc, F.lit(1))).alias("LCNum"),
            F.sum(F.when(is_lc, F.col("d") * F.col("d"))).alias("LCSumSQ"),
            F.sum(F.when(~is_lc, F.col("d"))).alias("HCSum"),
            F.sum(
                F.when(~is_lc, (F.col("d") - F.col("dsp")) ** 2)
            ).alias("HCSumSQErr"),
        )
        per_node = mat.cut(102, per_node)

        # tail estimate HSum/HNum: per sample s, Σ/# of d(s, v) over
        # non-sampled v with d STRICTLY above the node's delta/eps
        if eps > 0.0:
            nonsamp = dist.join(
                samp_df.withColumn("is_s", F.lit(True)), "id", "left"
            ).where(F.col("is_s").isNull())
            bins = nonsamp.groupBy("s", F.col("d").alias("val")).agg(
                F.sum("d").alias("sd"), F.count("*").alias("cnt")
            )
            totals = bins.groupBy("s").agg(
                F.sum("sd").alias("tot_sd"), F.sum("cnt").alias("tot_cnt")
            )
            thr = (
                piv.join(samp_df.withColumn("is_s", F.lit(True)), "id", "left")
                .where(F.col("is_s").isNull())
                .select(
                    F.col("pivot").alias("s"),
                    (F.col("delta") / eps).alias("val"),
                    F.col("id").alias("u"),
                )
            )
            merged = bins.select(
                "s", "val", "sd", "cnt",
                F.lit(None).cast("long").alias("u"), F.lit(0).alias("flag"),
            ).unionAll(
                thr.select(
                    "s", "val", F.lit(0.0).alias("sd"),
                    F.lit(0).cast("long").alias("cnt"), "u",
                    F.lit(1).alias("flag"),
                )
            )
            w_cum = (
                Window.partitionBy("s")
                .orderBy(F.asc("val"), F.asc("flag"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            tails = (
                merged.withColumn("cum_sd", F.sum("sd").over(w_cum))
                .withColumn("cum_cnt", F.sum("cnt").over(w_cum))
                .where(F.col("flag") == 1)
                .join(F.broadcast(totals), "s")
                .select(
                    F.col("u").alias("id"),
                    (F.col("tot_sd") - F.col("cum_sd")).alias("HSum"),
                    (F.col("tot_cnt") - F.col("cum_cnt")).alias("HNum"),
                )
            )
        else:
            tails = piv.select(
                "id", F.lit(0.0).alias("HSum"), F.lit(0).cast("long").alias("HNum")
            )

        est = (
            per_node.join(tails, "id", "left")
            .select(
                "id",
                F.coalesce("LCSum", F.lit(0.0)).alias("LCSum"),
                F.col("LCNum"),
                F.coalesce("LCSumSQ", F.lit(0.0)).alias("LCSumSQ"),
                F.coalesce("HCSum", F.lit(0.0)).alias("HCSum"),
                F.coalesce("HCSumSQErr", F.lit(0.0)).alias("HCSumSQErr"),
                F.coalesce("HSum", F.lit(0.0)).alias("HSum"),
                F.coalesce("HNum", F.lit(0)).alias("HNum"),
            )
            .withColumn(
                "LNum",
                F.lit(n - 1) - F.col("HNum") - F.lit(k) + F.col("LCNum"),
            )
        )
        lc_term = F.when(
            (F.col("LCNum") > 0) & (F.col("LNum") > 0),
            F.col("LCSum") * F.col("LNum").cast("double") / F.col("LCNum"),
        ).otherwise(F.lit(0.0))  # LCSum/p with p = LCNum/LNum
        farness = F.col("HSum") + F.col("HCSum") + lc_term
        hc_num = F.lit(k) - F.col("LCNum")
        lc_sq_avg = F.when(
            F.col("LCNum") > 0, (F.col("LCSum") / F.col("LCNum")) ** 2
        ).otherwise(F.lit(0.0))
        sqerr = F.when(
            F.col("LCNum") > 0,
            (F.col("LCSumSQ") / F.col("LCNum") - lc_sq_avg)
            * F.col("LNum").cast("double") / F.col("LCNum"),
        ).otherwise(F.lit(0.0)) + F.when(
            hc_num > 0,
            F.col("HCSumSQErr") / hc_num.cast("double")
            * F.col("HNum").cast("double"),
        ).otherwise(F.lit(0.0))

        norm_num = float(n - 1) if self.normalized else 1.0
        inv = lambda far: F.when(  # noqa: E731
            far > 0, F.lit(norm_num) / far
        ).otherwise(F.lit(0.0))

        est_scores = est.select(
            "id", inv(farness).alias("score"), sqerr.alias("sqerr")
        )
        samp_scores = samp_far.select(
            "id", inv(F.col("farness")).alias("score"),
            F.lit(0.0).alias("sqerr"),
        )
        out = mat.cut(103, est_scores.unionAll(samp_scores))
        self._scores = out.select("id", "score")
        self._sqerr = out.select("id", "sqerr")

    def get_square_error_estimates(self) -> DataFrame:
        """``ApproxCloseness::getSquareErrorEstimates`` — ``(id,
        sqerr)``; 0.0 for sampled nodes."""
        self.assure_finished()
        return self._sqerr
