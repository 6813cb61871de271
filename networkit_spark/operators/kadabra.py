"""KADABRA — adaptive ε-guarantee betweenness via random path sampling.

Reference: ``KadabraBetweenness``
(``include/networkit/centrality/KadabraBetweenness.hpp:81-125``,
``cpp/centrality/KadabraBetweenness.cpp:51-420``), implementing Borassi
& Natale (2016), "KADABRA is an ADaptive Algorithm for Betweenness via
Random Approximation" (public paper; parallel variant van der Grinten,
Angriman & Meyerhenke 2019, arXiv:1903.09422). Absolute (k = 0) mode:
sample uniform node pairs (s, t), walk ONE uniformly random shortest
s→t path, count interior visits; stop once every vertex's betweenness
estimate ``b̃(v) = apx(v)/τ`` is within ± ``err`` of the truth with
probability ≥ 1 − ``delta``.

Matched reference arithmetic:

- ``ω = 0.5/err² · (log₂(D−1) + 1 + ln(0.5/δ))``
  (``KadabraBetweenness.cpp:332-333``; D = diameter upper bound) —
  the worst-case sample budget and unconditional stop;
- the per-vertex stopping bounds are the paper's f/g Chernoff forms
  (``computeF``/``computeG``, ``KadabraBetweenness.cpp:98-117``):
  with ``x = ω/τ ∓ 1/3`` and ``L = ln(1/δ_v)``,
  ``f = min(b̃, L/τ·(−x + √(x² + 2·b̃·ω/L)))`` and
  ``g = min(1−b̃, L/τ·(x + √(x² + 2·b̃·ω/L)))``; finished ⇔
  ``f < err ∧ g < err`` for every vertex.

Documented simplification: the reference's ``computeDeltaGuess``
re-balances per-vertex failure budgets δ_v after a pilot phase to
sharpen constants; this engine uses the uniform union bound
``δ_v = δ/(2n)`` for every vertex, which keeps the same (ε, δ)
guarantee at a somewhat larger sample count.

Spark plan — one epoch = one batch of pairs, all advanced together:

1. pairs drawn by seeded xxhash64 over (epoch, i) against a one-time
   dense vertex index;
2. forward: batched multi-source BFS with path counts σ (the same
   state shape as ApproxBetweenness), stopping as soon as every
   pair's target is settled or frontiers die;
3. backward: from each settled target, one predecessor per level
   sampled ∝ σ(pred) by the exponential race (P(argmin -ln(u)/σ_p) =
   σ_p/Σσ — exactly one uniformly random shortest path per pair);
4. interior visits fold into the running ``apx`` frame; the f/g
   bounds are evaluated as one column expression + max aggregate.

Epoch batch sizes grow geometrically (``baseItersPerStep`` · 1.33^e,
the EUROPAR'19 schedule), so the number of epochs — and thus of
O(diameter)-round phases — is logarithmic in the final sample count.
Everything is vertex-keyed join-agg; the only driver values are the
1-row convergence scalars.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer, local_cut

_U64 = float(1 << 64)


def _u01(*cols, seed: int) -> F.Column:
    h = F.xxhash64(F.lit(seed), *cols)
    return (h.cast("double") + F.lit(2.0**63) + F.lit(1.0)) / F.lit(_U64)


class KadabraBetweenness(Algorithm):
    def __init__(
        self,
        graph: Graph,
        err: float = 0.01,
        delta: float = 0.1,
        seed: int = 42,
        base_iters_per_step: int = 1000,
        iters_per_step_exp: float = 1.33,
        max_epochs: int = 30,
        diameter_hint: int | None = None,
    ) -> None:
        if not (0 < err < 1) or not (0 < delta < 1):
            raise ValueError("err and delta must be in (0, 1)")
        super().__init__(graph)
        self.err = float(err)
        self.delta = float(delta)
        self.seed = seed
        self.base_iters_per_step = base_iters_per_step
        self.iters_per_step_exp = iters_per_step_exp
        self.max_epochs = max_epochs
        self.diameter_hint = diameter_hint
        self._scores: DataFrame | None = None
        self._n_pairs = 0
        self._omega = 0.0

    # ------------------------------------------------------------- run
    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        nbrs = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        nbrs = nbrs.repartition(shuffle_parts, "src").persist()
        n = g.number_of_nodes()
        if n < 3:
            self._scores = g.vertices.select("id", F.lit(0.0).alias("score"))
            nbrs.unpersist()
            return

        # diameter upper bound for omega (KadabraBetweenness.cpp:329-333)
        if self.diameter_hint is not None:
            diam_ub = self.diameter_hint
        else:
            from networkit_spark.operators.distance import Diameter

            diam_ub = Diameter(g, algo="estimate").run().get_diameter()[1]
        diam_ub = max(int(diam_ub), 3)
        omega = (
            0.5
            / (self.err * self.err)
            * (math.log2(diam_ub - 1) + 1 + math.log(0.5 / self.delta))
        )
        self._omega = omega
        # uniform per-vertex failure budget (see module doc)
        log_inv_delta_v = math.log(2.0 * n / self.delta)

        # one-time dense index for uniform pair draws
        idx = g.vertices.select(
            "id",
            (F.row_number().over(Window.orderBy("id")) - 1).alias("ix"),
        ).transform(local_cut)

        apx: DataFrame | None = None  # (id, cnt)
        n_pairs = 0
        epoch = 0
        while epoch < self.max_epochs and n_pairs < omega:
            batch = max(
                1,
                int(
                    self.base_iters_per_step
                    * (self.iters_per_step_exp ** epoch)
                ),
            )
            batch = min(batch, int(omega - n_pairs) + 1)
            picks = self._sample_paths(spark, nbrs, idx, n, epoch, batch, mat)
            n_pairs += batch
            if picks is not None:
                inc = picks.groupBy("id").agg(F.count(F.lit(1)).alias("c"))
                if apx is None:
                    apx = inc
                else:
                    apx = (
                        apx.unionAll(inc)
                        .groupBy("id")
                        .agg(F.sum("c").alias("c"))
                    )
                apx = mat.cut(9000 + epoch, apx)
            # ---- stopping rule: max over vertices of f and g
            if apx is not None:
                bet = F.col("c").cast("double") / F.lit(float(n_pairs))
                x_f = F.lit(omega / n_pairs - 1.0 / 3.0)
                x_g = F.lit(omega / n_pairs + 1.0 / 3.0)
                ll = F.lit(log_inv_delta_v)
                root = F.sqrt(
                    F.lit((omega / n_pairs - 1.0 / 3.0) ** 2)
                    + F.lit(2.0) * bet * F.lit(omega) / ll
                )
                root_g = F.sqrt(
                    F.lit((omega / n_pairs + 1.0 / 3.0) ** 2)
                    + F.lit(2.0) * bet * F.lit(omega) / ll
                )
                f_b = F.least(bet, ll / n_pairs * (-x_f + root))
                g_b = F.least(F.lit(1.0) - bet, ll / n_pairs * (x_g + root_g))
                row = apx.agg(
                    F.max(f_b).alias("mf"), F.max(g_b).alias("mg")
                ).collect()[0]
                # untouched vertices share one bound: b̃ = 0
                g_zero = (
                    log_inv_delta_v
                    / n_pairs
                    * 2.0
                    * (omega / n_pairs + 1.0 / 3.0)
                )
                if (
                    max(row["mf"] or 0.0, 0.0) < self.err
                    and max(row["mg"] or 0.0, g_zero) < self.err
                ):
                    epoch += 1
                    break
            epoch += 1

        self._n_pairs = n_pairs
        if apx is None:
            self._scores = g.vertices.select("id", F.lit(0.0).alias("score"))
        else:
            self._scores = g.vertices.join(apx, "id", "left").select(
                "id",
                (
                    F.coalesce(F.col("c").cast("double"), F.lit(0.0))
                    / F.lit(float(n_pairs))
                ).alias("score"),
            )
        nbrs.unpersist()

    # --------------------------------------------- one epoch of pairs
    def _sample_paths(
        self, spark, nbrs, idx, n, epoch, batch, mat
    ) -> DataFrame | None:
        """Sample ``batch`` uniform pairs and return the interior nodes
        of one uniformly random shortest path per connected pair, as a
        ``(pair, id)`` DataFrame (None if no pair produced a path)."""
        base = 20_000 + epoch * 200
        pair_ids = spark.range(batch).select(F.col("id").alias("pair"))
        s_ix = (
            F.pmod(F.xxhash64(F.lit(self.seed), F.lit(epoch), F.col("pair")), F.lit(n))
        ).alias("six")
        t_raw = F.pmod(
            F.xxhash64(F.lit(self.seed + 1), F.lit(epoch), F.col("pair")),
            F.lit(n - 1),
        )
        # t drawn from the n-1 non-s indices: shift past s (uniform s≠t)
        pairs = pair_ids.select(
            "pair", s_ix, t_raw.alias("traw")
        ).select(
            "pair", "six",
            F.when(F.col("traw") >= F.col("six"), F.col("traw") + 1)
            .otherwise(F.col("traw"))
            .alias("tix"),
        )
        sd = idx.select(F.col("ix").alias("six"), F.col("id").alias("s"))
        td = idx.select(F.col("ix").alias("tix"), F.col("id").alias("t"))
        pairs = pairs.join(sd, "six").join(td, "tix").select("pair", "s", "t")
        pairs = mat.cut(base, pairs)

        # ---- forward batched BFS with σ from the distinct sources
        sources = pairs.select(F.col("s").alias("source")).distinct()
        layer = sources.select(
            "source", F.col("source").alias("id"),
            F.lit(0).alias("dist"), F.lit(1.0).alias("sigma"),
        )
        layer = mat.cut(base + 1, layer)
        visited = layer
        layers = [layer]
        # targets still unsettled, keyed by source
        open_t = pairs.select("pair", F.col("s").alias("source"), "t")
        settled = None  # (pair, source, t, dist)
        d = 0
        while True:
            hit = open_t.join(
                layer.select("source", F.col("id").alias("t"), "dist"),
                ["source", "t"],
            ).select("pair", "source", "t", "dist")
            hit = mat.cut(base + 2 + d * 3, hit)
            if hit.limit(1).count() > 0:
                settled = hit if settled is None else settled.unionAll(hit)
                settled = local_cut(settled)
                open_t = local_cut(
                    open_t.join(hit.select("pair"), "pair", "left_anti")
                )
            if open_t.limit(1).count() == 0:
                break
            d += 1
            gathered = (
                nbrs.join(layer.hint("shuffle_hash"), nbrs.src == layer.id)
                .groupBy("source", F.col("dst").alias("nid"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            nxt = (
                gathered.join(
                    visited.select("source", F.col("id").alias("nid")),
                    ["source", "nid"],
                    "left_anti",
                )
                .select(
                    "source", F.col("nid").alias("id"),
                    F.lit(d).alias("dist"), "sigma",
                )
            )
            nxt = mat.cut(base + 3 + d * 3, nxt)
            if nxt.limit(1).count() == 0:
                break  # remaining targets unreachable
            layers.append(nxt)
            visited = mat.cut(base + 4 + d * 3, visited.unionAll(nxt))
            layer = nxt
        if settled is None:
            return None

        # ---- backward: sample predecessors ∝ σ, level by level
        max_d_row = settled.agg(F.max("dist").alias("m")).collect()[0]
        max_d = int(max_d_row["m"] or 0)
        if max_d < 2:
            return None  # adjacent or identical pairs have no interior
        cur = settled.select("pair", "source", F.col("t").alias("id"), "dist")
        interior = None
        for lev in range(max_d, 1, -1):
            at = cur.where(F.col("dist") == lev)
            below = layers[lev - 1].select(
                "source", F.col("id").alias("pred"),
                F.col("sigma").alias("sigma_p"),
            )
            preds = (
                nbrs.select(F.col("src").alias("pred"), F.col("dst").alias("id"))
                .join(at.hint("shuffle_hash"), "id")
                .join(below, ["source", "pred"])
            )
            u = _u01(
                F.col("pair"), F.lit(lev), F.col("pred"),
                seed=self.seed + 2 + epoch,
            )
            pick = (
                preds.select(
                    "pair", "source",
                    (-F.log(u) / F.col("sigma_p")).alias("race"), "pred",
                )
                .groupBy("pair", "source")
                .agg(F.min_by("pred", "race").alias("id"))
                .select("pair", "source", "id", F.lit(lev - 1).alias("dist"))
            )
            pick = mat.cut(base + 100 + lev, pick)
            keep = cur.where(F.col("dist") != lev)
            cur = pick.unionAll(keep.select("pair", "source", "id", "dist"))
            inode = pick.select("pair", "id")  # dist lev-1 ≥ 1 ⇒ interior
            interior = inode if interior is None else interior.unionAll(inode)
        return local_cut(interior) if interior is not None else None

    # ------------------------------------------------------- accessors
    def scores(self) -> DataFrame:
        """``(id, score)`` — b̃(v) = apx(v)/τ, the sampled-pair path
        fraction (the reference's ``bet`` values)."""
        self.assure_finished()
        return self._scores

    def number_of_pairs(self) -> int:
        """τ — total sampled pairs (reference ``getNumberOfIterations``)."""
        self.assure_finished()
        return self._n_pairs

    def get_omega(self) -> float:
        """Worst-case sample budget ω (reference ``getOmega``)."""
        self.assure_finished()
        return self._omega
