"""PageRank — power iteration as DataFrame message passing.

Reference semantics (``cpp/centrality/PageRank.cpp:19-81``), reproduced
exactly — these details are easy to get "textbook-correct" but
reference-wrong:

- init ``1/n`` for every existing node (``PageRank.cpp:30-31``);
- per round, pull over **in**-edges:
  ``pr[u] = damp · Σ_{v∈In(u)} pr[v]·w(v,u)/wdeg_out(v) + (1-damp)/n``
  (``PageRank.cpp:55-64``); undirected graphs pull over the symmetric
  edge view;
- **no dangling redistribution** — mass leaks each round and a single
  final normalization divides by ``Σ pr`` (``PageRank.cpp:74-78``);
- convergence after each round: ``iterations ≥ maxIterations`` OR
  ``norm(new-old) ≤ tol``, with L1 = Σ|Δ|, L2 = √ΣΔ²; at least one round
  always runs; the iteration counter increments before the test
  (``PageRank.cpp:40-53``; norm enum ``PageRank.hpp:65``, default L2;
  Python default tol=1e-9, ``networkit/centrality.pyx:1758``).

Spark plan per round (all JVM-side, no Python in the loop):

    contrib(src, dst, frac)  --join ranks on src-->  (dst, rank·frac)
        ∪ (id, 0, old_rank)  --groupBy(dst).sum-->  damp·Σ + teleport

One exchange per round, no outer join: a zero-contribution row per
vertex keeps isolated/dangling-target vertices in the output, and
carries the old rank through the same aggregation so the convergence
delta is a shuffle-free scan of the materialized round output.

``contrib = weight / wdeg_out(src)`` is precomputed once and persisted,
partitioned by ``src`` so the per-round join shuffles only the small
ranks table. When the vertex set is small enough the ranks side is
broadcast (frontier broadcast per north_star) and the big edge table is
never shuffled at all. Hub ``dst`` skew in the aggregation is absorbed by
map-side partial aggregation; AQE skew-join splitting covers the join
side. Each round's result has its lineage cut (localCheckpoint) or is
durably checkpointed with per-partition lineage + metrics for resume
(north_rule) via :class:`networkit_spark.plans.iterate.CheckpointStore`.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Centrality
from networkit_spark.plans.iterate import CheckpointStore, Materializer, local_cut

#: broadcast the ranks table when the vertex count is below this.
#: A rank row is ~16 B (long id + double), so 1M vertices ≈ 16 MB —
#: under the session's 64 MB broadcast threshold and cheap to ship to
#: every executor once per round. Above it, the rank join runs as a
#: shuffle join in which only the (small) ranks side moves — `contrib`
#: is persisted hash-partitioned on the join key — so the per-round cost
#: parallelizes instead of paying a serial driver collect+rebroadcast of
#: the whole vertex state.
BROADCAST_VERTEX_LIMIT = 1_000_000


class PageRank(Centrality):
    def __init__(
        self,
        graph: Graph,
        damp: float = 0.85,
        tol: float = 1e-9,
        norm: str = "l2",
        max_iterations: int | None = None,
        store: CheckpointStore | None = None,
        broadcast_ranks: bool | None = None,
        unroll: int = 1,
        salt_hubs: int | None = None,
    ) -> None:
        """``salt_hubs=k`` — engage the skew-proof salted iterate layout
        (``plans/skew.py``) with k salts for hub SRC keys (keys above
        ``HUB_PARTITION_SHARE`` average partitions of the contrib
        frame): hub rows spread over k ``(src, salt)`` sub-partitions
        and the per-round state replicates k× for hub keys only, so no
        cached partition — and therefore no per-round task — carries a
        hub's full row mass (AQE cannot split a persisted partition;
        the microbench in BENCH/skew_microbench.md measures a 3.6×
        per-round straggler unsalted, fully recovered salted). Results
        equal the unsalted run up to float summation order. Default
        OFF: the driver-gate graphs carry no qualifying hub and
        bit-exact reproducibility is part of the oracle contract.

        ``unroll`` — power-iteration rounds chained per materialized
        job (default 1 = reference semantics: tolerance tested after
        every round, ``PageRank.cpp:40-53``). With ``unroll=k`` the
        round transformation is applied k times inside one plan before
        the lineage cut — a **chain** of single references, so the
        checkpointed frame is still referenced exactly once (legal under
        the single-reference rule, ``plans/iterate.py``) — and the
        convergence test runs every k rounds. For fixed-iteration runs
        (``tol=0`` and ``max_iterations % k == 0``) the scores are
        bit-identical to ``unroll=1``; only the job count (driver
        round-trips + materializations) drops by ~k×."""
        super().__init__(graph)
        if norm not in ("l1", "l2"):
            raise ValueError("norm must be 'l1' or 'l2'")
        if unroll < 1:
            raise ValueError("unroll must be >= 1")
        self.damp = damp
        self.tol = tol
        self.norm = norm
        self.max_iterations = max_iterations
        self.store = store
        self.broadcast_ranks = broadcast_ranks
        self.unroll = unroll
        if salt_hubs is not None and salt_hubs < 2:
            raise ValueError("salt_hubs must be >= 2 (or None)")
        self.salt_hubs = salt_hubs
        self._iterations = 0

    def number_of_iterations(self) -> int:
        """``PageRank::numberOfIterations`` (``PageRank.hpp:71``)."""
        self.assure_finished()
        return self._iterations

    # ------------------------------------------------------------------
    def _build_contrib(self):
        """(src, dst, frac=weight/wdeg_out(src), is_self) — the message
        matrix, plus one permanent ``frac=0`` self-row per vertex.

        The self-rows make each round a SINGLE reference to the rank
        state (plans/iterate.py): one gather join emits both the
        weighted contributions and — via ``is_self`` — every vertex's
        own previous rank, so (a) isolated/dangling-target vertices
        survive the aggregation without an outer join, and (b) the
        convergence delta is a shuffle-free scan of the materialized
        round output instead of a separate old⋈new join job per round.
        Costs |V| extra static rows on an |E|-row frame (~1% at web
        scale)."""
        g = self.graph
        base = g.edges if g.directed else g.symmetrized()
        degs = g.degrees().select("id", "w_out_deg")
        contrib = (
            base.join(degs, base.src == degs.id)
            .select(
                "src", "dst",
                (F.col("weight") / F.col("w_out_deg")).alias("frac"),
                F.lit(False).alias("is_self"),
            )
        )
        selfs = g.vertices.select(
            F.col("id").alias("src"), F.col("id").alias("dst"),
            F.lit(0.0).alias("frac"), F.lit(True).alias("is_self"),
        )
        return contrib.unionAll(selfs)

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        n = g.number_of_nodes()
        if n == 0:
            self._scores = g.vertices.select("id", F.lit(0.0).alias("score"))
            return
        teleport = (1.0 - self.damp) / n

        contrib = self._build_contrib()
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        hubs = None
        if self.salt_hubs:
            from networkit_spark.plans.skew import (
                hub_keys,
                salted_iterate_layout,
            )

            cand = hub_keys(contrib, "src", shuffle_parts).persist()
            if cand.limit(1).count():
                hubs = cand
            else:
                cand.unpersist()  # no qualifying hub: plain layout
        if hubs is not None:
            # hub rows spread over (src, salt(dst)); the per-round state
            # side replicates hub keys across salts (salted_state below)
            contrib, _, _ = salted_iterate_layout(
                contrib,
                g.vertices.select("id", F.lit(0.0).alias("rank")),
                "src",
                "id",
                hubs,
                salt_from="dst",
                n_salts=self.salt_hubs,
                num_partitions=shuffle_parts,
            )
            contrib = contrib.persist()
        else:
            contrib = contrib.repartition(shuffle_parts, "src").persist()
        vertices = g.vertices

        do_broadcast = (
            self.broadcast_ranks
            if self.broadcast_ranks is not None
            else n <= BROADCAST_VERTEX_LIMIT
        )

        mat = Materializer(self.store)
        start_iter = 0
        ranks = None
        if self.store is not None:
            resumed = self.store.latest(spark)
            if resumed is not None:
                start_iter, ranks = resumed
                if "old_rank" in ranks.columns:
                    ranks = ranks.select("id", "rank")
        if ranks is None:
            ranks = vertices.select("id", F.lit(1.0 / n).alias("rank"))
            ranks = mat.cut(0, ranks, {"phase": "init", "n": n})

        def one_round(r_in, carry_old: bool = False):
            # small vertex state: broadcast below the limit; above it a
            # SHUFFLE_HASH hint on the state side — the default plan is
            # sort-merge, which re-sorts the big (pre-partitioned,
            # persisted) contrib side EVERY round; hash-building the
            # small side streams contrib with no sort (measured ~15%
            # per-round win at 38M edges, and it removes the one
            # O(E log E) step from the round).
            #
            # Single reference to `r_in` per round (the contrib frame's
            # permanent self-rows stand in for the outer join AND the
            # old-rank carry — see _build_contrib), so unrolled chains
            # stay linear in plan size.
            cond = F.col("c.src") == F.col("g.id")
            if do_broadcast:
                # broadcast join: no partitioning requirement on either
                # side, so even with a salted layout the bare key
                # condition is enough (each contrib row matches the one
                # broadcast state row; the layout alone fixed the
                # cached-partition skew)
                gather = F.broadcast(r_in)
            elif hubs is not None:
                from networkit_spark.plans.skew import salted_state

                gather = salted_state(
                    r_in, "id", hubs, "src", self.salt_hubs
                ).hint("shuffle_hash")
                cond = cond & (F.col("c._salt") == F.col("g._salt"))
            else:
                gather = r_in.hint("shuffle_hash")
            aggs = [
                F.sum(F.col("g.rank") * F.col("c.frac")).alias("msum")
            ]
            if carry_old:
                aggs.append(
                    F.sum(
                        F.when(F.col("c.is_self"), F.col("g.rank")).otherwise(0.0)
                    ).alias("old_rank")
                )
            agg = (
                contrib.alias("c")
                .join(gather.alias("g"), cond)
                .groupBy(F.col("c.dst").alias("dst"))
                .agg(*aggs)
            )
            cols = [
                F.col("dst").alias("id"),
                (F.lit(self.damp) * F.col("msum") + F.lit(teleport)).alias("rank"),
            ]
            if carry_old:
                cols.append(F.col("old_rank"))
            return agg.select(*cols)

        it = start_iter
        while True:
            t0 = time.time()
            steps = self.unroll
            if self.max_iterations is not None:
                steps = min(steps, self.max_iterations - it)
            steps = max(steps, 1)
            need_delta = self.tol > 0.0 or self.max_iterations is None
            # the final level of the chunk carries old_rank, so the
            # convergence delta — new vs previous ROUND (reference
            # semantics, sampled at chunk ends when unroll>1) — is a
            # scan-agg over the materialized round output; no separate
            # old⋈new join job per round.
            new_ranks = ranks
            for k in range(steps):
                new_ranks = one_round(
                    new_ranks, carry_old=need_delta and k == steps - 1
                )
                it += 1
            new_ranks = mat.cut(
                it,
                new_ranks,
                {"algo": "pagerank", "norm": self.norm} if self.store else None,
            )
            if need_delta:
                if self.norm == "l1":
                    delta_expr = F.sum(F.abs(F.col("rank") - F.col("old_rank")))
                else:
                    delta_expr = F.sqrt(
                        F.sum(F.pow(F.col("rank") - F.col("old_rank"), 2))
                    )
                delta = new_ranks.agg(delta_expr.alias("d")).collect()[0]["d"] or 0.0
                new_ranks = new_ranks.select("id", "rank")
            else:
                # tol=0 with a fixed iteration budget: the tolerance test
                # can never fire, so skip the delta job — one job per round
                delta = float("inf")
            if os.environ.get("NKS_DEBUG_ITER"):
                print(f"iter {it}: {time.time() - t0:.2f}s delta={delta:.2e}", flush=True)
            if self.store is not None:
                self.store.append_metrics(
                    it,
                    {
                        "algo": "pagerank",
                        "delta": delta,
                        "norm": self.norm,
                        "iter_wall_s": round(time.time() - t0, 4),
                    },
                )
            ranks = new_ranks
            # reference order: increment, then test maxIterations OR tol
            # (PageRank.cpp:40-53)
            if (self.max_iterations is not None and it >= self.max_iterations) or (
                delta <= self.tol
            ):
                break

        self._iterations = it - start_iter
        total = ranks.agg(F.sum("rank").alias("s")).collect()[0]["s"]
        self._scores = ranks.select("id", (F.col("rank") / F.lit(total)).alias("score"))
        contrib.unpersist()
        if hubs is not None:
            hubs.unpersist()


class EigenvectorCentrality(Centrality):
    """Power iteration over in-edges, L2-normalized each round
    (``cpp/centrality/EigenvectorCentrality.cpp:21-66``): same loop
    skeleton as PageRank minus teleport/damping; converges on the L2
    residual of successive normalized vectors."""

    def __init__(
        self,
        graph: Graph,
        tol: float = 1e-9,
        max_iterations: int | None = None,
        unroll: int = 1,
    ) -> None:
        """``unroll=k`` chains k gather rounds per materialized job.
        Power iteration is scale-invariant, so per-round L2 normalization
        (``EigenvectorCentrality.cpp:40-44``) can be deferred to once per
        chunk — the normalized chunk-end vector is identical (up to FP) to
        normalizing every round; un-normalized values grow by λ^k inside a
        chunk, far from double overflow for any realistic spectrum. The
        residual test then runs every k rounds (extra rounds past
        convergence, never early exit)."""
        super().__init__(graph)
        if unroll < 1:
            raise ValueError("unroll must be >= 1")
        self.tol = tol
        self.max_iterations = max_iterations
        self.unroll = unroll
        self._iterations = 0

    def _run(self) -> None:
        g = self.graph
        n = g.number_of_nodes()
        base = g.edges if g.directed else g.symmetrized()
        vertices = g.vertices
        # permanent weight-0 self-rows: single state reference per round
        # + old-rank carry, exactly as in PageRank._build_contrib
        msg = (
            base.select("src", "dst", "weight", F.lit(False).alias("is_self"))
            .unionAll(
                vertices.select(
                    F.col("id").alias("src"), F.col("id").alias("dst"),
                    F.lit(0.0).alias("weight"), F.lit(True).alias("is_self"),
                )
            )
            .persist()
        )
        ranks = local_cut(vertices.select("id", F.lit(1.0 / n).alias("rank")))
        mat = Materializer()

        def one_round(r_in, carry_old: bool = False):
            r = (
                F.broadcast(r_in)
                if n <= BROADCAST_VERTEX_LIMIT
                else r_in.hint("shuffle_hash")
            )
            aggs = [F.sum(F.col("g.rank") * F.col("e.weight")).alias("rank")]
            if carry_old:
                aggs.append(
                    F.sum(
                        F.when(F.col("e.is_self"), F.col("g.rank")).otherwise(0.0)
                    ).alias("old_rank")
                )
            out = (
                msg.alias("e")
                .join(r.alias("g"), F.col("e.src") == F.col("g.id"))
                .groupBy(F.col("e.dst").alias("dst"))
                .agg(*aggs)
            )
            cols = [F.col("dst").alias("id"), "rank"]
            if carry_old:
                cols.append("old_rank")
            return out.select(*cols)

        it = 0
        while True:
            steps = self.unroll
            if self.max_iterations is not None:
                steps = min(steps, self.max_iterations - it)
            steps = max(steps, 1)
            # chain of single references (plans/iterate.py rule). With
            # steps==1 the round carries old_rank (the previous round's
            # NORMALIZED vector — r_in is always normalized), so the L1
            # residual is a scan-agg over the materialized frame. Inside
            # an unrolled chunk intermediate levels are unnormalized
            # (deferred normalization), so the carried value would be on
            # the wrong scale — chunks fall back to the chunk-start join.
            fused = steps == 1
            new_ranks = ranks
            for k in range(steps):
                new_ranks = one_round(new_ranks, carry_old=fused)
                it += 1
            new_ranks = mat.cut(it, new_ranks)
            norm = new_ranks.agg(
                F.sqrt(F.sum(F.pow("rank", 2))).alias("s")
            ).collect()[0]["s"]
            if not norm:
                break
            if fused:
                delta = (
                    new_ranks.agg(
                        F.sum(
                            F.abs(F.col("rank") / F.lit(norm) - F.col("old_rank"))
                        ).alias("d")
                    ).collect()[0]["d"]
                    or 0.0
                )
                normed = new_ranks.select(
                    "id", (F.col("rank") / F.lit(norm)).alias("rank")
                )
            else:
                normed = new_ranks.select(
                    "id", (F.col("rank") / F.lit(norm)).alias("rank")
                )
                delta = (
                    normed.alias("new")
                    .join(ranks.alias("old"), "id")
                    .agg(
                        F.sum(F.abs(F.col("new.rank") - F.col("old.rank"))).alias("d")
                    )
                    .collect()[0]["d"]
                    or 0.0
                )
            # cheap projection over the materialized frame — the next
            # chunk re-reads the cached blocks
            ranks = normed
            if (self.max_iterations is not None and it >= self.max_iterations) or (
                delta <= self.tol
            ):
                break
        self._iterations = it
        self._scores = ranks.select("id", F.col("rank").alias("score"))
        msg.unpersist()


class KatzCentrality(Centrality):
    """``val[u] = Σ_v α·w·(1+score[v]) + β`` iterated to tolerance, then
    L2-normalized (``cpp/centrality/KatzCentrality.cpp:15-77``)."""

    def __init__(
        self,
        graph: Graph,
        alpha: float | None = None,
        beta: float = 0.1,
        tol: float = 1e-8,
        max_iterations: int | None = None,
        unroll: int = 1,
    ) -> None:
        """``unroll=k`` chains k recurrence rounds per materialized job
        (affine map — chaining is exact); the max-|Δ| convergence test
        runs every k rounds (never early exit, only extra rounds)."""
        super().__init__(graph)
        if unroll < 1:
            raise ValueError("unroll must be >= 1")
        self.alpha = alpha
        self.beta = beta
        self.tol = tol
        self.max_iterations = max_iterations
        self.unroll = unroll
        self._iterations = 0

    def _run(self) -> None:
        g = self.graph
        n = g.number_of_nodes()
        base = g.edges if g.directed else g.symmetrized()
        alpha = self.alpha
        if alpha is None:
            # reference default: 1/(1+maxDegree) (KatzCentrality.cpp:20-24)
            maxdeg = (
                g.degrees().agg(F.max("out_deg").alias("m")).collect()[0]["m"] or 0
            )
            alpha = 1.0 / (1.0 + maxdeg)
        vertices = g.vertices
        # permanent weight-0 self-rows (see PageRank._build_contrib):
        # single state reference per round + old-score carry
        msg = (
            base.select("src", "dst", "weight", F.lit(False).alias("is_self"))
            .unionAll(
                vertices.select(
                    F.col("id").alias("src"), F.col("id").alias("dst"),
                    F.lit(0.0).alias("weight"), F.lit(True).alias("is_self"),
                )
            )
            .persist()
        )
        scores = local_cut(vertices.select("id", F.lit(0.0).alias("rank")))
        mat = Materializer()

        def one_round(s_in, carry_old: bool = False):
            r = (
                F.broadcast(s_in)
                if n <= BROADCAST_VERTEX_LIMIT
                else s_in.hint("shuffle_hash")
            )
            aggs = [
                F.sum(
                    (F.lit(1.0) + F.col("g.rank")) * F.col("e.weight")
                ).alias("msum")
            ]
            if carry_old:
                aggs.append(
                    F.sum(
                        F.when(F.col("e.is_self"), F.col("g.rank")).otherwise(0.0)
                    ).alias("old_rank")
                )
            out = (
                msg.alias("e")
                .join(r.alias("g"), F.col("e.src") == F.col("g.id"))
                .groupBy(F.col("e.dst").alias("dst"))
                .agg(*aggs)
            )
            cols = [
                F.col("dst").alias("id"),
                (F.lit(alpha) * F.col("msum") + F.lit(self.beta)).alias("rank"),
            ]
            if carry_old:
                cols.append("old_rank")
            return out.select(*cols)

        it = 0
        prev_delta = None
        while True:
            steps = self.unroll
            if self.max_iterations is not None:
                steps = min(steps, self.max_iterations - it)
            steps = max(steps, 1)
            # max|Δ| vs the previous ROUND: fused scan-agg when steps==1,
            # chunk-start join otherwise (the carried value inside a
            # chunk would compare non-adjacent rounds)
            fused = steps == 1
            new_scores = scores
            for k in range(steps):
                new_scores = one_round(new_scores, carry_old=fused)
                it += 1
            new_scores = mat.cut(it, new_scores)
            if fused:
                delta = (
                    new_scores.agg(
                        F.max(F.abs(F.col("rank") - F.col("old_rank"))).alias("d")
                    ).collect()[0]["d"]
                    or 0.0
                )
                new_scores = new_scores.select("id", "rank")
            else:
                delta = (
                    new_scores.alias("new")
                    .join(scores.alias("old"), "id")
                    .agg(
                        F.max(F.abs(F.col("new.rank") - F.col("old.rank"))).alias("d")
                    )
                    .collect()[0]["d"]
                    or 0.0
                )
            scores = new_scores
            if (self.max_iterations is not None and it >= self.max_iterations) or (
                delta <= self.tol
            ):
                break
            # Divergence guard: the recurrence converges iff α·λmax < 1.
            # The reference default α=1/(1+maxDegree) guarantees that only
            # for UNWEIGHTED graphs (λmax ≤ maxdeg); on weighted graphs it
            # can diverge, and without maxIterations the loop would never
            # exit — fail loudly instead of hanging.
            if prev_delta is not None and delta > prev_delta and delta > 1e6 * abs(
                self.beta
            ):
                raise RuntimeError(
                    f"Katz iteration diverging (max|Δ| {prev_delta:.3e} → "
                    f"{delta:.3e}): alpha={alpha:.6g} ≥ 1/λmax for this "
                    "graph — pass a smaller alpha or set max_iterations"
                )
            prev_delta = delta
        self._iterations = it
        norm = scores.agg(F.sqrt(F.sum(F.pow("rank", 2))).alias("s")).collect()[0]["s"]
        self._scores = scores.select(
            "id", (F.col("rank") / F.lit(norm or 1.0)).alias("score")
        )
        msg.unpersist()
