"""DynApproxBetweenness — sampled betweenness maintained under edge
insertions.

Reference: ``cpp/centrality/DynApproxBetweenness.cpp:30-177``
(Bergamini & Meyerhenke over Riondato–Kornaropoulos sampling): draw
``r = ⌈(c/ε²)·(⌊log₂(vd−2)⌋ + 1 − ln δ)⌉`` vertex pairs (vd = estimated
diameter), per pair sample one shortest path σ-proportionally backward
from the target; every interior node earns ``1/r``. ``updateBatch``
re-runs each sample's incremental SSSP and resamples only the samples
whose SSSP changed.

Spark re-expression:

- the per-sample forward SSSPs run as ONE batched layered BFS with path
  counts over the distinct sources (the ApproxBetweenness forward
  shape: rows ``(s, id, dist, sigma)``);
- the σ-weighted backward walks of all samples advance together, one
  cumulative-sum window + filter per step (O(max dist) rounds);
- ``update_batch`` detects modified SOURCES (an inserted edge {a, b}
  with ``dist(s,a)+1 ≤ dist(s,b)`` or vice versa — exactly the
  enqueue condition of ``DynBFS.cpp:88-92``, which also catches
  σ-only changes from equal-length insertions) and recomputes dist/σ
  for those sources in one batched pass, keeping every other source's
  rows. The reference's finer per-vertex cone update saves sequential
  work; batched, the frontier rounds cost the same whether they carry
  the cone or the tree — the savings that transfers is restricting to
  modified sources, which both engines do.

Determinism (divergence from the RNG-driven reference, and the basis
of the test contract): pair draws and every walk step are seeded
``xxhash64`` functions of ``(sample, step, seed)`` alone, so a walk
over unchanged dist/σ reproduces itself — ``update_batch`` therefore
EQUALS a fresh run on the updated graph, bit for bit (the reference
can only promise this distributionally).

Insertions only, unit weights (``DynBFS.cpp:51`` contract; the
reference's weighted path goes through DynDijkstra, out of scope
here); directed graphs rejected like the reference
(``DynApproxBetweenness.cpp:31-33``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Centrality
from networkit_spark.plans.iterate import Materializer, local_cut
from networkit_spark.streaming.events import EDGE_ADDITION, apply_events

_DRAW_BITS = 1 << 40


class DynApproxBetweenness(Centrality):
    def __init__(
        self,
        graph: Graph,
        epsilon: float = 0.1,
        delta: float = 0.1,
        universal_constant: float = 1.0,
        seed: int = 42,
        n_samples: int | None = None,
    ) -> None:
        super().__init__(graph)
        if graph.directed:
            raise ValueError("G must be undirected")
        if graph.weighted:
            raise ValueError(
                "unit-weight graphs only (the reference's weighted path is "
                "DynDijkstra; unsupported here)"
            )
        self.epsilon = float(epsilon)
        self.delta = float(delta)
        self.universal_constant = float(universal_constant)
        self.seed = int(seed)
        # explicit sample-count override (reproducible runs / oracles —
        # the ApproxBetweenness `sources` pattern); default: the
        # reference's diameter-driven r
        self.n_samples = n_samples
        self.r = 0
        self._g = graph
        self._draws: DataFrame | None = None
        self._ds: DataFrame | None = None
        self._interiors: DataFrame | None = None

    # -- batched forward BFS with path counts ---------------------------

    def _sym(self, g: Graph) -> DataFrame:
        return (
            g.symmetrized()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    def _forward(self, sym: DataFrame, sources: DataFrame) -> DataFrame:
        """``(s, id, dist, sigma)`` for reached pairs."""
        mat = Materializer()
        layer = mat.cut(
            0,
            sources.select(
                F.col("s"),
                F.col("s").alias("id"),
                F.lit(0).alias("dist"),
                F.lit(1.0).alias("sigma"),
            ),
        )
        visited = layer
        d = 0
        while True:
            d += 1
            gathered = (
                sym.join(layer.hint("shuffle_hash"), sym.src == layer.id)
                .groupBy("s", F.col("dst").alias("nid"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            nxt = (
                gathered.join(
                    visited.select("s", F.col("id").alias("nid")),
                    ["s", "nid"],
                    "left_anti",
                )
                .select(
                    "s",
                    F.col("nid").alias("id"),
                    F.lit(d).alias("dist"),
                    "sigma",
                )
            )
            nxt = mat.cut(d, nxt)
            if nxt.limit(1).count() == 0:
                break
            visited = mat.cut(d, visited.unionAll(nxt))
            layer = nxt
        return visited

    # -- deterministic σ-weighted backward walks ------------------------

    def _walk(self, sym: DataFrame, draws: DataFrame, ds: DataFrame) -> DataFrame:
        """``(sample, id)`` interior rows of one sampled shortest path
        per (reachable) draw."""
        spark = draws.sparkSession
        mat = Materializer()
        heads = mat.cut(
            0,
            draws.join(
                ds.select("s", F.col("id").alias("t"), F.col("dist").alias("cd")),
                ["s", "t"],
            ).select("sample", "s", F.col("t").alias("cur"), "cd"),
        )
        parts: list[DataFrame] = []
        step = 0
        while True:
            alive = heads.where(F.col("cd") > 0)
            if alive.limit(1).count() == 0:
                break
            step += 1
            cand = (
                alive.join(
                    sym.select(F.col("dst").alias("cur"), F.col("src").alias("z")),
                    "cur",
                )
                .join(
                    ds.select(
                        "s",
                        F.col("id").alias("z"),
                        F.col("dist").alias("zd"),
                        F.col("sigma").alias("zsig"),
                    ),
                    ["s", "z"],
                )
                .where(F.col("zd") == F.col("cd") - 1)
            )
            byz = Window.partitionBy("sample").orderBy("z")
            whole = Window.partitionBy("sample")
            cum = F.sum("zsig").over(byz)
            tot = F.sum("zsig").over(whole)
            draw = (
                F.pmod(
                    F.xxhash64("sample", F.lit(step), F.lit(self.seed)),
                    F.lit(_DRAW_BITS),
                ).cast("double")
                / F.lit(float(_DRAW_BITS))
            ) * tot
            picked = (
                cand.select(
                    "sample",
                    "s",
                    "z",
                    "cd",
                    cum.alias("cum"),
                    (cum - F.col("zsig")).alias("lo"),
                    draw.alias("draw"),
                )
                .where((F.col("draw") >= F.col("lo")) & (F.col("draw") < F.col("cum")))
                .select(
                    "sample",
                    "s",
                    F.col("z").alias("cur"),
                    (F.col("cd") - 1).alias("cd"),
                )
            )
            picked = mat.cut(step, picked)
            parts.append(
                picked.where(F.col("cur") != F.col("s")).select(
                    "sample", F.col("cur").alias("id")
                )
            )
            heads = picked
        if not parts:
            return spark.createDataFrame([], "sample long, id long")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return local_cut(out)

    # -- lifecycle -------------------------------------------------------

    def _run(self) -> None:
        from networkit_spark.operators.distance import Diameter

        g = self._g
        spark = g.edges.sparkSession
        n = g.number_of_nodes()
        if self.n_samples is not None:
            self.r = int(self.n_samples)
        else:
            vd = Diameter(g, algo="estimate").run().get_diameter()[0]
            self.r = max(
                1,
                math.ceil(
                    (self.universal_constant / (self.epsilon**2))
                    * (
                        math.floor(math.log2(max(vd - 2, 1)))
                        + 1
                        - math.log(self.delta)
                    )
                ),
            )
        ranked = g.vertices.select(
            "id",
            (F.row_number().over(Window.orderBy("id")) - 1).alias("pos"),
        )
        sids = spark.range(self.r).select(F.col("id").alias("sample"))
        pos = sids.select(
            "sample",
            F.pmod(
                F.xxhash64("sample", F.lit("s"), F.lit(self.seed)), F.lit(n)
            ).alias("spos"),
            F.pmod(
                F.xxhash64("sample", F.lit("t"), F.lit(self.seed)), F.lit(n)
            ).alias("tpos0"),
        ).select(
            "sample",
            "spos",
            # deterministic collision fix (reference redraws): shift by 1
            F.when(F.col("tpos0") == F.col("spos"), (F.col("tpos0") + 1) % n)
            .otherwise(F.col("tpos0"))
            .alias("tpos"),
        )
        draws = (
            pos.join(
                ranked.select(F.col("pos").alias("spos"), F.col("id").alias("s")),
                "spos",
            )
            .join(
                ranked.select(F.col("pos").alias("tpos"), F.col("id").alias("t")),
                "tpos",
            )
            .select("sample", "s", "t")
        )
        self._draws = local_cut(draws)
        sym = self._sym(g).persist()
        srcs = self._draws.select("s").distinct()
        self._ds = local_cut(self._forward(sym, srcs))
        self._interiors = self._walk(sym, self._draws, self._ds)
        self._refresh_scores()
        sym.unpersist()

    def update_batch(self, events: DataFrame) -> None:
        """Insert-incremental maintenance (``updateBatch``,
        ``DynApproxBetweenness.cpp:125-177``); equals a fresh ``run()``
        on the updated graph (see module docstring)."""
        self.assure_finished()
        bad = events.where(
            (F.col("etype") != EDGE_ADDITION)
            | (F.col("w").isNotNull() & (F.col("w") != F.lit(1.0)))
        )
        if bool(bad.limit(1).count()):
            raise RuntimeError("Graph update not allowed (DynBFS.cpp:51)")
        g2 = apply_events(self._g, events)
        sym2 = self._sym(g2).persist()
        ins = events.select(F.col("u").alias("a"), F.col("v").alias("b"))
        ins = ins.unionAll(ins.select(F.col("b").alias("a"), F.col("a").alias("b")))
        n2 = g2.number_of_nodes()
        da = self._ds.select(
            "s", F.col("id").alias("a"), F.col("dist").alias("dist_a")
        )
        db = self._ds.select(
            "s", F.col("id").alias("b"), F.col("dist").alias("dist_b")
        )
        srcs = self._draws.select("s").distinct()
        mod = (
            srcs.crossJoin(F.broadcast(ins))
            .join(da, ["s", "a"], "left")
            .join(db, ["s", "b"], "left")
            .where(
                F.coalesce("dist_a", F.lit(n2)) + 1
                <= F.coalesce("dist_b", F.lit(n2))
            )
            .select("s")
            .distinct()
        )
        mod = local_cut(mod)
        self._g = g2
        if mod.limit(1).count() == 0:
            self._refresh_scores()
            sym2.unpersist()
            return
        fresh = self._forward(sym2, mod)
        self._ds = local_cut(
            self._ds.join(mod, "s", "left_anti").unionAll(fresh)
        )
        mod_draws = self._draws.join(mod, "s")
        keep = self._interiors.join(
            mod_draws.select("sample"), "sample", "left_anti"
        )
        self._interiors = local_cut(
            keep.unionAll(self._walk(sym2, mod_draws, self._ds))
        )
        self._refresh_scores()
        sym2.unpersist()

    def _refresh_scores(self) -> None:
        """``(id, score)`` — fraction of sampled paths through each
        node (the reference's ``scoreData``, already 1/r-scaled)."""
        counts = self._interiors.groupBy("id").agg(
            (F.count(F.lit(1)) / F.lit(float(self.r))).alias("c")
        )
        self._scores = self._g.vertices.join(counts, "id", "left").select(
            "id", F.coalesce("c", F.lit(0.0)).alias("score")
        )

    def number_of_samples(self) -> int:
        """``DynApproxBetweenness::getNumberOfSamples``."""
        self.assure_finished()
        return self.r


class _DynPairsState:
    """Shared machinery for the exact dynamic-betweenness family: the
    full ordered-pairs frame ``(s, t, d, sigma)`` (hop distances, path
    counts; diagonal rows ``(s, s, 0, 1)`` included) and its one-pass
    single-edge-insertion update.

    Reference bookkeeping (``cpp/centrality/DynBetweenness.cpp:24-28``)
    keeps the same n² ``distances``/``sigma`` matrices; the iBet update
    walks affected sources per sink with priority queues. Distributed,
    the same relaxation is closed-form for ONE inserted edge {u, v}:
    a new shortest path uses the new edge exactly once, so

      d'(s,t)  = min(d(s,t), d(s,u) + 1 + d(v,t) [, d(s,v) + 1 + d(u,t)])
      σ'(s,t)  = σ contributions of every term attaining the min
                 (old σ if d' = d; via-σ = σ(s,u)·σ(v,t))

    — one broadcast-join pass over the pair frame (the two n-row
    distance vectors of u and v are the only things joined in), no
    sequential queues. O(n²) state is inherent to the exact dynamic
    algorithm (same as the reference); this operator is therefore a
    fixture/medium-scale tool — the scale-relevant sampled variant is
    :class:`DynApproxBetweenness`.
    """

    def __init__(self, graph: Graph) -> None:
        if graph.weighted:
            raise ValueError(
                "hop-distance variant: unweighted graphs only (the "
                "reference's weighted path runs Dijkstra per source)"
            )
        self.graph = graph

    # -------------------------------------------------- initial state
    def build(self) -> DataFrame:
        """Batched all-sources BFS with path counts — the
        ApproxBetweenness forward shape, kept as state."""
        g = self.graph
        mat = Materializer()
        nbrs = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        layer = local_cut(
            g.vertices.select(
                F.col("id").alias("s"),
                F.col("id").alias("t"),
                F.lit(0).alias("d"),
                F.lit(1.0).alias("sigma"),
            )
        )
        visited = layer
        d = 0
        while True:
            d += 1
            gathered = local_cut(
                nbrs.join(layer, nbrs.src == layer.t)
                .groupBy("s", F.col("dst").alias("nid"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            nxt = mat.cut(
                d,
                gathered.join(
                    visited.select("s", F.col("t").alias("nid")),
                    ["s", "nid"],
                    "left_anti",
                ).select(
                    "s", F.col("nid").alias("t"), F.lit(d).alias("d"), "sigma"
                ),
            )
            if nxt.limit(1).count() == 0:
                break
            visited = mat.cut(10_000 + d, visited.unionAll(nxt))
            layer = nxt
        nbrs.unpersist()
        return visited

    # ------------------------------------------------------- update
    def insert_edge(
        self, pairs: DataFrame, u: int, v: int
    ) -> tuple[DataFrame, DataFrame]:
        """Apply the single-edge relaxation; returns
        ``(pairs_new, modified)`` where ``modified`` carries both the
        old and new ``(d, sigma)`` per changed pair (old columns null
        for newly connected pairs)."""
        g = self.graph
        # Consistent-stream guard: the closed-form relaxation assumes
        # the edge is NEW — re-inserting an existing edge would add its
        # via-path counts to sigma a second time and silently corrupt
        # every subsequent delta. In hop metric an edge u→v exists iff
        # d(u, v) == 1, so the pair frame itself is the edge lookup
        # (the reference makes the same assumption via GraphUpdater's
        # consistent event stream, cpp/dynamics/GraphUpdater.cpp).
        if (
            pairs.where(
                (F.col("s") == u) & (F.col("t") == v) & (F.col("d") == 1)
            )
            .limit(1)
            .count()
        ):
            raise ValueError(
                f"edge ({u}, {v}) already exists — dynamic betweenness "
                "requires a consistent event stream (no duplicate "
                "EDGE_ADDITION)"
            )
        orients = [(u, v)] if g.directed else [(u, v), (v, u)]
        vias = []
        for a, b in orients:
            da = pairs.where(F.col("t") == a).select(
                "s", F.col("d").alias("d_sa"), F.col("sigma").alias("sig_sa")
            )
            db = pairs.where(F.col("s") == b).select(
                F.col("t").alias("t2"),
                F.col("d").alias("d_bt"),
                F.col("sigma").alias("sig_bt"),
            )
            vias.append(
                F.broadcast(da)
                .crossJoin(F.broadcast(db))
                .select(
                    "s",
                    F.col("t2").alias("t"),
                    (F.col("d_sa") + F.lit(1) + F.col("d_bt")).alias("dv"),
                    (F.col("sig_sa") * F.col("sig_bt")).alias("sigv"),
                )
            )
        via = vias[0] if len(vias) == 1 else vias[0].unionAll(vias[1])
        vmin = via.groupBy("s", "t").agg(F.min("dv").alias("dvm"))
        via_best = (
            via.join(vmin, ["s", "t"])
            .where(F.col("dv") == F.col("dvm"))
            .groupBy("s", "t")
            .agg(F.min("dv").alias("dv"), F.sum("sigv").alias("sigv"))
        )
        merged = local_cut(
            pairs.join(via_best, ["s", "t"], "full_outer").select(
                "s",
                "t",
                F.col("d").alias("d_old"),
                F.col("sigma").alias("sig_old"),
                F.least(
                    F.coalesce("d", F.lit(2_000_000_000)),
                    F.coalesce("dv", F.lit(2_000_000_000)),
                ).alias("d_new"),
                F.when(
                    F.col("d").isNull()
                    | (F.col("dv") < F.col("d")),
                    F.col("sigv"),
                )
                .when(F.col("dv") == F.col("d"), F.col("sigma") + F.col("sigv"))
                .otherwise(F.col("sigma"))
                .alias("sig_new"),
            )
        )
        pairs_new = merged.select(
            "s", "t", F.col("d_new").alias("d"), F.col("sig_new").alias("sigma")
        )
        modified = merged.where(
            F.col("d_old").isNull()
            | (F.col("d_new") != F.col("d_old"))
            | (F.col("sig_new") != F.col("sig_old"))
        )
        return local_cut(pairs_new), local_cut(modified)


def _pair_contrib(
    modified: DataFrame, pairs: DataFrame, d_col: str, sig_col: str
) -> DataFrame:
    """Σ over the given pairs of ``σ(s,x)·σ(x,t)/σ(s,t)`` for every
    interior x on a shortest s→t path — the per-pair Brandes
    contribution, evaluated against one consistent state snapshot.
    Returns ``(id, c)``."""
    mp = modified.where(F.col(d_col).isNotNull()).select(
        "s", "t", F.col(d_col).alias("d_st"), F.col(sig_col).alias("sig_st")
    ).where(F.col("s") != F.col("t"))
    a = pairs.select(
        F.col("s").alias("s"),
        F.col("t").alias("x"),
        F.col("d").alias("d_sx"),
        F.col("sigma").alias("sig_sx"),
    )
    b = pairs.select(
        F.col("s").alias("x"),
        F.col("t").alias("t"),
        F.col("d").alias("d_xt"),
        F.col("sigma").alias("sig_xt"),
    )
    return (
        mp.join(a, "s")
        .where((F.col("x") != F.col("s")) & (F.col("x") != F.col("t")))
        .join(b, ["x", "t"])
        .where(F.col("d_sx") + F.col("d_xt") == F.col("d_st"))
        .groupBy(F.col("x").alias("id"))
        .agg(
            F.sum(F.col("sig_sx") * F.col("sig_xt") / F.col("sig_st")).alias(
                "c"
            )
        )
    )


class DynBetweenness(Centrality):
    """Exact betweenness maintained under edge insertions.

    Reference: ``DynBetweenness`` (``cpp/centrality/DynBetweenness.cpp:
    30-362``, Bergamini–Slobbe iBet): n² distance/σ matrices, per-event
    affected-source BFS + per-sink priority-queue dependency walks.
    This engine keeps the same n² state as a DataFrame and replaces the
    sequential queues with the closed-form single-edge relaxation
    (:class:`_DynPairsState`) plus a modified-pairs contribution delta:

      Δbc(x) = Σ_{(s,t) modified} [newContrib(s,t,x) − oldContrib(s,t,x)]

    where contrib is the Brandes pair term σ(s,x)·σ(x,t)/σ(s,t) on
    shortest paths — old terms evaluated against the pre-update
    snapshot (the reference's ``distancesOld``/``sigmaOld``), new
    against the post-update one. Work per event is O(|modified|·n)
    join-rows, the distributed analog of the reference's truncated
    recomputation. Insertions only (``DynBetweenness.cpp:164-166``);
    unweighted hop graphs (weighted runs Dijkstra per source in the
    reference — out of scope like DynBFS/DynAPSP).

    Scores are the raw Brandes sums (directed: ordered pairs once;
    undirected: both orientations, matching ``Betweenness`` with no
    halving) — ``update`` therefore EQUALS a fresh ``Betweenness`` run
    on the updated graph (the pytest contract).
    """

    def __init__(self, graph: Graph) -> None:
        super().__init__(graph)
        self._state = _DynPairsState(graph)
        self._pairs: DataFrame | None = None

    def _run(self) -> None:
        from networkit_spark.operators.betweenness import Betweenness

        self._pairs = self._state.build()
        self._scores = local_cut(
            Betweenness(self.graph).run().scores()
        )

    def update(self, events: DataFrame) -> None:
        """Apply EDGE_ADDITION events one at a time (the closed-form
        relaxation is exact per single edge; reference ``updateBatch``
        also loops, ``DynBetweenness.hpp``)."""
        self.assure_finished()
        bad = events.where(
            (F.col("etype") != EDGE_ADDITION)
            | (F.col("w").isNotNull() & (F.col("w") != F.lit(1.0)))
        )
        if bool(bad.limit(1).count()):
            raise RuntimeError(
                "event type not allowed. Edge insertions only "
                "(DynBetweenness.cpp:164-166, hop-distance variant)"
            )
        for row in events.select("u", "v").collect():
            self._apply_one(int(row["u"]), int(row["v"]))

    def _apply_one(self, u: int, v: int) -> None:
        spark = self.graph.edges.sparkSession
        ev = spark.createDataFrame(
            [(EDGE_ADDITION, u, v, 1.0)],
            "etype string, u long, v long, w double",
        )
        old_pairs = self._pairs
        new_graph = apply_events(self.graph, ev)
        self._state.graph = self.graph  # relaxation uses OLD d/σ only
        pairs_new, modified = self._state.insert_edge(old_pairs, u, v)
        self.graph = new_graph
        self._state.graph = new_graph
        c_new = _pair_contrib(modified, pairs_new, "d_new", "sig_new")
        c_old = _pair_contrib(modified, old_pairs, "d_old", "sig_old")
        delta = (
            c_new.withColumnRenamed("c", "cn")
            .join(c_old.withColumnRenamed("c", "co"), "id", "full_outer")
            .select(
                "id",
                (
                    F.coalesce("cn", F.lit(0.0)) - F.coalesce("co", F.lit(0.0))
                ).alias("delta"),
            )
        )
        self._scores = local_cut(
            self._scores.join(delta, "id", "left").select(
                "id",
                (F.col("score") + F.coalesce("delta", F.lit(0.0))).alias(
                    "score"
                ),
            )
        )
        self._pairs = pairs_new

    def distances(self) -> DataFrame:
        """``(s, t, d, sigma)`` maintained pair state."""
        self.assure_finished()
        return self._pairs


class DynBetweennessOneNode:
    """Exact betweenness of ONE node x under edge insertions.

    Reference: ``DynBetweennessOneNode``
    (``include/networkit/centrality/DynBetweennessOneNode.hpp:20-77``,
    ``cpp/centrality/DynBetweennessOneNode.cpp``): maintains n²
    distances/σ plus σx (shortest paths through x); bcx = Σ σx/σ.
    Here σx is derived from the same pair frame
    (σx(s,t) = σ(s,x)·σ(x,t) iff d(s,x)+d(x,t) = d(s,t)), so only the
    pair state is maintained (:class:`_DynPairsState`) and bcx is one
    broadcast-join aggregation after each insertion. Insertions only;
    unweighted hop graphs; undirected scores count both orientations
    (matching the reference's non-directed doubling)."""

    def __init__(self, graph: Graph, x: int) -> None:
        self._state = _DynPairsState(graph)
        self.x = int(x)
        self._pairs: DataFrame | None = None
        self._bcx: float | None = None

    @property
    def graph(self) -> Graph:
        return self._state.graph

    def run(self) -> "DynBetweennessOneNode":
        self._pairs = self._state.build()
        self._recompute_bcx()
        return self

    def _recompute_bcx(self) -> None:
        x = self.x
        sx = self._pairs.where(F.col("t") == x).select(
            "s", F.col("d").alias("d_sx"), F.col("sigma").alias("sig_sx")
        )
        xt = self._pairs.where(F.col("s") == x).select(
            F.col("t").alias("t"),
            F.col("d").alias("d_xt"),
            F.col("sigma").alias("sig_xt"),
        )
        joined = (
            self._pairs.where((F.col("s") != x) & (F.col("t") != x))
            .where(F.col("s") != F.col("t"))
            .join(F.broadcast(sx), "s")
            .join(F.broadcast(xt), "t")
            .where(F.col("d_sx") + F.col("d_xt") == F.col("d"))
        )
        row = joined.agg(
            F.sum(
                F.col("sig_sx") * F.col("sig_xt") / F.col("sigma")
            ).alias("b")
        ).collect()[0]
        self._bcx = float(row["b"] or 0.0)

    def update(self, events: DataFrame) -> None:
        bad = events.where(
            (F.col("etype") != EDGE_ADDITION)
            | (F.col("w").isNotNull() & (F.col("w") != F.lit(1.0)))
        )
        if bool(bad.limit(1).count()):
            raise RuntimeError(
                "event type not allowed. Edge insertions only "
                "(DynBetweennessOneNode.hpp:36-40, hop-distance variant)"
            )
        spark = self.graph.edges.sparkSession
        for r in events.select("u", "v").collect():
            u, v = int(r["u"]), int(r["v"])
            ev = spark.createDataFrame(
                [(EDGE_ADDITION, u, v, 1.0)],
                "etype string, u long, v long, w double",
            )
            pairs_new, _ = self._state.insert_edge(self._pairs, u, v)
            self._state.graph = apply_events(self.graph, ev)
            self._pairs = pairs_new
        self._recompute_bcx()

    # ------------------------------------------------------ accessors
    def get_bcx(self) -> float:
        """``getbcx``."""
        return self._bcx

    def _lookup(self, u: int, v: int, col: str) -> float:
        rows = self._pairs.where(
            (F.col("s") == u) & (F.col("t") == v)
        ).collect()
        if not rows:
            return float("inf") if col == "d" else 0.0
        return float(rows[0][col])

    def get_distance(self, u: int, v: int) -> float:
        """``getDistance`` (+inf when unreachable)."""
        return self._lookup(u, v, "d")

    def get_sigma(self, u: int, v: int) -> float:
        """``getSigma``."""
        return self._lookup(u, v, "sigma")

    def get_sigmax(self, u: int, v: int) -> float:
        """``getSigmax`` — σ(u,x)·σ(x,v) on shortest paths through x."""
        x = self.x
        d_ux, s_ux = self._lookup(u, x, "d"), self._lookup(u, x, "sigma")
        d_xv, s_xv = self._lookup(x, v, "d"), self._lookup(x, v, "sigma")
        d_uv = self._lookup(u, v, "d")
        if d_ux + d_xv == d_uv:
            return s_ux * s_xv
        return 0.0
