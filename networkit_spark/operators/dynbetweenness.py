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
