"""Randomization null models — DegreePreservingShuffle + Curveball.

References:

- ``DegreePreservingShuffle``
  (``cpp/randomization/DegreePreservingShuffle.cpp:24-120``,
  ``include/networkit/randomization/DegreePreservingShuffle.hpp:38-58``):
  randomly permute vertex ids WITHIN equal-degree groups (equal
  (in, out) pairs when directed) — the resulting graph has exactly the
  same degree sequence and is a uniform sample of the id-relabeling
  null model.
- ``GlobalCurveball`` / ``Curveball``
  (``include/networkit/randomization/GlobalCurveball.hpp:27-70``,
  ``cpp/randomization/CurveballImpl.cpp``): curveball trades (Strona
  et al. 2014; EM/parallel schedule: Carstens, Hamann, Meyer,
  Penschuck, Tran, Wagner — ESA 2018, public papers): a trade between
  vertices (u, v) keeps their common neighbors and randomly re-splits
  the symmetric difference of their neighbor lists, preserving every
  degree and simplicity.

Spark re-expression of the trades (documented divergence): the
reference's *global trade* is a sequence of n/2 pair-trades executed
in order, with edges forwarded through the sequence (inherently
sequential — the ESA'18 algorithm pipelines messages through the trade
order). This engine instead runs ROUND-PARALLEL trades: each round
draws a seeded random perfect pairing of the vertices, assigns every
edge to exactly ONE endpoint's pair (seeded coin), and trades all
pairs simultaneously on their assigned edges only. Every simultaneous
trade is a valid curveball move on the current graph (unique edge
ownership removes write conflicts; common neighbors — tested against
the FULL edge set — stay put, so no duplicate edges can arise), each
move is reversible with equal probability (the re-split is a uniform
choice among splits), so the chain is symmetric and degree/simplicity
-preserving like the reference's; only the trade *schedule* differs.

Scale notes: the per-round vertex pairing uses one global row_number
(the same one-off global-order primitive as the vertex indexing in
kadabra.py); per-pair re-splits are windows bounded by
deg(u) + deg(v).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer


class DegreePreservingShuffle(Algorithm):
    def __init__(self, graph: Graph, seed: int = 1) -> None:
        super().__init__(graph)
        self.seed = seed
        self._perm: DataFrame | None = None
        self._result: Graph | None = None

    def _run(self) -> None:
        g = self.graph
        if g.directed:
            deg_out = g.edges.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("dout")
            )
            deg_in = g.edges.groupBy(F.col("dst").alias("id")).agg(
                F.count(F.lit(1)).alias("din")
            )
            deg = (
                g.vertices.join(deg_out, "id", "left")
                .join(deg_in, "id", "left")
                .select(
                    "id",
                    F.coalesce("dout", F.lit(0)).alias("d1"),
                    F.coalesce("din", F.lit(0)).alias("d2"),
                )
            )
        else:
            d = g.symmetrized().groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("d1")
            )
            deg = g.vertices.join(d, "id", "left").select(
                "id", F.coalesce("d1", F.lit(0)).alias("d1"),
                F.lit(0).alias("d2"),
            )
        # within each degree class, map the i-th node by id to the i-th
        # node by seeded random key — a uniform within-class permutation
        w_id = Window.partitionBy("d1", "d2").orderBy("id")
        w_rnd = Window.partitionBy("d1", "d2").orderBy(
            F.xxhash64(F.lit(self.seed), F.col("id")), F.col("id")
        )
        by_id = deg.select(
            "d1", "d2", F.col("id").alias("old"),
            F.row_number().over(w_id).alias("rk"),
        )
        by_rnd = deg.select(
            "d1", "d2", F.col("id").alias("new"),
            F.row_number().over(w_rnd).alias("rk"),
        )
        perm = by_id.join(by_rnd, ["d1", "d2", "rk"]).select(
            F.col("old").alias("id"), F.col("new").alias("new_id")
        )
        self._perm = perm.localCheckpoint()
        src_m = self._perm.select(
            F.col("id").alias("src"), F.col("new_id").alias("nsrc")
        )
        dst_m = self._perm.select(
            F.col("id").alias("dst"), F.col("new_id").alias("ndst")
        )
        base = g.edges if g.directed else g.canonical()
        edges = (
            base.join(src_m, "src")
            .join(dst_m, "dst")
            .select(
                (F.col("nsrc") if g.directed else F.least("nsrc", "ndst"))
                .alias("src"),
                (F.col("ndst") if g.directed else F.greatest("nsrc", "ndst"))
                .alias("dst"),
                "weight",
            )
        )
        self._result = Graph(
            edges.localCheckpoint(),
            directed=g.directed,
            weighted=g.weighted,
            vertices=g.vertices,
        )

    def get_permutation(self) -> DataFrame:
        """``(id, new_id)`` — the within-degree-class relabeling
        (``DegreePreservingShuffle::getPermutation``)."""
        self.assure_finished()
        return self._perm

    def get_graph(self) -> Graph:
        self.assure_finished()
        return self._result


class Curveball(Algorithm):
    """Round-parallel curveball trades (see module doc for the
    documented schedule divergence from ``GlobalCurveball``)."""

    def __init__(
        self, graph: Graph, number_of_rounds: int = 20, seed: int = 1
    ) -> None:
        if graph.directed:
            raise ValueError(
                "Curveball requires an undirected graph "
                "(GlobalCurveball.hpp ctor: undirected, unweighted)"
            )
        super().__init__(graph)
        self.number_of_rounds = number_of_rounds
        self.seed = seed
        self._result: Graph | None = None

    def _run(self) -> None:
        g = self.graph
        mat = Materializer()
        edges = (
            g.canonical()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        edges = mat.cut(0, edges)
        verts = g.vertices

        for r in range(1, self.number_of_rounds + 1):
            # ---- 1. seeded random perfect pairing of the vertices
            w = Window.orderBy(
                F.xxhash64(F.lit(self.seed), F.lit(r), F.col("id")),
                F.col("id"),
            )
            ranked = verts.select(
                "id", (F.row_number().over(w) - 1).alias("rk")
            )
            pairing = ranked.select(
                "id",
                (F.col("rk") / 2).cast("long").alias("pair"),
                (F.col("rk") % 2).alias("side"),
            )
            u_of = pairing.where(F.col("side") == 0).select(
                "pair", F.col("id").alias("u")
            )
            v_of = pairing.where(F.col("side") == 1).select(
                "pair", F.col("id").alias("v")
            )
            pairs = u_of.join(v_of, "pair")  # odd vertex out sits idle

            # ---- 2. unique edge ownership: seeded coin per edge
            own_src = (
                F.xxhash64(F.lit(self.seed + 1), F.lit(r), "src", "dst") % 2
                == 0
            )
            owned = edges.select(
                "src", "dst",
                F.when(own_src, F.col("src")).otherwise(F.col("dst"))
                .alias("owner"),
            ).select(
                "owner",
                F.when(F.col("owner") == F.col("src"), F.col("dst"))
                .otherwise(F.col("src"))
                .alias("x"),
                "src", "dst",
            )
            lk = pairing.select(F.col("id").alias("owner"), "pair")
            assigned = owned.join(lk, "owner").join(pairs, "pair")
            sym = edges.unionAll(
                edges.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            partner_of = F.when(
                F.col("owner") == F.col("u"), F.col("v")
            ).otherwise(F.col("u"))
            cand = assigned.select(
                "pair", "u", "v", "owner", "x", "src", "dst",
                partner_of.alias("partner"),
            )
            # the partner edge (u,v) itself and common neighbors (x
            # adjacent to BOTH u and v — tested against the full edge
            # set) are not tradeable and stay as they are
            probe = sym.select(
                F.col("src").alias("partner"), F.col("dst").alias("x"),
                F.lit(True).alias("is_common"),
            )
            cand = cand.join(probe, ["partner", "x"], "left")
            keepable = (F.col("x") == F.col("partner")) | F.col(
                "is_common"
            ).isNotNull()
            tradeable = cand.where(~keepable)
            fixed_assigned = cand.where(keepable).select("src", "dst")

            # ---- 3. re-split each pair's pool with a seeded shuffle
            pool = tradeable.select(
                "pair", "u", "v", "x", "src", "dst",
                (F.col("owner") == F.col("u")).cast("int").alias("from_u"),
            )
            w_pool = Window.partitionBy("pair").orderBy(
                F.xxhash64(F.lit(self.seed + 2), F.lit(r), "pair", "x"),
                F.col("x"),
            )
            w_cnt = Window.partitionBy("pair")
            pool = pool.select(
                "pair", "u", "v", "x", "src", "dst",
                F.row_number().over(w_pool).alias("slot"),
                F.sum("from_u").over(w_cnt).alias("n_u"),
            )
            traded = pool.select(
                "pair", "src", "dst",
                F.when(F.col("slot") <= F.col("n_u"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("a"),
                F.col("x").alias("b"),
            ).select(
                "pair", "src", "dst",
                F.least("a", "b").alias("nsrc"),
                F.greatest("a", "b").alias("ndst"),
            )
            traded = mat.cut(r * 4 + 1, traded)
            # ---- 4. cross-pair collision rejection: two pairs can
            # propose the SAME new edge (P moves (c,x)→(a,x) while x's
            # own pair moves (z,a)→(x,a)); collisions with kept edges
            # are impossible (an existing (a,x) makes x a common
            # neighbor, excluded above), so only pair-vs-pair remains.
            # Reverting BOTH colliding pairs entirely keeps the round
            # degree-preserving and simple — a rejection (identity)
            # move of the symmetric chain.
            bad_pairs = (
                traded.groupBy("nsrc", "ndst")
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.collect_set("pair").alias("ps"),
                )
                .where(F.col("c") > 1)
                .select(F.explode("ps").alias("pair"))
                .distinct()
            )
            ok = traded.join(bad_pairs, "pair", "left_anti").select(
                F.col("nsrc").alias("src"), F.col("ndst").alias("dst")
            )
            reverted = traded.join(bad_pairs, "pair", "left_semi").select(
                "src", "dst"
            )

            unassigned = edges.join(
                assigned.select("src", "dst"), ["src", "dst"], "left_anti"
            )
            edges = mat.cut(
                r * 4 + 2,
                unassigned.unionAll(fixed_assigned)
                .unionAll(ok)
                .unionAll(reverted),
            )

        self._result = Graph(
            edges.select("src", "dst", F.lit(1.0).alias("weight")),
            directed=False,
            weighted=False,
            vertices=verts,
        )

    def get_graph(self) -> Graph:
        """Randomized graph with the input's exact degree sequence
        (``GlobalCurveball::getGraph``)."""
        self.assure_finished()
        return self._result
