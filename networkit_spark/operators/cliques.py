"""MaximalCliques — distributed maximal-clique listing.

Reference: ``MaximalCliques`` (``cpp/clique/MaximalCliques.cpp``,
``include/networkit/clique/MaximalCliques.hpp:28-60``) — sequential
Bron–Kerbosch with degeneracy ordering (Eppstein & Strash 2011),
running time O(d²·n·3^{d/3}) for degeneracy d; emits every maximal
clique (isolated vertices are singleton maximal cliques).

Bron–Kerbosch's recursion stack does not distribute, so this engine
lists the same cliques with the classic join-based k-clique expansion
(the Apriori pattern used for distributed clique listing; e.g. Afrati,
Fotakis & Ullman 2013, "Enumerating subgraph instances using
map-reduce" — public): cliques are kept as ORDER-sorted arrays under
the degeneracy-style total order (degree asc, id asc — the same
orientation that bounds this engine's triangle wedges by arboricity),

    k-cliques ⨝ k-cliques on a shared (k−1)-prefix, + an edge test on
    the two tails  →  (k+1)-cliques,

and maximality is the subset test run in bulk: every (k+1)-clique
marks its k+1 drop-one sub-cliques; k-cliques never marked are
maximal. Rounds = max clique size; per-round work is proportional to
the number of k-cliques — the same 3^{d/3} state bound as the
reference, sharded across the cluster instead of a recursion stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer


class MaximalCliques(Algorithm):
    def __init__(self, graph: Graph, max_clique_size: int = 64) -> None:
        if graph.directed:
            raise ValueError("MaximalCliques requires an undirected graph")
        super().__init__(graph)
        self.max_clique_size = max_clique_size
        self._cliques: DataFrame | None = None
        self._max_size = 0

    def _run(self) -> None:
        g = self.graph
        mat = Materializer()
        canon = (
            g.canonical()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        sym = canon.unionAll(
            canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # degeneracy-style total order: (degree asc, id asc) — orient
        # every edge low→high so each clique has ONE canonical array
        deg = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        rank = g.vertices.join(deg, "id", "left").select(
            "id",
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        # clique members are (deg, id) STRUCTS: the array order, the
        # prefix-join tail comparison, and the edge-set lookup all use
        # the orientation order natively (comparing raw ids would break
        # canonical form whenever degree order disagrees with id order)
        s_src = F.struct(F.col("src_deg").alias("d"), F.col("src").alias("i"))
        s_dst = F.struct(F.col("dst_deg").alias("d"), F.col("dst").alias("i"))
        oriented = (
            canon.join(
                rank.select(F.col("id").alias("src"), F.col("deg").alias("src_deg")),
                "src",
            )
            .join(
                rank.select(F.col("id").alias("dst"), F.col("deg").alias("dst_deg")),
                "dst",
            )
            .select(
                F.when(s_src < s_dst, s_src).otherwise(s_dst).alias("lo"),
                F.when(s_src < s_dst, s_dst).otherwise(s_src).alias("hi"),
            )
        )
        oriented = mat.cut(0, oriented)
        edge_set = oriented.select(
            F.col("lo").alias("a"), F.col("hi").alias("b")
        )

        # k = 2 seed: arrays sorted by the orientation order
        cliques = oriented.select(F.array("lo", "hi").alias("c"))
        cliques = mat.cut(2, cliques)
        maximal_parts: list[DataFrame] = []
        k = 2
        while k < self.max_clique_size:
            # join on shared (k-1)-prefix; tails are the two extension
            # candidates — a (k+1)-clique iff the tails are adjacent
            pref = cliques.select(
                F.slice("c", 1, k - 1).alias("p"),
                F.element_at("c", k).alias("tail"),
            )
            nxt = (
                pref.alias("x")
                .join(pref.alias("y"), "p")
                .where(F.col("x.tail") < F.col("y.tail"))
                .join(
                    edge_set,
                    (F.col("x.tail") == F.col("a"))
                    & (F.col("y.tail") == F.col("b")),
                    "left_semi",
                )
                .select(
                    F.concat(
                        "p", F.array("x.tail"), F.array("y.tail")
                    ).alias("c")
                )
            )
            nxt = mat.cut(k + 1, nxt)
            # drop-one subsets of the (k+1)-cliques mark non-maximal
            # k-cliques
            if nxt.limit(1).count() == 0:
                maximal_parts.append(cliques)
                self._max_size = k
                break
            subs = nxt.select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(k)),
                        lambda i: F.filter(
                            "c", lambda _, j: j != i
                        ),
                    )
                ).alias("c")
            ).distinct()
            maximal_parts.append(cliques.join(subs, "c", "left_anti"))
            cliques = nxt
            k += 1
        else:
            raise RuntimeError(
                f"clique expansion exceeded max_clique_size="
                f"{self.max_clique_size}"
            )

        # singleton maximal cliques: isolated vertices
        touched = sym.select(F.col("src").alias("id")).distinct()
        singletons = g.vertices.join(touched, "id", "left_anti").select(
            F.array(
                F.struct(
                    F.lit(0).cast("long").alias("d"), F.col("id").alias("i")
                )
            ).alias("c")
        )
        out = singletons
        for part in maximal_parts:
            out = out.unionAll(part)
        # strip the degree component: emit id arrays (orientation order)
        self._cliques = out.select(
            F.transform("c", lambda s: s["i"]).alias("c")
        ).localCheckpoint()

    # ------------------------------------------------------- accessors
    def get_cliques(self) -> DataFrame:
        """``(c array<long>)`` — one row per maximal clique, members
        sorted by the (degree, id) orientation order."""
        self.assure_finished()
        return self._cliques

    def number_of_cliques(self) -> int:
        self.assure_finished()
        return self._cliques.count()

    def max_clique_size_found(self) -> int:
        """Size of the largest clique (``maximumOnly`` mode's answer)."""
        self.assure_finished()
        return self._max_size
