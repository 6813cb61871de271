"""Max-flow — Edmonds–Karp with distributed BFS augmentation.

Reference: ``EdmondsKarp`` (``cpp/flow/EdmondsKarp.cpp:18-110``,
``include/networkit/flow/EdmondsKarp.hpp:57-93``): repeat { BFS a
shortest residual s→t path, push its bottleneck } until no path;
report the flow value, per-edge flows, and the source side of the min
cut (residual BFS from s).

Honesty note on distribution: max-flow is P-complete — the
augmentation SEQUENCE is inherently sequential (the reference's outer
``do`` loop). What distributes is each augmentation's BFS (the same
batched frontier rounds as operators/distance.py) and the residual
bookkeeping (vertex-keyed joins). The augmentation count is the
classic O(V·E) bound (O(value) for integer capacities), so this
operator targets flow queries whose value is moderate — the reference
has exactly the same loop structure, just with a single-machine BFS
inside.

Residual formulation for undirected edges (mirrors the reference's
flow/residFlow pair): each edge {u, v} of capacity w becomes arcs
u→v and v→u with residual w; pushing g along u→v subtracts g there
and adds g on v→u; the net edge flow is ``max(w − r(u→v),
w − r(v→u), 0)`` (= the reference's final ``max(flow, residFlow)``).

Documented divergence: BFS predecessor choice. The reference takes the
first-discovered predecessor (adjacency order); this engine picks, per
newly reached vertex, the candidate with the LARGEST bottleneck gain
(ties → smallest predecessor id) — deterministic, still a shortest
path, so the Edmonds–Karp bound and the max-flow VALUE are unchanged
(per-edge flow decompositions can legitimately differ; only the value
and cut are unique invariants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer, local_cut


class EdmondsKarp(Algorithm):
    def __init__(
        self,
        graph: Graph,
        source: int,
        sink: int,
        max_augmentations: int = 10_000,
    ) -> None:
        if source == sink:
            raise ValueError("source and sink must differ")
        super().__init__(graph)
        self.source = int(source)
        self.sink = int(sink)
        self.max_augmentations = max_augmentations
        self._flow_value = 0.0
        self._arcs: DataFrame | None = None
        self._caps: DataFrame | None = None
        self._augmentations = 0

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        if g.directed:
            base = g.edges.groupBy("src", "dst").agg(
                F.sum("weight").alias("cap")
            )
            arcs = base.select("src", "dst", F.col("cap").alias("r"))
            # reverse arcs with zero residual for flow cancellation
            arcs = arcs.unionAll(
                base.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"),
                    F.lit(0.0).alias("r"),
                )
            ).groupBy("src", "dst").agg(F.sum("r").alias("r"))
        else:
            canon = (
                g.canonical()
                .where(F.col("src") != F.col("dst"))
                .groupBy("src", "dst")
                .agg(F.sum("weight").alias("cap"))
            )
            arcs = canon.select("src", "dst", F.col("cap").alias("r")).unionAll(
                canon.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"),
                    F.col("cap").alias("r"),
                )
            )
        arcs = mat.cut(0, arcs)
        self._caps = arcs.groupBy("src", "dst").agg(F.sum("r").alias("cap"))
        self._caps = local_cut(self._caps)

        total = 0.0
        aug = 0
        while aug < self.max_augmentations:
            aug += 1
            found = self._bfs(arcs, mat, aug)
            if found is None:
                aug -= 1
                break
            path, gain = found
            total += gain
            # apply the path augmentation as one small join-diff
            upd_rows = []
            for u, v in path:
                upd_rows.append((u, v, -gain))
                upd_rows.append((v, u, gain))
            upd = spark.createDataFrame(
                upd_rows, "src long, dst long, dr double"
            ).groupBy("src", "dst").agg(F.sum("dr").alias("dr"))
            arcs = (
                arcs.join(F.broadcast(upd), ["src", "dst"], "full_outer")
                .select(
                    "src", "dst",
                    (
                        F.coalesce("r", F.lit(0.0))
                        + F.coalesce("dr", F.lit(0.0))
                    ).alias("r"),
                )
            )
            arcs = mat.cut(aug, arcs)
        else:
            raise RuntimeError(
                f"max_augmentations={self.max_augmentations} reached with "
                "augmenting paths remaining — raise the budget"
            )
        self._flow_value = total
        self._arcs = arcs
        self._augmentations = aug

    # ------------------------------------------------ one shortest path
    def _bfs(self, arcs: DataFrame, mat: Materializer, aug: int):
        """Level-synchronous BFS over positive-residual arcs; returns
        (path arcs source→sink, bottleneck gain) or None."""
        spark = arcs.sparkSession
        pos = arcs.where(F.col("r") > 1e-12)
        visited = spark.createDataFrame(
            [(self.source, self.source, float("inf"))],
            "id long, pred long, gain double",
        )
        frontier = visited
        base = 100_000 * aug
        for rounds in range(1, 100_000):
            cand = (
                pos.join(
                    frontier.select(
                        F.col("id").alias("src"), F.col("gain").alias("g")
                    ).hint("shuffle_hash"),
                    "src",
                )
                .select(
                    F.col("dst").alias("id"), F.col("src").alias("pred"),
                    F.least(F.col("g"), F.col("r")).alias("gain"),
                )
            )
            nxt = (
                cand.join(visited.select("id"), "id", "left_anti")
                .groupBy("id")
                .agg(
                    F.max_by(
                        F.struct("pred", "gain"),
                        F.struct(
                            F.col("gain").alias("g"), (-F.col("pred")).alias("p")
                        ),
                    ).alias("b")
                )
                .select("id", F.col("b.pred").alias("pred"),
                        F.col("b.gain").alias("gain"))
            )
            nxt = mat.cut(base + rounds, nxt)
            if nxt.limit(1).count() == 0:
                return None
            visited = mat.cut(base + 50_000 + rounds, visited.unionAll(nxt))
            hit = nxt.where(F.col("id") == self.sink).collect()
            if hit:
                gain = float(hit[0]["gain"])
                # backtrack pred pointers (one 1-row lookup per hop)
                path = []
                v = self.sink
                while v != self.source:
                    u = int(
                        visited.where(F.col("id") == v).collect()[0]["pred"]
                    )
                    path.append((u, v))
                    v = u
                return list(reversed(path)), gain
            frontier = nxt
        return None

    # ------------------------------------------------------- accessors
    def get_max_flow(self) -> float:
        """``EdmondsKarp::getMaxFlow``."""
        self.assure_finished()
        return self._flow_value

    def number_of_augmentations(self) -> int:
        self.assure_finished()
        return self._augmentations

    def get_flow(self) -> DataFrame:
        """``(u, v, flow)`` per input edge — net |flow| (the
        reference's final ``max(flow, residFlow)`` per edge)."""
        self.assure_finished()
        r_uv = self._arcs.select("src", "dst", F.col("r").alias("r_f"))
        out = (
            self._caps.join(r_uv, ["src", "dst"], "left")
            .select(
                F.col("src").alias("u"), F.col("dst").alias("v"),
                F.greatest(
                    F.col("cap") - F.coalesce("r_f", F.col("cap")),
                    F.lit(0.0),
                ).alias("flow"),
            )
        )
        if not self.graph.directed:
            # collapse the two arc rows of each undirected edge
            out = (
                out.select(
                    F.least("u", "v").alias("u"),
                    F.greatest("u", "v").alias("v"),
                    "flow",
                )
                .groupBy("u", "v")
                .agg(F.max("flow").alias("flow"))
            )
        return out

    def get_source_set(self) -> list[int]:
        """Source side of the min cut: residual BFS from the source
        (``EdmondsKarp::getSourceSet``)."""
        self.assure_finished()
        pos = self._arcs.where(F.col("r") > 1e-12)
        spark = pos.sparkSession
        visited = spark.createDataFrame([(self.source,)], "id long")
        frontier = visited
        while True:
            nxt = (
                pos.join(
                    frontier.withColumnRenamed("id", "src").hint(
                        "shuffle_hash"
                    ),
                    "src",
                )
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited, "id", "left_anti")
            )
            nxt = local_cut(nxt)
            if nxt.limit(1).count() == 0:
                break
            visited = local_cut(visited.unionAll(nxt))
            frontier = nxt
        return sorted(r["id"] for r in visited.collect())
