"""Spanning forests — distributed Borůvka rounds.

Reference surface: ``graph/SpanningForest.cpp`` (BFS-tree spanning
forest), ``graph/RandomMaximumSpanningForest.cpp`` /
``UnionMaximumSpanningForest.cpp`` (weighted spanning backbones used by
sparsification). Those are sequential UnionFind/BFS constructions; the
distributed classic with the same result contract is **Borůvka**: each
component picks its minimum outgoing edge, picked edges merge
components, repeat — the component count at least halves per round, so
O(log n) rounds of joins/aggregations.

Round plan (all DataFrame ops):

    cross  = edges ⋈ labels(src) ⋈ labels(dst), keep lu ≠ lv
    picked = per-label argmin over (w, src, dst)     [deterministic]
    merge  = hash-min label propagation over the picked component pairs
             (a tiny graph: ≤ one edge per component) until stable
    labels = relabel through the merge map

Determinism: the (weight, src, dst) lexicographic tie-break makes the
forest unique for any input, so results are reproducible across
partitionings — the pytest contract checks total weight against a
driver-side Kruskal on golden graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer, local_cut


class MinimumSpanningForest(Algorithm):
    """Minimum-weight spanning forest via Borůvka rounds; on unweighted
    graphs every spanning forest is minimum (``SpanningForest.cpp``
    contract)."""

    def __init__(self, graph: Graph, max_rounds: int = 64) -> None:
        if graph.directed:
            raise ValueError("spanning forests need an undirected graph")
        super().__init__(graph)
        self.max_rounds = max_rounds
        self._forest: DataFrame | None = None
        self._labels: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        canon = (
            g.canonical()
            .select("src", "dst", "weight")
            .where(F.col("src") != F.col("dst"))
            # multigraph: keep the cheapest parallel edge (deterministic)
            .groupBy("src", "dst")
            .agg(F.min("weight").alias("weight"))
        )
        canon = mat.cut(0, canon)
        labels = mat.cut(0, g.vertices.select("id", F.col("id").alias("label")))
        forest: DataFrame | None = None

        rounds = 0
        while rounds < self.max_rounds:
            rounds += 1
            ls = labels.select(F.col("id").alias("src"), F.col("label").alias("lu"))
            ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("lv"))
            cross = (
                canon.join(ls.hint("shuffle_hash"), "src")
                .join(ld.hint("shuffle_hash"), "dst")
                .where(F.col("lu") != F.col("lv"))
            )
            cross = cross.transform(local_cut)
            if cross.limit(1).count() == 0:
                break
            # each component's min outgoing edge, from both sides
            both = cross.select(
                F.col("lu").alias("comp"), "src", "dst", "weight", "lu", "lv"
            ).unionAll(
                cross.select(
                    F.col("lv").alias("comp"), "src", "dst", "weight", "lu", "lv"
                )
            )
            # min outgoing edge per component via min(struct(...)) hash
            # agg — struct field order (weight, src, dst) IS the
            # deterministic tie-break, with map-side partial aggregation
            # instead of a row_number exchange+sort
            picked = (
                both.groupBy("comp")
                .agg(F.min(F.struct("weight", "src", "dst", "lu", "lv")).alias("p"))
                .select("p.src", "p.dst", "p.weight", "p.lu", "p.lv")
                .distinct()
                .transform(local_cut)
            )
            add = picked.select("src", "dst", "weight")
            forest = add if forest is None else forest.unionAll(add)
            forest = forest.dropDuplicates(["src", "dst"])
            forest = mat.cut(rounds, forest)
            # merge components: hash-min over the picked (lu, lv) pairs —
            # a graph with <= one edge per component; iterate the tiny
            # label-merge until stable
            pairs = picked.select("lu", "lv").distinct()
            merge = (
                pairs.select(F.col("lu").alias("a"), F.col("lv").alias("b"))
                .unionAll(pairs.select(F.col("lv").alias("a"), F.col("lu").alias("b")))
            )
            comp_labels = (
                merge.select(F.col("a").alias("node"))
                .distinct()
                .select("node", F.col("node").alias("m"))
                .transform(local_cut)
            )
            merge = merge.transform(local_cut)
            while True:
                gathered = (
                    merge.join(comp_labels, merge.a == comp_labels.node)
                    .groupBy(F.col("b").alias("node"))
                    .agg(F.min("m").alias("nm"))
                )
                new_cl = (
                    comp_labels.join(gathered, "node", "left")
                    .select(
                        "node",
                        F.least(
                            F.col("m"), F.coalesce("nm", F.col("m"))
                        ).alias("m"),
                    )
                    .transform(local_cut)
                )
                changed = (
                    new_cl.alias("new")
                    .join(comp_labels.alias("old"), "node")
                    .where(F.col("new.m") != F.col("old.m"))
                    .count()
                )
                comp_labels = new_cl
                if changed == 0:
                    break
            remap = comp_labels.select(
                F.col("node").alias("label"), F.col("m").alias("new_label")
            )
            labels = (
                labels.join(F.broadcast(remap), "label", "left")
                .select("id", F.coalesce("new_label", "label").alias("label"))
            )
            labels = mat.cut(rounds, labels)
        else:
            raise RuntimeError(
                f"Borůvka did not converge in {self.max_rounds} rounds"
            )
        self._labels = labels
        self._forest = forest if forest is not None else (
            spark.createDataFrame([], "src long, dst long, weight double")
        )

    # ----------------------------------------------------------- accessors
    def get_forest(self) -> DataFrame:
        """``(src, dst, weight)`` forest edges (canonical direction)."""
        self.assure_finished()
        return self._forest

    def total_weight(self) -> float:
        self.assure_finished()
        return float(
            self._forest.agg(F.sum("weight")).collect()[0][0] or 0.0
        )

    def get_partition(self) -> DataFrame:
        """Component labels (a byproduct — equals connected components)."""
        self.assure_finished()
        return self._labels


class SpanningForest(MinimumSpanningForest):
    """Unweighted spanning forest (``graph/SpanningForest.cpp``): Borůvka
    with unit weights — any spanning forest is minimum."""

    def _run(self) -> None:
        g = self.graph
        unit = Graph(
            g.edges.select("src", "dst", F.lit(1.0).alias("weight")),
            directed=False,
            weighted=False,
            vertices=g._vertices,
        )
        inner = MinimumSpanningForest(unit, max_rounds=self.max_rounds)
        inner.run()
        self._forest = inner._forest
        self._labels = inner._labels
