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

    def _sort_keys(self) -> list:
        """Leading sort keys of the per-component edge pick; (weight,
        src, dst) lexicographic = deterministic MINIMUM forest. Subclass
        hook (RandomMaximumSpanningForest flips and randomizes)."""
        return [F.col("weight")]

    def _parallel_edge_agg(self, w):
        return F.min(w)

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        canon = (
            g.canonical()
            .select("src", "dst", "weight")
            .where(F.col("src") != F.col("dst"))
            # multigraph: keep the best parallel edge (deterministic;
            # cheapest for min forests, heaviest for max forests)
            .groupBy("src", "dst")
            .agg(self._parallel_edge_agg(F.col("weight")).alias("weight"))
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
            keys = [
                k.alias(f"k{i}") for i, k in enumerate(self._sort_keys())
            ]
            picked = (
                both.groupBy("comp")
                .agg(
                    F.min(
                        F.struct(*keys, "src", "dst", "weight", "lu", "lv")
                    ).alias("p")
                )
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


class KruskalMSF(MinimumSpanningForest):
    """``graph/KruskalMSF.hpp:22-33`` — per-component minimum-weight
    spanning tree via sorted edge scan + union-find. Kruskal's sequential
    scan order and Borůvka's parallel min-edge rounds produce the same
    forest WEIGHT always, and the same edge SET whenever weights are
    distinct; under ties this engine's deterministic ``(w, src, dst)``
    pick may choose different (equally minimal) edges than the
    reference's ``std::sort`` order — the standard MSF non-uniqueness.
    Borůvka is the log-round distributed formulation, so this is a
    contract alias of :class:`MinimumSpanningForest`."""


class RandomMaximumSpanningForest(MinimumSpanningForest):
    """Maximum-weight spanning forest with seeded tie order
    (``cpp/graph/RandomMaximumSpanningForest.cpp:14-70`` — descending
    Kruskal whose equal-weight edges are taken in randomized order; used
    by the Simmelian backbone sparsifiers). Same Borůvka rounds as the
    base class with the pick flipped to heaviest-first; among equal
    weights the order is an md5 hash of (seed, src, dst) — the seeded,
    partitioning-independent analog of the reference's shuffled sort.
    """

    def __init__(self, graph: Graph, seed: int = 0, max_rounds: int = 64):
        super().__init__(graph, max_rounds=max_rounds)
        self.seed = seed

    def _sort_keys(self) -> list:
        from networkit_spark.operators.dedup import portable_hash32

        tie = portable_hash32(
            F.concat_ws(":", F.col("src"), F.col("dst")),
            f"rmsf{self.seed}",
        )
        return [-F.col("weight"), tie]

    def _parallel_edge_agg(self, w):
        return F.max(w)


class UnionMaximumSpanningForest(Algorithm):
    """Union of ALL maximum spanning forests
    (``cpp/graph/UnionMaximumSpanningForest.cpp:11-82``): descending
    Kruskal that defers union-find merges until the weight level
    changes, so every edge of a level is judged against strictly-heavier
    edges only. Equivalent cut characterization implemented here: an
    edge (u,v,w) is in the UMSF iff u and v are in different connected
    components of the subgraph of edges with weight > w.

    Plan: one pass over the distinct weight levels in descending order;
    per level, edges whose endpoint labels (CC of the strictly-heavier
    prefix) differ join the forest, then the level's edges merge into
    the labels by hash-min on the contracted component graph. Round
    count is O(#levels) — fine for the quantized weight columns the
    backbone sparsifiers feed it; ``max_levels`` fails loudly when a
    continuous weight column should be bucketed first.
    """

    def __init__(self, graph: Graph, max_levels: int = 512) -> None:
        if graph.directed:
            raise ValueError("spanning forests need an undirected graph")
        super().__init__(graph)
        self.max_levels = max_levels
        self._forest: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        canon = (
            g.canonical()
            .select("src", "dst", "weight")
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )
        canon = mat.cut(0, canon)
        levels = [
            float(r["weight"])
            for r in canon.select("weight").distinct()
            .orderBy(F.desc("weight")).limit(self.max_levels + 1).collect()
        ]
        if len(levels) > self.max_levels:
            raise RuntimeError(
                f"more than {self.max_levels} distinct weight levels — "
                "bucket the weight column before UnionMaximumSpanningForest"
            )
        labels = mat.cut(0, g.vertices.select("id", F.col("id").alias("label")))
        forest: DataFrame | None = None
        for i, w in enumerate(levels, start=1):
            level_edges = canon.where(F.col("weight") == w)
            ls = labels.select(F.col("id").alias("src"), F.col("label").alias("lu"))
            ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("lv"))
            cross = (
                level_edges.join(ls.hint("shuffle_hash"), "src")
                .join(ld.hint("shuffle_hash"), "dst")
                .where(F.col("lu") != F.col("lv"))
                .transform(local_cut)
            )
            add = cross.select("src", "dst", "weight")
            forest = add if forest is None else forest.unionAll(add)
            forest = mat.cut(i, forest)
            # merge this level's component pairs (hash-min to fixpoint on
            # the contracted pair graph — tiny relative to the input)
            pairs = cross.select("lu", "lv").distinct()
            merge = pairs.select(
                F.col("lu").alias("a"), F.col("lv").alias("b")
            ).unionAll(
                pairs.select(F.col("lv").alias("a"), F.col("lu").alias("b"))
            ).transform(local_cut)
            comp_labels = (
                merge.select(F.col("a").alias("node"))
                .distinct()
                .select("node", F.col("node").alias("m"))
                .transform(local_cut)
            )
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
            labels = mat.cut(i, labels)
        self._forest = forest if forest is not None else spark.createDataFrame(
            [], "src long, dst long, weight double"
        )

    def get_forest(self) -> DataFrame:
        """``(src, dst, weight)`` — every edge in at least one maximum
        spanning forest (``inUMSF`` analog)."""
        self.assure_finished()
        return self._forest

    def in_umsf(self, u: int, v: int) -> bool:
        """``UnionMaximumSpanningForest::inUMSF(u, v)``."""
        self.assure_finished()
        a, b = (u, v) if u <= v else (v, u)
        return (
            self._forest.where(
                (F.col("src") == a) & (F.col("dst") == b)
            ).limit(1).count()
            > 0
        )


class RandomSpanningForest(Algorithm):
    """Uniformly random spanning forest via random walk
    (``cpp/components/RandomSpanningForest.cpp:19-51``): per connected
    component, walk from a random root; each first-entry edge joins the
    forest (Aldous–Broder — the resulting tree is uniform over the
    component's spanning trees).

    The walk is one sequential token over shared visited state —
    inherently unparallelizable — so (like the exact-LFR generator and
    :class:`~networkit_spark.operators.matching.PathGrowingMatcher`) it
    runs DRIVER-SIDE at fixture scale behind an edge-count ceiling.
    Engine-scale alternatives already in-tree: :class:`SpanningForest`
    (deterministic Borůvka) and :class:`RandomMaximumSpanningForest`
    (seeded random edge ORDER — random but not uniform over trees).
    Seeded and reproducible; the reference draws from its global URNG.
    """

    _MAX_DRIVER_EDGES = 2_000_000

    def __init__(self, graph: Graph, seed: int = 42) -> None:
        if graph.directed:
            raise ValueError("spanning forests are defined on undirected graphs")
        super().__init__(graph)
        self.seed = seed
        self._forest: list[tuple[int, int]] | None = None

    def _run(self) -> None:
        import random

        g = self.graph
        m = g.number_of_edges()
        if m > self._MAX_DRIVER_EDGES:
            raise ValueError(
                f"RandomSpanningForest is a sequential random-walk "
                f"algorithm ({m} edges > {self._MAX_DRIVER_EDGES}); use "
                "SpanningForest for engine-scale forests"
            )
        rng = random.Random(self.seed)
        adj: dict[int, list[int]] = {}
        for r in g.canonical().where(F.col("src") != F.col("dst")).collect():
            u, v = int(r["src"]), int(r["dst"])
            adj.setdefault(u, []).append(v)
            adj.setdefault(v, []).append(u)
        for nbrs in adj.values():
            nbrs.sort()
        nodes = sorted(int(r["id"]) for r in g.vertices.collect())
        # components driver-side (the reference runs ConnectedComponents)
        seen: set[int] = set()
        comps: list[list[int]] = []
        for s in nodes:
            if s in seen or s not in adj:
                if s not in adj and s not in seen:
                    seen.add(s)  # isolated vertex: empty tree
                continue
            stack, comp = [s], []
            seen.add(s)
            while stack:
                x = stack.pop()
                comp.append(x)
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            comps.append(sorted(comp))
        forest: list[tuple[int, int]] = []
        for comp in comps:
            root = comp[rng.randint(0, len(comp) - 1)]
            visited = {root}
            curr = root
            while len(visited) < len(comp):
                neigh = adj[curr][rng.randint(0, len(adj[curr]) - 1)]
                if neigh not in visited:
                    forest.append((min(curr, neigh), max(curr, neigh)))
                    visited.add(neigh)
                curr = neigh
        self._forest = forest

    def get_forest(self) -> DataFrame:
        """``(src, dst)`` tree edges (canonical src < dst), one tree per
        component (``SpanningForest::getForest`` view)."""
        self.assure_finished()
        spark = self.graph.edges.sparkSession
        rows = self._forest
        df = spark.createDataFrame(rows or [(0, 0)], "src long, dst long")
        return df.where(F.lit(bool(rows)))
