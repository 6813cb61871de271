"""Betweenness centrality — batched multi-source Brandes.

Reference: ``Betweenness`` (``cpp/centrality/Betweenness.cpp``, exact
Brandes: one SSSP + dependency accumulation per source) and
``ApproxBetweenness`` / ``EstimateBetweenness`` (sampled sources,
``cpp/centrality/EstimateBetweenness.cpp``: scores scaled by ``n/k``).

Spark re-expression: instead of one BFS per source (the reference's
outer loop), ALL sample sources run in one **batched** frontier loop —
state rows are ``(source, id, dist, sigma)``, so one join-agg per hop
advances every source's BFS simultaneously; the backward dependency
sweep processes distance levels in descending order, again for all
sources at once. Rounds = O(diameter), independent of sample size; the
per-round shuffles grow with |sample| x |frontier| instead, which is the
right trade at cluster scale.

Unweighted shortest paths (hop counts) — the reference's Betweenness on
an unweighted graph. ``k = None`` uses every vertex as a source (exact
Brandes). Scaling matches the reference exactly: undirected scores are
NOT halved (``Betweenness.cpp`` accumulates over all sources; only
``maximum()`` divides by 2), sampled scores extrapolate by ``2n/k``
(``EstimateBetweenness.cpp:106``), and ``normalized`` divides by
``(n-1)(n-2)`` for both directed and undirected
(``Betweenness.cpp:88-92``, ``EstimateBetweenness.cpp:102,110``).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm, Centrality
from networkit_spark.plans.iterate import Materializer, local_cut


class ApproxBetweenness(Centrality):
    def __init__(
        self,
        graph: Graph,
        n_samples: int | None = None,
        seed: int = 42,
        normalized: bool = False,
        max_hops: int | None = None,
        sources: DataFrame | None = None,
    ) -> None:
        """``max_hops=None`` (default) runs BFS until the frontier is
        empty — required for exact scores; a finite cap truncates the
        search and warns if the frontier was still non-empty.

        ``sources`` — explicit sample: a ``(id)`` DataFrame of source
        vertices, overriding the hash-ordered draw (reproducible sampled
        runs, e.g. for cross-engine oracles); scores still extrapolate by
        ``2n/k`` like any sampled run (``EstimateBetweenness.cpp:106``).
        """
        super().__init__(graph)
        self.n_samples = n_samples
        self.seed = seed
        self.normalized = normalized
        self.max_hops = max_hops
        self.sources = sources

    @property
    def _sampled(self) -> bool:
        return self.n_samples is not None or self.sources is not None

    def _sources(self) -> DataFrame:
        verts = self.graph.vertices
        if self.sources is not None:
            return self.sources.select(F.col("id").alias("source"))
        if self.n_samples is None:
            return verts.select(F.col("id").alias("source"))
        # deterministic hash-ordered sample of k sources
        return (
            verts.select("id", F.xxhash64(F.lit(self.seed), F.col("id")).alias("h"))
            .orderBy("h")
            .limit(self.n_samples)
            .select(F.col("id").alias("source"))
        )

    def _run(self) -> None:
        g = self.graph
        mat = Materializer()
        nbrs = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        n = g.number_of_nodes()
        sources = self._sources().transform(local_cut)
        k = sources.count()

        # ---------- forward: batched BFS layers with path counts σ
        layer = mat.cut(
            0,
            sources.select(
                "source",
                F.col("source").alias("id"),
                F.lit(0).alias("dist"),
                F.lit(1.0).alias("sigma"),
            ),
        )
        visited = layer
        layers = [layer]
        d = 0
        truncated = False
        while True:
            if self.max_hops is not None and d >= self.max_hops:
                truncated = True
                break
            d += 1
            gathered = (
                nbrs.join(layer, nbrs.src == layer.id)
                .groupBy("source", F.col("dst").alias("nid"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            gathered = gathered.transform(local_cut)
            nxt = (
                gathered.join(
                    visited.select("source", F.col("id").alias("nid")),
                    ["source", "nid"],
                    "left_anti",
                )
                .select(
                    "source",
                    F.col("nid").alias("id"),
                    F.lit(d).alias("dist"),
                    "sigma",
                )
            )
            nxt = mat.cut(d, nxt)
            if nxt.limit(1).count() == 0:
                break
            layers.append(nxt)
            visited = mat.cut(d, visited.unionAll(nxt))
            layer = nxt
        if truncated:
            warnings.warn(
                f"betweenness BFS truncated at max_hops={self.max_hops} with a "
                "non-empty frontier; scores are approximate",
                RuntimeWarning,
                stacklevel=2,
            )

        # ---------- backward: dependency accumulation per level
        # delta(s,v) = Σ_{w ∈ succ(v)} σ_v/σ_w · (1 + delta(s,w))
        deltas: DataFrame | None = None  # states of level d+1 with delta
        acc: DataFrame | None = None  # accumulated (source, id, delta)
        for d in range(len(layers) - 1, 0, -1):
            upper = layers[d]
            if deltas is None:
                upper_state = upper.select(
                    "source", "id", "sigma", F.lit(0.0).alias("delta")
                )
            else:
                upper_state = upper.join(
                    deltas, ["source", "id"], "left"
                ).select(
                    "source",
                    "id",
                    "sigma",
                    F.coalesce("delta", F.lit(0.0)).alias("delta"),
                )
            upper_state = upper_state.transform(local_cut)
            lower = layers[d - 1]
            contrib = (
                nbrs.join(
                    upper_state.select(
                        F.col("id").alias("dst"),
                        "source",
                        F.col("sigma").alias("sigma_w"),
                        F.col("delta").alias("delta_w"),
                    ),
                    "dst",
                )
                .join(
                    lower.select(
                        F.col("id").alias("src"),
                        "source",
                        F.col("sigma").alias("sigma_v"),
                    ),
                    ["src", "source"],
                )
                .groupBy("source", F.col("src").alias("id"))
                .agg(
                    F.sum(
                        (F.col("sigma_v") / F.col("sigma_w"))
                        * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("delta")
                )
            )
            deltas = contrib.transform(local_cut)
            per_node = deltas.where(F.col("id") != F.col("source"))
            acc = per_node if acc is None else acc.unionAll(per_node)
            acc = acc.transform(local_cut)

        spark = g.edges.sparkSession
        if acc is None:
            self._scores = g.vertices.select("id", F.lit(0.0).alias("score"))
            nbrs.unpersist()
            return
        totals = acc.groupBy("id").agg(F.sum("delta").alias("score"))
        scale = 1.0
        if self._sampled and k > 0:
            # EstimateBetweenness.cpp:106 — always 2n/k, directed or not
            scale *= 2.0 * n / k
        if self.normalized and n > 2:
            # Betweenness.cpp:88-92 / EstimateBetweenness.cpp:102,110 —
            # (n-1)(n-2) pairs, no undirected halving
            scale /= (n - 1) * (n - 2)
        self._scores = (
            g.vertices.join(totals, "id", "left")
            .select(
                "id",
                (F.coalesce("score", F.lit(0.0)) * F.lit(scale)).alias("score"),
            )
        )
        nbrs.unpersist()


class Betweenness(ApproxBetweenness):
    """Exact Brandes: every vertex is a source
    (``cpp/centrality/Betweenness.cpp``)."""

    def __init__(self, graph: Graph, normalized: bool = False) -> None:
        super().__init__(graph, n_samples=None, normalized=normalized)


#: reference class name for the sampled-Brandes variant
#: (``cpp/centrality/EstimateBetweenness.cpp``) — this engine's
#: ApproxBetweenness implements exactly those semantics (k sampled
#: sources, 2n/k extrapolation)
EstimateBetweenness = ApproxBetweenness


class Closeness(Centrality):
    """Closeness centrality (``cpp/centrality/Closeness.cpp``).

    Batched BFS from EVERY node at once (state rows ``(source, id,
    dist)``; one join-agg per hop layer, rounds = O(diameter)); per
    source ``sum = Σ dist``, ``reached`` = |BFS tree|, then
    ``updateScoreData`` (``include/networkit/centrality/Closeness.hpp:
    78-93``): standard → ``1/sum`` (×(n−1) if normalized; requires a
    connected graph, ctor check ``Closeness.cpp:32-49``), generalized →
    ``(reached−1)/sum/(n−1)`` (×(reached−1) if normalized). Unweighted
    hop distances (the reference's BFS path; Dijkstra is out of scope).
    """

    def __init__(
        self,
        graph: Graph,
        normalized: bool = False,
        variant: str = "generalized",
        check_connectedness: bool = True,
    ) -> None:
        super().__init__(graph)
        if variant not in ("standard", "generalized"):
            raise ValueError("variant must be 'standard' or 'generalized'")
        self.normalized = normalized
        self.variant = variant
        self.check_connectedness = check_connectedness

    def _run(self) -> None:
        g = self.graph
        if self.variant == "standard" and self.check_connectedness:
            from networkit_spark.operators.components import (
                ConnectedComponents,
                WeaklyConnectedComponents,
            )
            from networkit_spark.operators.scc import StronglyConnectedComponents

            algo = (
                StronglyConnectedComponents(g)
                if g.directed
                else ConnectedComponents(g)
            )
            if algo.run().number_of_components() > 1:
                raise RuntimeError(
                    "standard closeness is undefined on disconnected graphs; "
                    "use the generalized variant (Closeness.cpp:43-48)"
                )
        mat = Materializer()
        nbrs = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        n = g.number_of_nodes()
        layer = mat.cut(
            0,
            g.vertices.select(
                F.col("id").alias("source"), "id", F.lit(0).alias("dist")
            ),
        )
        visited = layer
        sums: DataFrame | None = None  # (source, sum_d, reached) per level
        d = 0
        while True:
            d += 1
            nxt = (
                nbrs.join(layer, nbrs.src == layer.id)
                .select("source", F.col("dst").alias("id"))
                .distinct()
                .join(visited.select("source", "id"), ["source", "id"], "left_anti")
                .select("source", "id", F.lit(d).alias("dist"))
            )
            nxt = mat.cut(d, nxt)
            if nxt.limit(1).count() == 0:
                break
            inc = nxt.groupBy("source").agg(
                F.sum("dist").cast("double").alias("sum_d"),
                F.count(F.lit(1)).alias("reached"),
            )
            sums = inc if sums is None else sums.unionAll(inc)
            sums = sums.transform(local_cut)
            visited = mat.cut(d, visited.unionAll(nxt))
            layer = nxt
        nbrs.unpersist()
        if sums is None:
            self._scores = g.vertices.select("id", F.lit(0.0).alias("score"))
            return
        totals = sums.groupBy("source").agg(
            F.sum("sum_d").alias("sum_d"),
            (F.sum("reached") + 1).alias("reached"),  # +1 = the source itself
        )
        if self.variant == "standard":
            score = F.when(F.col("sum_d") > 0, 1.0 / F.col("sum_d")).otherwise(0.0)
            if self.normalized:
                score = score * (n - 1)
        else:
            score = F.when(
                F.col("sum_d") > 0,
                (F.col("reached") - 1) / F.col("sum_d") / F.lit(float(n - 1)),
            ).otherwise(0.0)
            if self.normalized:
                score = score * (F.col("reached") - 1)
        scored = totals.select(F.col("source").alias("id"), score.alias("score"))
        self._scores = (
            self.graph.vertices.join(scored, "id", "left")
            .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
        )


class HarmonicCloseness(Centrality):
    """``HarmonicCloseness.cpp``: ``h(v) = Σ_{w≠v, d<∞} 1/d(v,w)``;
    ``normalized`` divides by n−1 (``HarmonicCloseness.cpp:45-47``)."""

    def __init__(self, graph: Graph, normalized: bool = False) -> None:
        super().__init__(graph)
        self.normalized = normalized

    def _run(self) -> None:
        scores = harmonic_closeness(self.graph)
        if self.normalized:
            n = self.graph.number_of_nodes()
            scores = scores.select("id", (F.col("score") / (n - 1)).alias("score"))
        self._scores = scores


class TopCloseness(Algorithm):
    """Top-k closeness (``cpp/centrality/TopCloseness.cpp``): the k
    highest-closeness vertices with the ranking tie rule (score desc,
    id asc — ``Centrality.cpp:33-38``). The reference prunes BFS trees
    per-node (a sequential optimization); here the batched all-source
    BFS already amortizes every source through the same join-agg rounds,
    so exact scores + top-k is the natural distributed plan.

    Accessors mirror the reference: ``topkNodesList()`` /
    ``topkScoresList()``.
    """

    _score_cls = Closeness
    _score_kwargs = {"variant": "generalized"}

    def __init__(self, graph: Graph, k: int = 1) -> None:
        super().__init__(graph)
        self.k = k
        self._top: DataFrame | None = None

    def _run(self) -> None:
        algo = self._score_cls(self.graph, **self._score_kwargs).run()
        self._top = (
            algo.scores()
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(self.k)
            .transform(local_cut)
        )

    def topk(self) -> DataFrame:
        self.assure_finished()
        return self._top

    def topk_nodes_list(self) -> list[int]:
        self.assure_finished()
        return [r["id"] for r in self._top.collect()]

    def topk_scores_list(self) -> list[float]:
        self.assure_finished()
        return [r["score"] for r in self._top.collect()]


class TopHarmonicCloseness(TopCloseness):
    """Top-k harmonic closeness
    (``cpp/centrality/TopHarmonicCloseness.cpp``)."""

    _score_cls = HarmonicCloseness
    _score_kwargs = {}


def harmonic_closeness(graph: Graph, n_samples: int | None = None, seed: int = 42) -> DataFrame:
    """Harmonic closeness ``h(u) = Σ_{v≠u} 1/d(u,v)`` from the same
    batched BFS layers (``cpp/centrality/HarmonicCloseness.cpp``
    semantics on unweighted graphs); sampled variant scales by n/k.

    Uses reverse BFS (distances TO u) on directed graphs, which equals
    forward distances on undirected ones.
    """
    bc = ApproxBetweenness(graph.transpose() if graph.directed else graph,
                           n_samples=n_samples, seed=seed)
    g = bc.graph
    mat = Materializer()
    nbrs = (
        (g.edges if g.directed else g.symmetrized())
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    sources = bc._sources().transform(local_cut)
    k = sources.count()
    n = g.number_of_nodes()
    layer = mat.cut(
        0, sources.select("source", F.col("source").alias("id"), F.lit(0).alias("dist"))
    )
    visited = layer
    harm: DataFrame | None = None
    d = 0
    while bc.max_hops is None or d < bc.max_hops:
        d += 1
        nxt = (
            nbrs.join(layer, nbrs.src == layer.id)
            .select("source", F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("source", "id"), ["source", "id"], "left_anti")
            .select("source", "id", F.lit(d).alias("dist"))
        )
        nxt = mat.cut(d, nxt)
        if nxt.limit(1).count() == 0:
            break
        # source s at distance d from node id contributes 1/d to h(id)
        inc = nxt.groupBy("id").agg((F.count(F.lit(1)) / d).alias("h"))
        harm = inc if harm is None else harm.unionAll(inc)
        harm = harm.transform(local_cut)
        visited = mat.cut(d, visited.unionAll(nxt))
        layer = nxt
    nbrs.unpersist()
    spark = g.edges.sparkSession
    if harm is None:
        return g.vertices.select("id", F.lit(0.0).alias("score"))
    scale = (n / k) if (n_samples is not None and k) else 1.0
    totals = harm.groupBy("id").agg((F.sum("h") * F.lit(scale)).alias("score"))
    return g.vertices.join(totals, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
