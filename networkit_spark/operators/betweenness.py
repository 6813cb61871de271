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
Brandes); undirected dependency sums are halved, matching the
reference's convention of counting each unordered pair once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Centrality
from networkit_spark.plans.iterate import Materializer


class ApproxBetweenness(Centrality):
    def __init__(
        self,
        graph: Graph,
        n_samples: int | None = None,
        seed: int = 42,
        normalized: bool = False,
        max_hops: int = 64,
    ) -> None:
        super().__init__(graph)
        self.n_samples = n_samples
        self.seed = seed
        self.normalized = normalized
        self.max_hops = max_hops

    def _sources(self) -> DataFrame:
        verts = self.graph.vertices
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
        sources = self._sources().localCheckpoint(eager=True)
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
        while d < self.max_hops:
            d += 1
            gathered = (
                nbrs.join(layer, nbrs.src == layer.id)
                .groupBy("source", F.col("dst").alias("nid"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            gathered = gathered.localCheckpoint(eager=True)
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
            upper_state = upper_state.localCheckpoint(eager=True)
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
            deltas = contrib.localCheckpoint(eager=True)
            per_node = deltas.where(F.col("id") != F.col("source"))
            acc = per_node if acc is None else acc.unionAll(per_node)
            acc = acc.localCheckpoint(eager=True)

        spark = g.edges.sparkSession
        if acc is None:
            self._scores = g.vertices.select("id", F.lit(0.0).alias("score"))
            nbrs.unpersist()
            return
        totals = acc.groupBy("id").agg(F.sum("delta").alias("score"))
        scale = 1.0
        if not g.directed:
            scale *= 0.5  # each unordered pair counted once
        if self.n_samples is not None and k > 0:
            scale *= n / k  # EstimateBetweenness scaling
        if self.normalized and n > 2:
            denom = (n - 1) * (n - 2) if g.directed else (n - 1) * (n - 2) / 2.0
            scale /= denom
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
    sources = bc._sources().localCheckpoint(eager=True)
    k = sources.count()
    n = g.number_of_nodes()
    layer = mat.cut(
        0, sources.select("source", F.col("source").alias("id"), F.lit(0).alias("dist"))
    )
    visited = layer
    harm: DataFrame | None = None
    d = 0
    while d < bc.max_hops:
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
        harm = harm.localCheckpoint(eager=True)
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
