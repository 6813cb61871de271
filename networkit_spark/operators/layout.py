"""Graph layout — the reference's ``viz/`` directory re-expressed.

Reference surface:

- ``cpp/viz/PivotMDS.cpp:15-144`` + ``include/networkit/viz/PivotMDS.hpp:23-60``
  — Brandes/Pich pivot MDS: Dijkstra distances from ``numPivots`` random
  pivots, double-center the n×k distance matrix C (NOTE: the reference
  centers the RAW distances, not squared ones, despite its own comment —
  we match the code, not the comment), power-iterate ``CᵀC`` with
  deflation for the top ``dim`` eigenvectors, coordinates = ``C·v_d``.
- ``include/networkit/viz/GraphLayoutAlgorithm.hpp:14-150`` — base with
  ``getCoordinates`` / ``numEdgeCrossings`` / ``writeGraphToGML`` (50×
  coordinate scale in the GML graphics block).

Spark re-expression (nothing n×n ever materializes driver-side):

- pivot distances: ONE batched k-source weighted SSSP — state rows
  ``(p, id, d)``, one relaxation join-agg per round, all pivots in the
  same frontier (the ApproxCloseness round shape);
- double centering: two groupBy aggregates (row means over pivots, col
  means over nodes) + one scalar, then a single join-project;
- ``CᵀC``: k×k Gram via Arrow-batched partial outer products
  (``mapInPandas`` — one numpy ``C_bᵀC_b`` per record batch, driver sums
  the k×k partials; no per-row Python);
- power method + deflation: driver-side numpy on the k×k Gram
  (mirrors ``PivotMDS::powerMethod``: tol 1e-6, cap 1500 rounds);
- coordinates: ``C·v_d`` as one literal ``zip_with``/``aggregate`` dot
  product per dimension — a projection, no shuffle.

Documented divergences: pivots come from the seeded hash-order sampler
(`graphtools.random_nodes`) and the power-method start vector from a
seeded numpy RandomState — distribution twins of the reference's global
URNG draws (same contract as every other seeded sampler here). Node
pairs unreached from a pivot keep structural zeros in C exactly like
the reference's missing CSR triplets (they are NOT centered).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.graphtools import random_nodes
from networkit_spark.plans.iterate import Materializer


def multi_source_weighted_distances(
    graph: Graph, sources: list[int] | None, max_rounds: int = 10_000
) -> DataFrame:
    """Batched k-source weighted SSSP: ``(s, id, d)`` for every reached
    pair. One relaxation join-agg per round over the persisted
    hash-partitioned adjacency; rounds = weighted-hop radius, the
    frontier carries all sources at once so adding sources adds rows,
    not rounds. Directed graphs relax out-edges (``forNeighborsOf``
    semantics), undirected both directions. ``sources=None`` runs from
    EVERY vertex — O(n·reachable) state, the fixture-scale diagnostic
    path (the reference's n sequential Dijkstras are the same class).
    """
    g = graph
    spark = g.edges.sparkSession
    mat = Materializer()
    if g.edges.where(F.col("weight") < 0).limit(1).count():
        raise ValueError("weighted SSSP requires non-negative weights")
    adj = (
        (g.edges if g.directed else g.symmetrized())
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("w"))
    )
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = adj.repartition(shuffle_parts, "src").persist()
    if sources is None:
        state = g.vertices.select(
            F.col("id").alias("s"), "id", F.lit(0.0).alias("d")
        )
    else:
        state = spark.createDataFrame(
            [(int(s), int(s), 0.0) for s in sources], "s long, id long, d double"
        )
    state = mat.cut(0, state.withColumn("improved", F.lit(True)))
    for rnd in range(1, max_rounds + 1):
        frontier = state.where("improved")
        if frontier.limit(1).count() == 0:
            break
        gathered = (
            adj.join(
                frontier.select(
                    F.col("id").alias("src"), "s", F.col("d").alias("du")
                ).hint("shuffle_hash"),
                "src",
            )
            .groupBy("s", F.col("dst").alias("id"))
            .agg(F.min(F.col("du") + F.col("w")).alias("cand"))
        )
        merged = (
            state.select("s", "id", "d")
            .join(gathered, ["s", "id"], "full_outer")
            .select(
                "s",
                "id",
                F.least(
                    F.coalesce("d", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("d"),
                (F.col("d").isNull() | (F.col("cand") < F.col("d"))).alias(
                    "improved"
                ),
            )
        )
        state = mat.cut(rnd, merged)
    else:
        adj.unpersist()
        raise RuntimeError(f"k-source SSSP did not settle in {max_rounds} rounds")
    adj.unpersist()
    return state.select("s", "id", "d")


class LayoutAlgorithm(Algorithm):
    """``GraphLayoutAlgorithm`` surface: ``coordinates()`` is the
    ``(id, pos array<double>)`` frame; ``write_gml_layout`` mirrors
    ``writeGraphToGML`` (fixture-scale driver writer, 50× scale)."""

    def __init__(self, graph: Graph, dim: int) -> None:
        super().__init__(graph)
        self.dim = int(dim)
        self._coords: DataFrame | None = None

    def coordinates(self) -> DataFrame:
        self.assure_finished()
        return self._coords

    def write_gml_layout(self, path: str) -> bool:
        """``GraphLayoutAlgorithm::writeGraphToGML`` — GML with a
        ``graphics [ x .. y .. (z ..) ]`` block per node, coordinates
        scaled by 50 (``GraphLayoutAlgorithm.hpp:76-96``). Driver-side
        fixture-scale writer (same class as the other GML/DOT writers);
        returns False for dim outside 2..3 like the reference."""
        if self.dim < 2 or self.dim > 3:
            return False
        self.assure_finished()
        coords = {
            int(r["id"]): list(r["pos"])
            for r in self._coords.collect()
        }
        g = self.graph
        edges = (
            g.edges.select("src", "dst")
            if g.directed
            else g.edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            ).distinct()
        ).collect()
        with open(path, "w") as fh:
            fh.write("graph [\n")
            if g.directed:
                fh.write("  directed 1\n")
            for u in sorted(coords):
                p = coords[u]
                fh.write("  node [\n")
                fh.write(f"    id {u}\n")
                fh.write("    graphics\n")
                fh.write(f"    [ x {50 * p[0]}\n")
                fh.write(f"      y {50 * p[1]}\n")
                if self.dim == 3:
                    fh.write(f"      z {50 * p[2]}\n")
                fh.write("    ]\n")
                fh.write("  ]\n")
            for r in edges:
                fh.write("  edge [\n")
                fh.write(f"    source {int(r['src'])}\n")
                fh.write(f"    target {int(r['dst'])}\n")
                fh.write("  ]\n")
            fh.write("]\n")
        return True


class PivotMDS(LayoutAlgorithm):
    """Pivot MDS (``cpp/viz/PivotMDS.cpp:18-121``): see module doc for
    the plan shape. ``coordinates()`` → ``(id, pos array<double>)``
    with ``pos[d] = (C·v_d)`` for the top-``dim`` deflated eigenvectors
    of ``CᵀC``."""

    def __init__(
        self, graph: Graph, dim: int = 2, num_pivots: int = 16, seed: int = 42
    ) -> None:
        if dim <= 0 or num_pivots <= 0:
            raise ValueError("dim and num_pivots must be positive")
        super().__init__(graph, dim)
        self.num_pivots = int(num_pivots)
        self.seed = int(seed)

    def _run(self) -> None:
        import numpy as np

        g = self.graph
        n = g.number_of_nodes()
        if self.num_pivots > n:
            raise ValueError("num_pivots exceeds the number of nodes")
        k = self.num_pivots
        pivots = sorted(
            int(r["id"]) for r in random_nodes(g, k, self.seed).collect()
        )
        pidx = {p: j for j, p in enumerate(pivots)}
        # (p, id, d) for reached pairs — the sparse triplet set
        dist = multi_source_weighted_distances(g, pivots)
        jmap = F.create_map(
            *[x for p, j in pidx.items() for x in (F.lit(p), F.lit(j))]
        )
        trip = dist.select(
            jmap[F.col("s")].alias("j"), "id", F.col("d").alias("v")
        ).persist()
        # double centering over EXISTING triplets (missing pairs stay
        # structural zeros, PivotMDS.cpp:43-65)
        row_mean = trip.groupBy("id").agg(
            (F.sum("v") / float(k)).alias("rm")
        )
        col_means_rows = (
            trip.groupBy("j").agg((F.sum("v") / float(n)).alias("cm")).collect()
        )
        cm = [0.0] * k
        for r in col_means_rows:
            cm[int(r["j"])] = float(r["cm"])
        grand = float(
            row_mean.agg(F.sum(F.col("rm") / (2.0 * n))).collect()[0][0] or 0.0
        ) + sum(cm) / (2.0 * k)
        cm_lit = F.array(*[F.lit(x) for x in cm])
        centered = (
            trip.join(row_mean, "id")
            .select(
                "id",
                "j",
                (
                    F.col("v")
                    - F.col("rm")
                    - cm_lit[F.col("j")]
                    + F.lit(grand)
                ).alias("c"),
            )
        )
        # dense k-vector per node; unreached slots coalesce to 0.0
        rows_c = (
            centered.groupBy("id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("j", "c"))
                ).alias("m")
            )
            .select(
                "id",
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda j: F.coalesce(F.col("m")[j], F.lit(0.0)),
                ).alias("row"),
            )
            .persist()
        )
        trip.unpersist()

        # CᵀC: Arrow-batched partial Gram products, driver sum
        def gram_partials(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import numpy as np  # noqa: F811 — executor-side import

            for b in batches:
                if len(b) == 0:
                    continue
                C = np.array(b["row"].tolist(), dtype=np.float64)
                yield pd.DataFrame({"g": [(C.T @ C).ravel().tolist()]})

        partials = rows_c.select("row").mapInPandas(
            gram_partials, schema="g array<double>"
        ).collect()
        CC = np.zeros((k, k))
        for r in partials:
            CC += np.asarray(r["g"], dtype=np.float64).reshape(k, k)

        # power method + deflation (PivotMDS.cpp:74-103,123-142)
        rng = np.random.RandomState(self.seed)
        eigvecs = []
        for _ in range(self.dim):
            v = 2.0 * rng.random_sample(k) - 1.0
            for _ in range(1500):
                old = v
                v = CC @ old
                v = v / np.linalg.norm(v)
                if np.linalg.norm(v - old) <= 1e-6:
                    break
            lam = float((CC @ v) @ v / (v @ v))
            eigvecs.append(v.copy())
            CC = CC - (lam / float(v @ v)) * np.outer(v, v)

        # pos[d] = C·v_d — one literal dot product per dimension
        pos_cols = [
            F.aggregate(
                F.zip_with(
                    F.col("row"),
                    F.array(*[F.lit(float(x)) for x in v]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"p{d}")
            for d, v in enumerate(eigvecs)
        ]
        coords = rows_c.select("id", *pos_cols)
        # nodes unreachable from every pivot have a zero C row → origin;
        # materialize (lineage cut) BEFORE dropping rows_c so repeated
        # coordinates() actions don't re-run the centering pipeline
        self._coords = Materializer().cut(
            1,
            g.vertices.join(coords, "id", "left").select(
                "id",
                F.array(
                    *[
                        F.coalesce(F.col(f"p{d}"), F.lit(0.0))
                        for d in range(self.dim)
                    ]
                ).alias("pos"),
            ),
        )
        rows_c.unpersist()


def _hash_unit(seed: int, lane: int) -> F.Column:
    """Seeded uniform in [-1, 1) from (id, lane) — partition-invariant."""
    h = F.xxhash64(F.lit(int(seed)), F.col("id"), F.lit(int(lane)))
    return 2.0 * (F.pmod(h, F.lit(1_000_003)) / 1_000_003.0) - 1.0


class MaxentStress(LayoutAlgorithm):
    """Maxent-stress layout (Gansner/Hu/North model as implemented in
    ``cpp/viz/MaxentStress.cpp:26-725``, header
    ``include/networkit/viz/MaxentStress.hpp``): minimize stress over
    the known-distance set S (edges, optionally the k-hop ball, or
    algebraic distances) with a maximum-entropy regularizer over all
    other pairs, by repeated Laplacian solves
    ``L_{1/d²} x_new = rhs(x_old)`` under an alpha-cooling schedule
    (alpha 1.0 ×0.3 down to 0.008, ≤``max_solves_per_alpha`` solves per
    level, convergence ‖Δx‖²/‖x‖² < 0.001²).

    Spark re-expression:

    - S (``computeKnownDistances``, MaxentStress.cpp:453-559): direct
      neighbors carry the edge weight; for ``k>1`` the 2..k-hop pairs
      come from ONE batched bounded BFS (state ``(s, id, depth)``) —
      hop counts on unweighted graphs, true weighted distances (batched
      all-source relaxation, the reference's n Dijkstras) on weighted
      ones. ``graph_distance='algebraic_distance'`` reuses the Jacobi
      load smoother (`linkprediction.algebraic_distance_scores`) with
      the reference's ≤k-hop pair set, degree normalization and
      log-remap (MaxentStress.cpp:565-613).
    - rhs (``computeCoordinateLaplacianTerm``, MaxentStress.cpp:379-400):
      two hash joins (both endpoint coordinates onto S) + one
      aggregation per solve — the triangle-family shape.
    - solve: the batched distributed CG Laplacian solver
      (`algebraic.laplacian_cg_solve`) with all ``dim`` systems in one
      state frame. The reference's LAMG backend is a preconditioner
      choice; CG is its CONJUGATE_GRADIENT_IDENTITY_PRECONDITIONER
      configuration. CG returns the mean-zero (pseudoinverse) solution
      — the reference's zero-sum rhs correction makes its solutions
      mean-consistent the same way; any residual difference is a global
      translation, which stress is invariant to.
    - entropy/repulsive term (``approxRepulsiveForces``,
      MaxentStress.cpp:428-451): the reference approximates with an
      octree (theta = 0.6) — HERE a flat-grid Barnes–Hut analog: bucket
      nodes into a ``cells_per_axis``-per-dimension grid over the
      bounding box, one aggregation for per-cell count + center of
      mass, then every node sums the broadcast cell table (own cell =
      leave-one-out COM ``(S_c − x_i)/(c−1)`` with ``c−1`` nodes).
      Same approximation family (bounded decomposition of the pair
      sum), recomputed on the reference's ``floor(5·ln(numSolves))``
      refresh schedule, L2-normalized per dimension.
    - initial layout (``randomSphereCoordinates``, MaxentStress.cpp:
      643-695): BFS-tree placement from the max-degree root, children
      at parent + w·(seeded unit vector), one round per BFS level
      (min-parent tie rule and hash draws replace the reference's
      queue order and global URNG — documented distribution twin).
      Pass ``coordinates=`` (e.g. a ``PivotMDS.coordinates()`` frame)
      to skip it, the reference test harness's own usage.

    Like the reference, raises on disconnected input, and sets
    ``q = 0.8`` when >30% of vertices have degree 1
    (MaxentStress.cpp:518-526).
    """

    EDGE_WEIGHT = "edge_weight"
    ALGEBRAIC_DISTANCE = "algebraic_distance"

    def __init__(
        self,
        graph: Graph,
        dim: int = 2,
        k: int = 1,
        tolerance: float = 1e-5,
        coordinates: DataFrame | None = None,
        fast_computation: bool = False,
        graph_distance: str = "edge_weight",
        seed: int = 42,
        max_solves_per_alpha: int = 50,
        cells_per_axis: int = 8,
        cg_max_iters: int = 300,
        solver: str = "cg",
    ) -> None:
        if dim <= 0 or k <= 0:
            raise ValueError("dim and k must be positive")
        if graph_distance not in (self.EDGE_WEIGHT, self.ALGEBRAIC_DISTANCE):
            raise ValueError(f"unknown graph_distance {graph_distance!r}")
        # the reference's LinearSolverType: "cg" = identity-precond CG,
        # "cg_diagonal" = DiagonalPreconditioner PCG; LAMG is a further
        # preconditioner choice behind the same solve contract (⏭)
        if solver not in ("cg", "cg_diagonal"):
            raise ValueError(f"unknown solver {solver!r}")
        super().__init__(graph, dim)
        self.k = int(k)
        self.tolerance = float(tolerance)
        self.provided = coordinates
        self.fast_computation = bool(fast_computation)
        self.graph_distance = graph_distance
        self.seed = int(seed)
        self.max_solves_per_alpha = int(max_solves_per_alpha)
        self.cells_per_axis = int(cells_per_axis)
        self.cg_max_iters = int(cg_max_iters)
        self.solver = solver
        # model knobs + reference defaults (MaxentStress.cpp:26)
        self.q = 0.0
        self.alpha = 1.0
        self.alpha_reduction = 0.3
        self.final_alpha = 0.008
        self.conv_threshold = 0.001 * 0.001
        self._known: DataFrame | None = None

    # knob setters mirroring the reference (MaxentStress.hpp:184-212)
    def set_q(self, q: float) -> None:
        self.q = float(q)

    def set_alpha(self, alpha: float) -> None:
        self.alpha = float(alpha)

    def set_alpha_reduction(self, r: float) -> None:
        self.alpha_reduction = float(r)

    def set_final_alpha(self, a: float) -> None:
        self.final_alpha = float(a)

    def set_convergence_threshold(self, t: float) -> None:
        self.conv_threshold = float(t) * float(t)

    # ------------------------------------------------------------ S
    def _hop_pairs(self, max_depth: int) -> DataFrame:
        """``(s, id, depth)`` for 1 ≤ depth ≤ max_depth — one batched
        bounded BFS from every vertex."""
        g = self.graph
        mat = Materializer()
        nbrs = (
            g.symmetrized()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        layer = g.vertices.select(F.col("id").alias("s"), "id")
        visited = mat.cut(0, layer.withColumn("depth", F.lit(0)))
        out = None
        for depth in range(1, max_depth + 1):
            nxt = (
                nbrs.join(layer.hint("shuffle_hash"), nbrs.src == layer.id)
                .select("s", F.col("dst").alias("id"))
                .distinct()
                .join(visited.select("s", "id"), ["s", "id"], "left_anti")
            )
            nxt = mat.cut(depth, nxt)
            if nxt.limit(1).count() == 0:
                break
            lv = nxt.withColumn("depth", F.lit(depth))
            visited = mat.cut(100 + depth, visited.unionAll(lv))
            out = lv if out is None else out.unionAll(lv)
            layer = nxt
        nbrs.unpersist()
        if out is None:
            spark = g.edges.sparkSession
            return spark.createDataFrame([], "s long, id long, depth int")
        return out

    def _known_distances(self) -> DataFrame:
        """Symmetric ``(src, dst, d)`` — the known-distance set S
        (``computeKnownDistances``, MaxentStress.cpp:453-559)."""
        g = self.graph
        direct = (
            g.symmetrized()
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.min("weight").alias("d"))
        )
        if self.graph_distance == self.ALGEBRAIC_DISTANCE:
            from networkit_spark.operators.linkprediction import (
                algebraic_distance_scores,
            )

            ball = self._hop_pairs(self.k).where(F.col("s") < F.col("id"))
            pairs = ball.select(F.col("s").alias("u"), F.col("id").alias("v"))
            # distance.AlgebraicDistance defaults: 10 systems, 30 Jacobi
            # rounds, omega 0.5, max-norm, min-max load normalization
            # (AlgebraicDistance.cpp:28-97)
            ad = algebraic_distance_scores(
                g, pairs, num_systems=10, num_iterations=30, omega=0.5,
                norm=0, seed=self.seed, normalize_loads=True,
            )
            deg = g.degrees().select("id", F.col("out_deg").alias("deg"))
            scored = (
                ad.join(deg.withColumnRenamed("id", "u"), "u")
                .withColumnRenamed("deg", "deg_u")
                .join(deg.withColumnRenamed("id", "v"), "v")
                .select(
                    "u", "v",
                    (
                        F.when(F.col("score") == 0.0, F.lit(1e-5)).otherwise(
                            F.col("score")
                        )
                        / F.sqrt(F.col("deg_u") * F.col("deg"))
                    ).alias("raw"),
                )
            ).persist()
            lohi = scored.agg(
                F.min("raw").alias("lo"), F.max("raw").alias("hi")
            ).collect()[0]
            lo, hi = float(lohi["lo"]), float(lohi["hi"])
            span = (hi - lo) if hi > lo else 1.0
            # log remap (MaxentStress.cpp:609-613)
            remapped = scored.select(
                "u", "v",
                F.log(
                    F.lit(2.0) + (F.col("raw") - F.lit(lo)) / span * 11.0
                ).alias("d"),
            )
            return remapped.select(
                F.col("u").alias("src"), F.col("v").alias("dst"), "d"
            ).unionAll(
                remapped.select(
                    F.col("v").alias("src"), F.col("u").alias("dst"), "d"
                )
            )
        if self.k == 1:
            return direct
        ball_all = self._hop_pairs(self.k)
        ball = ball_all.where(F.col("depth") >= 2)
        if not g.weighted:
            extra = ball.select(
                F.col("s").alias("src"),
                F.col("id").alias("dst"),
                F.col("depth").cast("double").alias("d"),
            )
        else:
            wd = self._ball_weighted_distances(ball_all)
            extra = ball.join(
                wd,
                (ball.s == wd.s) & (ball.id == wd.id),
            ).select(
                ball.s.alias("src"), ball.id.alias("dst"), F.col("d")
            )
        return direct.unionAll(extra)

    def _ball_weighted_distances(self, ball_all: DataFrame) -> DataFrame:
        """Weighted distances for the k-hop-ball pairs — a batched
        all-source relaxation whose state is RESTRICTED to the ball
        pairs (one semi-join per round), so executor state is
        O(Σ|ball_k|), never O(n²).

        Documented divergence from ``addKNeighborhoodOfVertex``
        (MaxentStress.cpp:498-518): the reference's per-source Dijkstra
        may route a ball member's shortest path through nodes OUTSIDE
        the k-hop ball; here paths are ball-internal, so a distance can
        read higher than the reference's exactly when the true shortest
        path leaves the ball — the price of a bounded distributed state
        for what is a locality heuristic to begin with.
        """
        g = self.graph
        mat = Materializer()
        adj = (
            g.symmetrized()
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.min("weight").alias("w"))
        )
        spark = g.edges.sparkSession
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        adj = adj.repartition(shuffle_parts, "src").persist()
        allowed = ball_all.select("s", "id").persist()
        state = g.vertices.select(
            F.col("id").alias("s"), "id", F.lit(0.0).alias("d")
        ).withColumn("improved", F.lit(True))
        state = mat.cut(0, state)
        for rnd in range(1, 10_001):
            frontier = state.where("improved")
            if frontier.limit(1).count() == 0:
                break
            gathered = (
                adj.join(
                    frontier.select(
                        F.col("id").alias("src"), "s", F.col("d").alias("du")
                    ).hint("shuffle_hash"),
                    "src",
                )
                .groupBy("s", F.col("dst").alias("id"))
                .agg(F.min(F.col("du") + F.col("w")).alias("cand"))
                .join(allowed, ["s", "id"], "left_semi")
            )
            merged = (
                state.select("s", "id", "d")
                .join(gathered, ["s", "id"], "full_outer")
                .select(
                    "s", "id",
                    F.least(
                        F.coalesce("d", F.lit(float("inf"))),
                        F.coalesce("cand", F.lit(float("inf"))),
                    ).alias("d"),
                    (
                        F.col("d").isNull() | (F.col("cand") < F.col("d"))
                    ).alias("improved"),
                )
            )
            state = mat.cut(rnd, merged)
        else:
            adj.unpersist()
            allowed.unpersist()
            raise RuntimeError("ball-restricted SSSP did not settle")
        adj.unpersist()
        allowed.unpersist()
        return state.select("s", "id", "d")

    # --------------------------------------------------- initial layout
    def _initial_coordinates(self) -> DataFrame:
        g = self.graph
        if self.provided is not None:
            if "pos" in self.provided.columns:
                return self.provided.select(
                    "id",
                    *[
                        F.col("pos")[d].alias(f"c{d}")
                        for d in range(self.dim)
                    ],
                )
            return self.provided.select(
                "id", *[F.col(f"c{d}") for d in range(self.dim)]
            )
        # BFS-tree sphere placement (randomSphereCoordinates,
        # MaxentStress.cpp:643-695)
        mat = Materializer()
        deg = g.degrees()
        root = int(
            deg.orderBy(F.col("out_deg").desc(), F.col("id").asc())
            .limit(1)
            .collect()[0]["id"]
        )
        sym = (
            g.symmetrized()
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.min("weight").alias("w"))
            .persist()
        )
        zero = [F.lit(0.0).alias(f"c{d}") for d in range(self.dim)]
        placed = mat.cut(
            0,
            g.vertices.where(F.col("id") == root).select("id", *zero),
        )
        frontier = placed
        rnd = 0
        while True:
            rnd += 1
            cand = (
                sym.join(
                    frontier.select(
                        F.col("id").alias("src"),
                        *[
                            F.col(f"c{d}").alias(f"p{d}")
                            for d in range(self.dim)
                        ],
                    ).hint("shuffle_hash"),
                    "src",
                )
                .join(
                    placed.select(F.col("id").alias("dst")),
                    "dst",
                    "left_anti",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(
                    F.min(
                        F.struct(
                            "src", "w",
                            *[F.col(f"p{d}") for d in range(self.dim)],
                        )
                    ).alias("par")
                )
            )
            draws = [
                _hash_unit(self.seed, d) for d in range(self.dim)
            ]
            norm = F.greatest(
                F.sqrt(sum(x * x for x in draws)), F.lit(1e-12)
            )
            nxt = cand.select(
                "id",
                *[
                    (
                        F.col("par")[f"p{d}"]
                        + F.col("par")["w"] * draws[d] / norm
                    ).alias(f"c{d}")
                    for d in range(self.dim)
                ],
            )
            nxt = mat.cut(rnd, nxt)
            if nxt.limit(1).count() == 0:
                break
            placed = mat.cut(100 + rnd, placed.unionAll(nxt))
            frontier = nxt
        sym.unpersist()
        return placed

    # ------------------------------------------------------- per-solve
    def _rhs(self, S: DataFrame, coords: DataFrame) -> DataFrame:
        """``computeCoordinateLaplacianTerm`` (MaxentStress.cpp:379-400):
        rhs_i = Σ_{j∈S(i)} (d_ij⁻²·d_ij/‖x_i−x_j‖)·(x_i − x_j),
        distances floored at 1e-5."""
        cu = coords.select(
            F.col("id").alias("src"),
            *[F.col(f"c{d}").alias(f"u{d}") for d in range(self.dim)],
        )
        cv = coords.select(
            F.col("id").alias("dst"),
            *[F.col(f"c{d}").alias(f"v{d}") for d in range(self.dim)],
        )
        dist = F.greatest(
            F.sqrt(
                sum(
                    (F.col(f"u{d}") - F.col(f"v{d}"))
                    * (F.col(f"u{d}") - F.col(f"v{d}"))
                    for d in range(self.dim)
                )
            ),
            F.lit(1e-5),
        )
        w = (1.0 / (F.col("d") * F.col("d"))) * F.col("d") / dist
        return (
            S.join(cu.hint("shuffle_hash"), "src")
            .join(cv.hint("shuffle_hash"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(
                *[
                    F.sum(w * (F.col(f"u{d}") - F.col(f"v{d}"))).alias(
                        f"b{d}"
                    )
                    for d in range(self.dim)
                ]
            )
        )

    def _repulsive(self, coords: DataFrame) -> DataFrame:
        """Flat-grid Barnes–Hut analog of ``approxRepulsiveForces``
        (MaxentStress.cpp:428-451): per-cell COM/count table broadcast
        against every node; own cell = leave-one-out COM. Result is
        L2-normalized per dimension like the reference."""
        qsign = 1.0 if self.q >= 0.0 else -1.0
        q2 = (self.q + 2.0) / 2.0
        box = coords.agg(
            *[F.min(f"c{d}").alias(f"lo{d}") for d in range(self.dim)],
            *[F.max(f"c{d}").alias(f"hi{d}") for d in range(self.dim)],
        ).collect()[0]
        cells = self.cells_per_axis
        cell_exprs = []
        for d in range(self.dim):
            lo, hi = float(box[f"lo{d}"]), float(box[f"hi{d}"])
            ext = (hi - lo) if hi > lo else 1.0
            idx = F.least(
                F.floor((F.col(f"c{d}") - F.lit(lo)) / ext * cells).cast(
                    "int"
                ),
                F.lit(cells - 1),
            )
            cell_exprs.append(F.greatest(idx, F.lit(0)))
        binned = coords.select(
            "id",
            *[F.col(f"c{d}") for d in range(self.dim)],
            sum(
                e * (cells ** i) for i, e in enumerate(cell_exprs)
            ).alias("cell"),
        )
        cell_tab = binned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("cnt"),
            *[F.sum(f"c{d}").alias(f"s{d}") for d in range(self.dim)],
        )
        crossed = binned.crossJoin(
            F.broadcast(
                cell_tab.select(
                    F.col("cell").alias("ocell"), "cnt",
                    *[F.col(f"s{d}") for d in range(self.dim)],
                )
            )
        )
        own = F.col("cell") == F.col("ocell")
        eff_cnt = F.when(own, F.col("cnt") - 1).otherwise(F.col("cnt"))
        com = [
            F.when(
                own,
                (F.col(f"s{d}") - F.col(f"c{d}"))
                / F.greatest(eff_cnt, F.lit(1)),
            ).otherwise(F.col(f"s{d}") / F.col("cnt"))
            for d in range(self.dim)
        ]
        sqdist = sum(
            (F.col(f"c{d}") - com[d]) * (F.col(f"c{d}") - com[d])
            for d in range(self.dim)
        )
        factor = F.when(
            (sqdist < 1e-5) | (eff_cnt <= 0), F.lit(0.0)
        ).otherwise(
            F.lit(qsign) * eff_cnt / F.pow(sqdist, F.lit(q2))
        )
        raw = crossed.groupBy("id").agg(
            *[
                F.sum(factor * (F.col(f"c{d}") - com[d])).alias(f"r{d}")
                for d in range(self.dim)
            ]
        ).persist()
        norms = raw.agg(
            *[
                F.sqrt(F.sum(F.col(f"r{d}") * F.col(f"r{d}"))).alias(
                    f"n{d}"
                )
                for d in range(self.dim)
            ]
        ).collect()[0]
        out = Materializer().cut(
            0,
            raw.select(
                "id",
                *[
                    (
                        F.col(f"r{d}")
                        / F.lit(max(float(norms[f"n{d}"] or 0.0), 1e-12))
                    ).alias(f"r{d}")
                    for d in range(self.dim)
                ],
            ),
        )
        raw.unpersist()
        return out

    # -------------------------------------------------------------- run
    def _run(self) -> None:
        import math as _math

        from networkit_spark.operators.algebraic import laplacian_cg_solve
        from networkit_spark.operators.components import ConnectedComponents

        g = self.graph
        if g.directed:
            raise ValueError("MaxentStress needs an undirected graph")
        cc = ConnectedComponents(g).run()
        if cc.number_of_components() != 1:
            raise ValueError(
                "The supplied graph is not connected. Currently "
                "MaxentStress only handles connected graphs."
            )
        n = g.number_of_nodes()
        mat = Materializer()
        # q auto-rule (MaxentStress.cpp:518-526)
        deg1 = (
            g.degrees().where(F.col("out_deg") == 1).count()
        )
        if deg1 / n > 0.3:
            self.q = 0.8
        S = mat.cut(1000, self._known_distances()).persist()
        self._known = S
        # canonical half only: Graph.symmetrized re-adds the reverse
        # direction, and _laplacian_parts SUMS parallel rows
        s_graph = Graph(
            S.where(F.col("src") < F.col("dst")).select(
                "src", "dst",
                (1.0 / (F.col("d") * F.col("d"))).alias("weight"),
            ),
            directed=False,
            weighted=True,
            vertices=g.vertices,
        )
        coords = mat.cut(1001, self._initial_coordinates()).persist()

        alpha = self.alpha
        converged = False
        rep: DataFrame | None = None
        current_lb = -2
        solve_id = 0
        while not converged:
            for num_solves in range(self.max_solves_per_alpha):
                solve_id += 1
                old = coords
                new_lb = (
                    -1
                    if num_solves == 0
                    else int(_math.floor(5.0 * _math.log(num_solves)))
                )
                if new_lb != current_lb:
                    if rep is not None:
                        rep.unpersist()
                    rep = self._repulsive(old)  # already lineage-cut
                    current_lb = new_lb
                rhs = self._rhs(S, old)
                if num_solves < self.max_solves_per_alpha // 5:
                    nr = rhs.agg(
                        *[
                            F.sqrt(
                                F.sum(F.col(f"b{d}") * F.col(f"b{d}"))
                            ).alias(f"n{d}")
                            for d in range(self.dim)
                        ]
                    ).collect()[0]
                    rhs = rhs.select(
                        "id",
                        *[
                            (
                                F.col(f"b{d}")
                                / F.lit(
                                    max(float(nr[f"n{d}"] or 0.0), 1e-12)
                                )
                            ).alias(f"b{d}")
                            for d in range(self.dim)
                        ],
                    )
                rhs = (
                    rhs.join(rep, "id", "left")
                    .select(
                        "id",
                        *[
                            (
                                F.col(f"b{d}")
                                + F.lit(alpha)
                                * F.coalesce(F.col(f"r{d}"), F.lit(0.0))
                            ).alias(f"b{d}")
                            for d in range(self.dim)
                        ],
                    )
                )
                long_rhs = rhs.selectExpr(
                    "id",
                    "stack({}, {}) as (sys, b)".format(
                        self.dim,
                        ", ".join(
                            f"{d}, b{d}" for d in range(self.dim)
                        ),
                    ),
                )
                sol = laplacian_cg_solve(
                    s_graph,
                    long_rhs.select("sys", "id", "b"),
                    tol=self.tolerance,
                    max_iters=self.cg_max_iters,
                    preconditioner=(
                        "diagonal" if self.solver == "cg_diagonal" else "identity"
                    ),
                )
                new_coords = (
                    sol.groupBy("id")
                    .pivot("sys", list(range(self.dim)))
                    .agg(F.first("x"))
                    .select(
                        "id",
                        *[
                            F.col(str(d)).alias(f"c{d}")
                            for d in range(self.dim)
                        ],
                    )
                )
                new_coords = mat.cut(3000 + solve_id, new_coords).persist()
                # isConverged (MaxentStress.cpp:327-340)
                j = new_coords.join(
                    old.select(
                        "id",
                        *[
                            F.col(f"c{d}").alias(f"o{d}")
                            for d in range(self.dim)
                        ],
                    ),
                    "id",
                )
                r = j.agg(
                    F.sum(
                        sum(
                            (F.col(f"c{d}") - F.col(f"o{d}"))
                            * (F.col(f"c{d}") - F.col(f"o{d}"))
                            for d in range(self.dim)
                        )
                    ).alias("chg"),
                    F.sum(
                        sum(
                            F.col(f"o{d}") * F.col(f"o{d}")
                            for d in range(self.dim)
                        )
                    ).alias("len"),
                ).collect()[0]
                old.unpersist()
                coords = new_coords
                rel = float(r["chg"]) / max(float(r["len"]), 1e-300)
                converged = rel < self.conv_threshold
                if converged:
                    if not self.fast_computation:
                        converged = False
                    else:
                        break
            alpha *= self.alpha_reduction
            converged = converged or alpha < self.final_alpha
        if rep is not None:
            rep.unpersist()
        self._coords = coords.select(
            "id",
            F.array(*[F.col(f"c{d}") for d in range(self.dim)]).alias(
                "pos"
            ),
        )

    # ------------------------------------------------------- measures
    def _wide(self) -> DataFrame:
        self.assure_finished()
        return self._coords.select(
            "id",
            *[F.col("pos")[d].alias(f"c{d}") for d in range(self.dim)],
        )

    def _pair_geo_dist(self, pairs: DataFrame) -> DataFrame:
        """Attach geometric distance ``geo`` to ``(src, dst, …)``."""
        c = self._wide()
        cu = c.select(
            F.col("id").alias("src"),
            *[F.col(f"c{d}").alias(f"u{d}") for d in range(self.dim)],
        )
        cv = c.select(
            F.col("id").alias("dst"),
            *[F.col(f"c{d}").alias(f"v{d}") for d in range(self.dim)],
        )
        geo = F.sqrt(
            sum(
                (F.col(f"u{d}") - F.col(f"v{d}"))
                * (F.col(f"u{d}") - F.col(f"v{d}"))
                for d in range(self.dim)
            )
        )
        return (
            pairs.join(cu, "src")
            .join(cv, "dst")
            .withColumn("geo", geo)
            .drop(
                *[f"u{d}" for d in range(self.dim)],
                *[f"v{d}" for d in range(self.dim)],
            )
        )

    def _s_graph_distances(self) -> DataFrame:
        """All-pairs shortest-path distances over the augmented S graph
        (``(src, dst, sd)``, src ≠ dst) — the measures' fixture-scale
        diagnostic frame (the reference runs n SSSPs the same way)."""
        S = self._known
        # S is already symmetric — keep directed=True so the relaxation
        # uses its rows verbatim (an undirected flag would re-reverse)
        aug = Graph(
            S.select("src", "dst", F.col("d").alias("weight")),
            directed=True,
            weighted=True,
            vertices=self.graph.vertices,
        )
        wd = multi_source_weighted_distances(aug, None)
        return wd.select(
            F.col("s").alias("src"), F.col("id").alias("dst"),
            F.col("d").alias("sd"),
        ).where(F.col("src") != F.col("dst"))

    def compute_scaling_factor(self) -> float:
        """``computeScalingFactor`` (MaxentStress.cpp:194-224):
        Σ geo/sd ÷ Σ geo²/sd² over all pairs with sd ≥ 1e-5."""
        pairs = self._s_graph_distances().where(F.col("sd") >= 1e-5)
        j = self._pair_geo_dist(pairs)
        r = j.agg(
            F.sum(F.col("geo") / F.col("sd")).alias("top"),
            F.sum(
                F.col("geo") * F.col("geo") / (F.col("sd") * F.col("sd"))
            ).alias("bot"),
        ).collect()[0]
        return float(r["top"]) / float(r["bot"])

    def scale_layout(self) -> None:
        """``scaleLayout`` (MaxentStress.cpp:226-236)."""
        s = self.compute_scaling_factor()
        self._coords = self._coords.select(
            "id",
            F.transform(F.col("pos"), lambda x: x * F.lit(s)).alias("pos"),
        )

    def full_stress_measure(self) -> float:
        """``fullStressMeasure`` (MaxentStress.cpp:238-263):
        ½·Σ (geo − sd)²/sd² over all reached pairs with sd ≥ 1e-5."""
        pairs = self._s_graph_distances().where(F.col("sd") >= 1e-5)
        j = self._pair_geo_dist(pairs)
        r = j.agg(
            F.sum(
                (F.col("geo") - F.col("sd"))
                * (F.col("geo") - F.col("sd"))
                / (F.col("sd") * F.col("sd"))
            ).alias("e")
        ).collect()[0]
        return float(r["e"]) / 2.0

    def maxent_measure(self) -> float:
        """``maxentMeasure`` (MaxentStress.cpp:265-303): stress over S
        minus ``finalAlpha`` × entropy over all non-S pairs. The all-
        pairs entropy term is an O(n²) crossJoin — fixture-scale
        diagnostic exactly like the reference's O(n²) loop."""
        import math as _math

        c = self._wide()
        lhs = c.select(
            F.col("id").alias("src"),
            *[F.col(f"c{d}").alias(f"u{d}") for d in range(self.dim)],
        )
        rhs = c.select(
            F.col("id").alias("dst"),
            *[F.col(f"c{d}").alias(f"v{d}") for d in range(self.dim)],
        )
        geo = F.greatest(
            F.sqrt(
                sum(
                    (F.col(f"u{d}") - F.col(f"v{d}"))
                    * (F.col(f"u{d}") - F.col(f"v{d}"))
                    for d in range(self.dim)
                )
            ),
            F.lit(1e-5),
        )
        ent_term = (
            F.log(geo)
            if abs(self.q) < 0.001
            else F.pow(geo, F.lit(-self.q))
        )
        all_pairs = lhs.crossJoin(rhs).where(F.col("src") != F.col("dst"))
        entropy = float(
            all_pairs.agg(F.sum(ent_term).alias("e")).collect()[0]["e"]
        )
        sp = self._pair_geo_dist(self._known.select("src", "dst", "d"))
        geo2 = F.greatest(F.col("geo"), F.lit(1e-5))
        ent2 = (
            F.log(geo2)
            if abs(self.q) < 0.001
            else F.pow(geo2, F.lit(-self.q))
        )
        r = sp.agg(
            F.sum(
                (geo2 - F.col("d"))
                * (geo2 - F.col("d"))
                / (F.col("d") * F.col("d"))
            ).alias("energy"),
            F.sum(ent2).alias("s_ent"),
        ).collect()[0]
        # ×2: the reference re-adds every symmetric knownDistances entry
        # as a SECOND parallel undirected edge (MaxentStress.cpp:269-275
        # addEdge over both orientations), so its forNeighborsOf sweep
        # visits each unordered S pair 4 times where the symmetric
        # 2-rows-per-pair S frame holds it twice
        energy = 2.0 * float(r["energy"])
        entropy -= 2.0 * float(r["s_ent"])
        if abs(self.q) > 0.001:
            entropy *= -(1.0 if self.q >= 0.0 else -1.0)
        energy -= self.final_alpha * entropy
        return energy / 2.0

    def mean_distance_error(self) -> float:
        """``meanDistanceError`` (MaxentStress.cpp:305-315)."""
        j = self._pair_geo_dist(self._known.select("src", "dst", "d"))
        r = j.agg(
            F.sum(F.abs(F.col("geo") - F.col("d")) / F.col("d")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        ).collect()[0]
        return float(r["s"]) / float(r["c"])

    def ldme(self) -> float:
        """``ldme`` (MaxentStress.cpp:317-325)."""
        import math as _math

        j = self._pair_geo_dist(self._known.select("src", "dst", "d"))
        r = j.agg(
            F.sum(
                (F.col("d") - F.col("geo")) * (F.col("d") - F.col("geo"))
            ).alias("s"),
            F.count(F.lit(1)).alias("c"),
        ).collect()[0]
        return _math.sqrt(float(r["s"]) / float(r["c"]))
