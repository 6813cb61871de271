"""Algebraic family — distributed Laplacian solves and the
effective-resistance operators built on them.

Reference surface:

- ``cpp/distance/CommuteTimeDistance.cpp:37-210`` — ECTD(u,v) =
  sqrt(vol(G) · (L⁺uu + L⁺vv − 2·L⁺uv)); exact via per-pair solves,
  approximate via k = ceil(log₂ n)/ε² JL-projected edge-incidence
  systems (Spielman–Srivastava).
- ``cpp/centrality/SpanningEdgeCentrality.cpp:33-130`` — per-edge
  effective resistance; exact via one solve per edge, approximate via
  the same JL systems with per-edge squared solution differences.
- ``include/networkit/centrality/ApproxElectricalCloseness.hpp`` —
  electrical closeness (n−1)/(n·L⁺uu + tr(L⁺)). The reference
  estimates diag(L⁺) by UST sampling (Wilson's loop-erased walks — an
  inherently sequential pointer chase); here the SAME quantity comes
  from the solver: exactly (one batched system per node) or via a
  Hutchinson diagonal estimator (documented estimator divergence).

The reference backs all of these with the LAMG multigrid solver
(``cpp/numerics/LAMG``). The Spark-native analog is **batched conjugate
gradient**: solver state is ONE frame ``(sys, id, x, r, p)`` over all
right-hand sides at once; each iteration is a single Laplacian
gather-join (``L·p (v) = wdeg(v)·p(v) − Σ_u w(u,v)·p(u)``) plus two
scalar aggregations, so k systems cost one extra column of state, not k
jobs. CG on a connected graph with mean-centered rhs stays in
range(L); solutions are returned mean-zero (= L⁺·b exactly, since
L⁺𝟙 = 0). Iterations are O(√cond(L)) — the multigrid-vs-CG tradeoff
is a constant-factor choice, not a semantic one.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.dedup import portable_hash32
from networkit_spark.plans.iterate import Materializer


def _laplacian_parts(graph: Graph):
    """(adjacency ``(src, dst, w)`` symmetric, weighted degrees
    ``(id, wd)``) with self-loops dropped (their Laplacian term is 0)."""
    adj = (
        graph.symmetrized()
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
    )
    wdeg = adj.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("wd"))
    return adj, wdeg


def laplacian_cg_solve(
    graph: Graph,
    rhs: DataFrame,
    tol: float = 1e-10,
    max_iters: int = 2000,
    preconditioner: str = "identity",
) -> DataFrame:
    """Solve ``L x = b`` for every system in ``rhs (sys, id, b)`` at
    once; returns ``(sys, id, x)`` with x mean-zero per system (the
    pseudoinverse solution). The graph must be connected and every b is
    mean-centered first (the consistent projection). Convergence:
    ``‖r‖₂ ≤ tol·max(1, ‖b‖₂)`` per system.

    ``preconditioner``: ``"identity"`` (plain CG — the reference's
    ``ConjugateGradient<IdentityPreconditioner>``) or ``"diagonal"``
    (Jacobi PCG, ``M = diag(L) = wd`` — its
    ``ConjugateGradient<DiagonalPreconditioner>``,
    ``include/networkit/numerics/Preconditioner/DiagonalPreconditioner.hpp``).
    The preconditioned residual ``z = r/wd`` costs no extra jobs (the
    ``r·z`` sums ride in the existing per-iteration aggregates); on
    weight-skewed Laplacians it cuts iteration count, which here means
    cut ROUNDS — each CG iteration is one distributed join-agg."""
    if graph.directed:
        raise ValueError("Laplacian solves need an undirected graph")
    if preconditioner not in ("identity", "diagonal"):
        raise ValueError(f"unknown preconditioner {preconditioner!r}")
    diag = preconditioner == "diagonal"
    spark = graph.edges.sparkSession
    mat = Materializer()
    adj, wdeg = _laplacian_parts(graph)
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = adj.repartition(shuffle_parts, "src").persist()
    n = graph.number_of_nodes()

    # center b per system and densify over all vertices
    means = rhs.groupBy("sys").agg((F.sum("b") / n).alias("mb"))
    b0 = (
        graph.vertices.crossJoin(means)
        .join(rhs, ["sys", "id"], "left")
        .select(
            "sys", "id", (F.coalesce("b", F.lit(0.0)) - F.col("mb")).alias("b")
        )
    )
    wd_g = F.greatest(F.col("wd"), F.lit(1e-300))
    state = b0.join(wdeg, "id", "left").select(
        "sys", "id",
        F.lit(0.0).alias("x"),
        F.col("b").alias("r"),
        F.coalesce("wd", F.lit(0.0)).alias("wd"),
    ).select(
        "sys", "id", "x", "r", "wd",
        ((F.col("r") / wd_g) if diag else F.col("r")).alias("p"),
    )
    state = mat.cut(0, state)
    first_aggs = [F.sum(F.col("r") ** 2).alias("n2")]
    if diag:
        first_aggs.append(F.sum(F.col("r") * F.col("r") / wd_g).alias("rz"))
    first = state.groupBy("sys").agg(*first_aggs).collect()
    norms = {r["sys"]: max(1.0, math.sqrt(r["n2"])) for r in first}
    rs_old = {r["sys"]: r["n2"] for r in first}
    rz_old = {r["sys"]: (r["rz"] if diag else r["n2"]) for r in first}
    done = {s for s, v in rs_old.items() if math.sqrt(v) <= tol * norms[s]}

    for it in range(1, max_iters + 1):
        if len(done) == len(norms):
            break
        gathered = (
            adj.join(
                state.select(
                    F.col("id").alias("src"), "sys", F.col("p").alias("pu")
                ).hint("shuffle_hash"),
                "src",
            )
            .groupBy("sys", F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("pu")).alias("np"))
        )
        with_ap = state.join(gathered, ["sys", "id"], "left").select(
            "sys", "id", "x", "r", "p", "wd",
            (
                F.col("wd") * F.col("p") - F.coalesce("np", F.lit(0.0))
            ).alias("ap"),
        )
        with_ap = mat.cut(it, with_ap)
        scal = {
            r["sys"]: (r["pap"],)
            for r in with_ap.groupBy("sys")
            .agg(F.sum(F.col("p") * F.col("ap")).alias("pap"))
            .collect()
        }
        alphas = {}
        for s, (pap,) in scal.items():
            if s in done or pap <= 0:
                alphas[s] = 0.0
            else:
                alphas[s] = rz_old[s] / pap
        adf = spark.createDataFrame(
            [(s, a) for s, a in alphas.items()], "sys long, alpha double"
        )
        updated = with_ap.join(F.broadcast(adf), "sys").select(
            "sys", "id",
            (F.col("x") + F.col("alpha") * F.col("p")).alias("x"),
            (F.col("r") - F.col("alpha") * F.col("ap")).alias("r"),
            "p", "wd",
        )
        updated = mat.cut(it, updated)
        upd_aggs = [F.sum(F.col("r") ** 2).alias("n2")]
        if diag:
            upd_aggs.append(F.sum(F.col("r") * F.col("r") / wd_g).alias("rz"))
        upd_rows = updated.groupBy("sys").agg(*upd_aggs).collect()
        rs_new = {r["sys"]: r["n2"] for r in upd_rows}
        rz_new = {r["sys"]: (r["rz"] if diag else r["n2"]) for r in upd_rows}
        betas = {}
        for s in rs_new:
            if s in done or rz_old[s] <= 0:
                betas[s] = 0.0
            else:
                betas[s] = rz_new[s] / rz_old[s]
            if math.sqrt(rs_new[s]) <= tol * norms[s]:
                done.add(s)
        bdf = spark.createDataFrame(
            [(s, b) for s, b in betas.items()], "sys long, beta double"
        )
        znew = (F.col("r") / wd_g) if diag else F.col("r")
        state = updated.join(F.broadcast(bdf), "sys").select(
            "sys", "id", "x", "r",
            (znew + F.col("beta") * F.col("p")).alias("p"),
            "wd",
        )
        state = mat.cut(it, state)
        rs_old = rs_new
        rz_old = rz_new
    else:
        adj.unpersist()
        raise RuntimeError(
            f"CG did not converge in {max_iters} iterations — is the "
            "graph connected?"
        )
    adj.unpersist()
    # mean-zero projection (pure nullspace cleanup of numerical drift)
    xm = state.groupBy("sys").agg((F.sum("x") / n).alias("mx"))
    return state.join(F.broadcast(xm), "sys").select(
        "sys", "id", (F.col("x") - F.col("mx")).alias("x")
    )


def _jl_rhs(graph: Graph, k: int, seed: int) -> DataFrame:
    """k JL right-hand sides: per canonical edge (u < v) and system i,
    draw r ∈ {+1/√k, −1/√k} (seeded) and add +r at u, −r at v
    (``CommuteTimeDistance.cpp:92-104``)."""
    spark = graph.edges.sparkSession
    canon = (
        graph.canonical()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    systems = spark.range(k).select(F.col("id").alias("sys"))
    scale = 1.0 / math.sqrt(k)
    sign = F.when(
        portable_hash32(
            F.concat_ws("|", "sys", "src", "dst"), f"jl{seed}"
        ) % 2
        == 0,
        F.lit(scale),
    ).otherwise(F.lit(-scale))
    per_edge = canon.crossJoin(systems).select("sys", "src", "dst", sign.alias("r"))
    return (
        per_edge.select("sys", F.col("src").alias("id"), F.col("r").alias("b"))
        .unionAll(
            per_edge.select(
                "sys", F.col("dst").alias("id"), (-F.col("r")).alias("b")
            )
        )
        .groupBy("sys", "id")
        .agg(F.sum("b").alias("b"))
    )


class CommuteTimeDistance(Algorithm):
    """``CommuteTimeDistance`` — ECTD(u,v) = sqrt(vol(G)·R_eff(u,v)).
    ``run()`` = exact (one batched system per node — L⁺ columns;
    quadratic state, the test-scale path exactly like the reference's
    n² pairwise solves); ``run_approximation()`` = the JL sketch
    (k = ceil(log₂ n)/ε² systems, the scale path)."""

    def __init__(self, graph: Graph, tol: float = 0.1, seed: int = 42) -> None:
        if graph.directed:
            raise ValueError(
                "Commute time distance is only supported for undirected graphs."
            )
        super().__init__(graph)
        self.tol = float(tol)
        self.seed = int(seed)
        self._solutions: DataFrame | None = None
        self._exact = True
        self._vol: float | None = None

    def _volume(self) -> float:
        if self._vol is None:
            row = self.graph.symmetrized().agg(F.sum("weight").alias("v")).collect()[0]
            self._vol = float(row["v"] or 0.0)
        return self._vol

    def _run(self) -> None:
        g = self.graph
        rhs = g.vertices.select(
            F.col("id").alias("sys"), F.col("id").alias("id"),
            F.lit(1.0).alias("b"),
        )
        self._solutions = laplacian_cg_solve(g, rhs).persist()
        self._solutions.count()
        self._exact = True

    def run_approximation(self) -> "CommuteTimeDistance":
        k = max(1, math.ceil(math.log2(max(2, self.graph.number_of_nodes()))
                             / (self.tol * self.tol)))
        rhs = _jl_rhs(self.graph, k, self.seed)
        self._solutions = laplacian_cg_solve(self.graph, rhs).persist()
        self._solutions.count()
        self._exact = False
        self.has_run = True
        return self

    def distance(self, u: int, v: int) -> float:
        """``CommuteTimeDistance::distance``."""
        self.assure_finished()
        if u == v:
            return 0.0
        rows = self._solutions.where(F.col("id").isin([int(u), int(v)]))
        if self._exact:
            vals = {
                (r["sys"], r["id"]): r["x"]
                for r in rows.where(F.col("sys").isin([int(u), int(v)])).collect()
            }
            diff = (
                vals[(u, u)] + vals[(v, v)] - vals[(u, v)] - vals[(v, u)]
            )
        else:
            diff = rows.groupBy("sys").agg(
                (
                    F.sum(F.when(F.col("id") == int(u), F.col("x")))
                    - F.sum(F.when(F.col("id") == int(v), F.col("x")))
                ).alias("d")
            ).agg(F.sum(F.col("d") ** 2).alias("s")).collect()[0]["s"]
        return math.sqrt(max(0.0, diff) * self._volume())

    def get_distances(self) -> DataFrame:
        """All-pairs ``(u, v, dist)`` for u < v — exact mode only (the
        n² frame the reference's ``distances`` matrix holds)."""
        self.assure_finished()
        if not self._exact:
            raise RuntimeError("all-pairs frame requires the exact run()")
        sol = self._solutions
        diag = sol.where(F.col("sys") == F.col("id")).select(
            F.col("sys").alias("u"), F.col("x").alias("duu")
        )
        vol = self._volume()
        pairs = (
            sol.where(F.col("sys") < F.col("id"))
            .select(F.col("sys").alias("u"), F.col("id").alias("v"),
                    F.col("x").alias("xuv"))
            .join(
                sol.where(F.col("sys") > F.col("id")).select(
                    F.col("sys").alias("v"), F.col("id").alias("u"),
                    F.col("x").alias("xvu"),
                ),
                ["u", "v"],
            )
            .join(diag, "u")
            .join(
                diag.withColumnRenamed("u", "v").withColumnRenamed(
                    "duu", "dvv"
                ),
                "v",
            )
        )
        return pairs.select(
            "u", "v",
            F.sqrt(
                F.greatest(
                    F.col("duu") + F.col("dvv") - F.col("xuv") - F.col("xvu"),
                    F.lit(0.0),
                )
                * F.lit(vol)
            ).alias("dist"),
        )


class SpanningEdgeCentrality(Algorithm):
    """``SpanningEdgeCentrality`` — per-edge effective resistance.
    ``run()`` solves one batched system per edge (exact, test scale);
    ``run_approximation()`` uses the shared JL systems and sums squared
    per-edge solution differences (``SpanningEdgeCentrality.cpp:
    68-97``)."""

    def __init__(self, graph: Graph, tol: float = 0.1, seed: int = 42) -> None:
        if graph.directed:
            raise ValueError("SpanningEdgeCentrality needs an undirected graph")
        super().__init__(graph)
        self.tol = float(tol)
        self.seed = int(seed)
        self._edge_scores: DataFrame | None = None

    def _canon(self) -> DataFrame:
        return (
            self.graph.canonical()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    def _run(self) -> None:
        g = self.graph
        canon = self._canon().withColumn(
            "sys", F.monotonically_increasing_id()
        ).persist()
        canon.count()
        rhs = canon.select(
            "sys", F.col("src").alias("id"), F.lit(1.0).alias("b")
        ).unionAll(
            canon.select("sys", F.col("dst").alias("id"), F.lit(-1.0).alias("b"))
        )
        sol = laplacian_cg_solve(g, rhs)
        ends = canon.select("sys", F.col("src").alias("id"), F.lit(1).alias("sgn")).unionAll(
            canon.select("sys", F.col("dst").alias("id"), F.lit(-1).alias("sgn"))
        )
        diffs = (
            sol.join(ends, ["sys", "id"])
            .groupBy("sys")
            .agg(F.abs(F.sum(F.col("sgn") * F.col("x"))).alias("score"))
        )
        self._edge_scores = canon.join(diffs, "sys").select(
            F.col("src").alias("u"), F.col("dst").alias("v"), "score"
        ).localCheckpoint()
        canon.unpersist()

    def run_approximation(self) -> "SpanningEdgeCentrality":
        g = self.graph
        k = max(1, math.ceil(math.log2(max(2, g.number_of_nodes()))
                             / (self.tol * self.tol)))
        sol = laplacian_cg_solve(g, _jl_rhs(g, k, self.seed))
        canon = self._canon()
        su = sol.select("sys", F.col("id").alias("src"), F.col("x").alias("xu"))
        sv = sol.select("sys", F.col("id").alias("dst"), F.col("x").alias("xv"))
        self._edge_scores = (
            canon.join(su, "src")
            .join(sv, ["sys", "dst"])
            .groupBy(F.col("src").alias("u"), F.col("dst").alias("v"))
            .agg(F.sum((F.col("xu") - F.col("xv")) ** 2).alias("score"))
            .localCheckpoint()
        )
        self.has_run = True
        return self

    def edge_scores(self) -> DataFrame:
        """``(u, v, score)`` — effective resistance per canonical edge."""
        self.assure_finished()
        return self._edge_scores


def electrical_closeness(
    graph: Graph,
    exact: bool = True,
    n_systems: int = 200,
    seed: int = 42,
) -> DataFrame:
    """Electrical closeness ``(n − 1) / (n·L⁺uu + tr(L⁺))`` — the
    quantity ``ApproxElectricalCloseness`` estimates
    (``include/networkit/centrality/ApproxElectricalCloseness.hpp``).
    ``exact=True`` computes diag(L⁺) from one batched system per node;
    ``exact=False`` uses a seeded Hutchinson diagonal estimator over
    ``n_systems`` Rademacher probes (estimator divergence from the
    reference's UST sampler — same target, different variance profile —
    documented)."""
    g = graph
    n = g.number_of_nodes()
    spark = g.edges.sparkSession
    if exact:
        rhs = g.vertices.select(
            F.col("id").alias("sys"), "id", F.lit(1.0).alias("b")
        )
        sol = laplacian_cg_solve(g, rhs)
        diag = sol.where(F.col("sys") == F.col("id")).select(
            "id", F.col("x").alias("diag")
        )
    else:
        systems = spark.range(n_systems).select(F.col("id").alias("sys"))
        z = g.vertices.crossJoin(systems).select(
            "sys", "id",
            F.when(
                portable_hash32(
                    F.concat_ws("|", "sys", "id"), f"hut{seed}"
                ) % 2 == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)).alias("b"),
        )
        sol = laplacian_cg_solve(g, z)
        diag = (
            sol.join(z, ["sys", "id"])
            .groupBy("id")
            .agg((F.sum(F.col("b") * F.col("x")) / n_systems).alias("diag"))
        )
    trace = diag.agg(F.sum("diag").alias("t")).collect()[0]["t"]
    return diag.select(
        "id",
        (
            F.lit(float(n - 1))
            / (F.lit(float(n)) * F.col("diag") + F.lit(float(trace)))
        ).alias("score"),
    )


class ApproxSpanningEdge(Algorithm):
    """ε-additive spanning-edge centrality via uniform-spanning-tree
    sampling (``cpp/centrality/ApproxSpanningEdge.cpp:20-199``, Hayashi
    et al., IJCAI 2016): score(e) = fraction of ``nSamples =
    ceil(log(2m·n)/(2ε²))`` sampled USTs containing ``e``, sampled
    independently per biconnected component (a UST of G is the product
    of USTs of its blocks). Reference shortcuts reproduced exactly:
    a 2-node block's edge is in EVERY spanning tree (score 1); in a
    3-node block (triangle) the tree is the 2 edges incident to a
    uniformly drawn node; larger blocks run Wilson's loop-erased walks
    seeded from a BFS ordering rooted at the block's max-degree node
    (``ApproxSpanningEdge.cpp:46-125``).

    Spark re-expression: the reference parallelizes over SAMPLES
    (OpenMP threads each drawing whole USTs against the shared graph);
    here the samples frame ``spark.range(nSamples)`` fans out through
    ``mapInPandas`` with the block structure broadcast — the same
    parallel axis, executor-count wide. Block structure (adjacency +
    BFS sequences) is prepared once driver-side behind the fixture
    guard; the distributed JL :class:`SpanningEdgeCentrality`
    ``run_approximation()`` is the engine-scale estimator for graphs
    past the broadcast bound. Walk draws are seeded per sample id —
    deterministic and partitioning-independent, divergent from the
    reference's URNG stream by construction.
    """

    _MAX_DRIVER_EDGES = 2_000_000

    def __init__(self, graph: Graph, eps: float = 0.1, seed: int = 42) -> None:
        if graph.directed:
            raise ValueError("ApproxSpanningEdge needs an undirected graph")
        super().__init__(graph)
        self.eps = float(eps)
        self.seed = int(seed)
        self._scores: DataFrame | None = None

    def _run(self) -> None:
        from networkit_spark.operators.biconnected import BiconnectedComponents

        g = self.graph
        spark = g.edges.sparkSession
        m = g.number_of_edges()
        n = g.number_of_nodes()
        if not m:
            raise ValueError("Error: graph is empty!")
        if m > self._MAX_DRIVER_EDGES:
            raise ValueError(
                f"ApproxSpanningEdge broadcasts the block structure "
                f"({m} edges > {self._MAX_DRIVER_EDGES}); use "
                "SpanningEdgeCentrality.run_approximation() at engine scale"
            )
        delta = 1.0 / float(n)
        n_samples = int(math.ceil(math.log(2.0 * m / delta)
                                  / (2.0 * self.eps * self.eps)))

        bcc = BiconnectedComponents(g).run()
        comp_edges: dict[int, list[tuple[int, int]]] = {}
        for r in bcc.edge_components().collect():
            comp_edges.setdefault(int(r["block"]), []).append(
                (int(r["u"]), int(r["v"]))
            )
        fixed: list[tuple[int, int]] = []   # 2-node blocks: score 1
        blocks: list[tuple[list[int], dict[int, list[int]]]] = []
        for edges in comp_edges.values():
            nodes = sorted({x for e in edges for x in e})
            if len(nodes) == 2:
                fixed.append(edges[0])
                continue
            adj: dict[int, list[int]] = {u: [] for u in nodes}
            for u, v in edges:
                adj[u].append(v)
                adj[v].append(u)
            for lst in adj.values():
                lst.sort()
            if len(nodes) == 3:
                blocks.append((nodes, adj))
                continue
            # BFS sequence from the max-degree node (ties → smallest id)
            root = max(nodes, key=lambda u: (len(adj[u]), -u))
            seq, seen, q = [], {root}, [root]
            while q:
                u = q.pop(0)
                seq.append(u)
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        q.append(v)
            blocks.append((seq, adj))
        bc_blocks = spark.sparkContext.broadcast(blocks)
        seed = self.seed

        def sample_batches(iterator):
            import numpy as np
            import pandas as pd

            blks = bc_blocks.value
            for pdf in iterator:
                out_u, out_v = [], []
                for sample_id in pdf["id"]:
                    rng = np.random.default_rng((seed, int(sample_id)))
                    for seq, adj in blks:
                        if len(seq) == 3:
                            # triangle: tree = 2 edges at a random node
                            u = seq[int(rng.integers(3))]
                            for v in adj[u]:
                                a, b = (u, v) if u < v else (v, u)
                                out_u.append(a)
                                out_v.append(b)
                            continue
                        in_tree = {seq[0]}
                        parent: dict[int, int] = {}
                        for start in seq[1:]:
                            if start in in_tree:
                                continue
                            cur = start
                            while cur not in in_tree:
                                nbrs = adj[cur]
                                parent[cur] = nbrs[
                                    int(rng.integers(len(nbrs)))
                                ]
                                cur = parent[cur]
                            cur = start
                            while cur not in in_tree:
                                in_tree.add(cur)
                                p = parent[cur]
                                a, b = (cur, p) if cur < p else (p, cur)
                                out_u.append(a)
                                out_v.append(b)
                                cur = p
                yield pd.DataFrame({"u": out_u, "v": out_v})

        sampled = (
            spark.range(n_samples)
            .repartition(spark.sparkContext.defaultParallelism)
            .mapInPandas(sample_batches, "u long, v long")
            .groupBy("u", "v")
            .agg((F.count("*") / float(n_samples)).alias("score"))
        )
        canon = (
            g.canonical()
            .select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        fixed_df = (
            spark.createDataFrame(
                [(min(u, v), max(u, v)) for u, v in fixed], "u long, v long"
            )
            if fixed
            else None
        )
        scores = canon.join(sampled, ["u", "v"], "left").select(
            "u", "v", F.coalesce("score", F.lit(0.0)).alias("score")
        )
        if fixed_df is not None:
            scores = (
                scores.join(fixed_df.withColumn("one", F.lit(1.0)),
                            ["u", "v"], "left")
                .select("u", "v",
                        F.coalesce("one", F.col("score")).alias("score"))
            )
        self._scores = scores.localCheckpoint()
        bc_blocks.destroy()

    def scores(self) -> DataFrame:
        """``(u, v, score)`` — estimated Pr[e ∈ UST] per canonical edge."""
        self.assure_finished()
        return self._scores
