"""Spectral family — distributed Laplacian/adjacency eigenpairs and the
reference's Python-layer spectral algorithms built on them.

Reference surface:

- ``networkit/algebraic.py:117-219`` — ``laplacianEigenvectors`` /
  ``adjacencyEigenvectors`` (scipy ``eigsh`` on the assembled sparse
  matrix; ``reverse=True`` = smallest-first).
- ``networkit/partitioning.py:56-218`` — ``SpectralPartitioner``:
  recursive bisection/trisection on the ⌈log₂(count)⌉+1 smallest
  Laplacian eigenvectors, balanced (exact quantile) or mean splits.
- ``networkit/coloring.py:6-90`` — ``SpectralColoring``: recursive
  sign splits of adjacency eigenvectors until no color class contains
  an edge.

Spark re-expression of the eigensolver: the reference assembles a
scipy matrix on one machine; here the matrix never materializes.
**Block subspace iteration with Rayleigh–Ritz extraction** on a
spectral complement keeps everything as joins:

- smallest-k of L: iterate ``B = σI − L`` with σ = 2·max weighted
  degree + 1 (Gershgorin bound ⇒ B ⪰ 0 and order-reversing);
- largest-k of A: iterate ``B = A + (1 + max|wdeg|)·I``.

Per iteration (all JVM-side): ONE gather join-agg ``W = B·V`` over the
``(vec, id, val)`` block state (the PageRank/CG round shape — the edge
frame never moves, k vectors ride as rows, hubs fold map-side), one
k×k Gram aggregation collected to the driver, a driver-side Cholesky
(k ≤ ~8 floats), and one pivot/unpivot recombination that applies
``V ← W·R⁻¹`` as literal column arithmetic. Final Rayleigh–Ritz: the
projected k×k eigenproblem is solved with numpy and the rotation is
applied the same literal way. O(k²) driver work, O(k·m) cluster work
per round — the 100 TB shape is the PageRank shape.

For a connected graph the trivial Laplacian pair (λ=0, 𝟙/√n) is pinned
exactly as the first block column; the iteration refines the rest.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.algebraic import _laplacian_parts
from networkit_spark.plans.iterate import Materializer


def _seeded_uniform(seed: int, vec: int) -> F.Column:
    h = F.xxhash64(F.lit(int(seed)), F.col("id"), F.lit(int(vec)))
    return (F.pmod(h, F.lit(1_000_003)) / 1_000_003.0) - 0.5


def _block_eigen(
    graph: Graph,
    k: int,
    which: str,
    tol: float,
    max_iters: int,
    seed: int,
) -> tuple[list[float], DataFrame]:
    """Top-k eigenpairs of B (see module doc) → eigenpairs of L or A.
    Returns (eigenvalues of the ORIGINAL operator, state (vec, id, val))
    ordered smallest-first for ``which='laplacian'``, largest-first for
    ``which='adjacency'``."""
    import numpy as np

    if graph.directed:
        raise ValueError("spectral operators need an undirected graph")
    spark = graph.edges.sparkSession
    n = graph.number_of_nodes()
    if k > max(0, n - 1):
        raise ValueError(f"k={k} eigenpairs requested on {n} nodes")
    adj, wdeg = _laplacian_parts(graph)
    max_wd = wdeg.agg(F.max("wd")).collect()[0][0] or 0.0
    if which == "laplacian":
        sigma = 2.0 * max_wd + 1.0
        diag = (F.lit(sigma) - F.coalesce("wd", F.lit(0.0))).alias("w")
    else:
        sigma = max_wd + 1.0
        diag = F.lit(sigma).alias("w")
    brows = adj.select("src", "dst", "w").unionAll(
        graph.vertices.join(wdeg, "id", "left").select(
            F.col("id").alias("src"), F.col("id").alias("dst"), diag
        )
    )
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    brows = brows.repartition(shuffle_parts, "src").persist()

    mat = Materializer()
    # init block: vec 0 = exact constant direction for the Laplacian
    # (its λ=0 eigenvector), seeded uniforms elsewhere
    inits = []
    for j in range(k):
        if which == "laplacian" and j == 0:
            col = F.lit(1.0 / math.sqrt(n))
        else:
            col = _seeded_uniform(seed, j)
        inits.append(
            graph.vertices.select(F.lit(j).alias("vec"), "id", col.alias("val"))
        )
    state = inits[0]
    for df in inits[1:]:
        state = state.unionAll(df)
    state = mat.cut(0, state)

    vec_ids = list(range(k))
    prev_ritz = None
    for it in range(1, max_iters + 1):
        w = (
            brows.join(
                state.hint("shuffle_hash"),
                brows.src == state.id,
            )
            .groupBy("vec", F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("val")).alias("val"))
        )
        wide = (
            w.groupBy("id")
            .pivot("vec", vec_ids)
            .agg(F.first("val"))
            .na.fill(0.0)
        )
        wide = mat.cut(it, wide)
        gram_exprs = [
            F.sum(F.col(str(i)) * F.col(str(j))).alias(f"g_{i}_{j}")
            for i in range(k)
            for j in range(i, k)
        ]
        grow = wide.agg(*gram_exprs).collect()[0]
        G = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                G[i, j] = G[j, i] = grow[f"g_{i}_{j}"]
        # Cholesky-QR; jitter if the block degenerated
        try:
            R = np.linalg.cholesky(G + 1e-12 * np.eye(k)).T
        except np.linalg.LinAlgError:
            R = np.linalg.cholesky(G + 1e-6 * np.trace(G) * np.eye(k)).T
        rinv = np.linalg.inv(R)
        new_cols = [
            sum(
                (F.col(str(i)) * float(rinv[i, j])) for i in range(k)
            ).alias(f"n{j}")
            for j in range(k)
        ]
        ortho = wide.select("id", *new_cols)
        # Rayleigh estimates: eigvals of R·Rᵀ? — use the Ritz values of
        # the projected operator: H = Vᵀ B V = R (since W = B·V_prev and
        # the new V = W R⁻¹ ⇒ V_prevᵀ B V_prev = Gram of half-iterates).
        # Cheap drift check: singular values of R ≈ B-eigenvalues.
        ritz = np.sort(np.linalg.svd(R, compute_uv=False))[::-1]
        stack_expr = ", ".join(f"{j}, `n{j}`" for j in range(k))
        state = ortho.selectExpr(
            "id", f"stack({k}, {stack_expr}) as (vec, val)"
        ).select("vec", "id", "val")
        state = mat.cut(it, state)
        if prev_ritz is not None:
            drift = float(np.max(np.abs(ritz - prev_ritz) / np.maximum(1.0, ritz)))
            if drift <= tol:
                break
        prev_ritz = ritz

    # Rayleigh–Ritz extraction: H = Vᵀ B V (k×k) via one more gather
    w = (
        brows.join(state.hint("shuffle_hash"), brows.src == state.id)
        .groupBy("vec", F.col("dst").alias("id"))
        .agg(F.sum(F.col("w") * F.col("val")).alias("val"))
    )
    vw = state.select(F.col("vec").alias("vi"), "id", F.col("val").alias("a")).join(
        w.select(F.col("vec").alias("vj"), "id", F.col("val").alias("b")), "id"
    )
    hrow = (
        vw.groupBy("vi", "vj").agg(F.sum(F.col("a") * F.col("b")).alias("h"))
    ).collect()
    import numpy as np  # noqa: F811

    H = np.zeros((k, k))
    for r in hrow:
        H[r["vi"], r["vj"]] = r["h"]
    H = (H + H.T) / 2.0
    evals_b, rot = np.linalg.eigh(H)  # ascending in B
    order = np.argsort(-evals_b)  # largest-B first
    evals_b = evals_b[order]
    rot = rot[:, order]
    wide = (
        state.groupBy("id").pivot("vec", vec_ids).agg(F.first("val")).na.fill(0.0)
    )
    out_cols = [
        sum((F.col(str(i)) * float(rot[i, j])) for i in range(k)).alias(f"n{j}")
        for j in range(k)
    ]
    stack_expr = ", ".join(f"{j}, `n{j}`" for j in range(k))
    final = (
        wide.select("id", *out_cols)
        .selectExpr("id", f"stack({k}, {stack_expr}) as (vec, val)")
        .select("vec", "id", "val")
    )
    final = mat.cut(max_iters + 1, final)
    brows.unpersist()
    if which == "laplacian":
        evals = [float(sigma - v) for v in evals_b]  # ascending in L
    else:
        evals = [float(v - sigma) for v in evals_b]  # descending in A
    return evals, final


def laplacian_eigenvectors(
    graph: Graph,
    cutoff: int,
    tol: float = 1e-8,
    max_iters: int = 400,
    seed: int = 42,
) -> tuple[list[float], DataFrame]:
    """``algebraic.laplacianEigenvectors(G, cutoff, reverse=True)``
    (``networkit/algebraic.py:193-197``): the ``cutoff+1`` smallest
    Laplacian eigenpairs, ascending. Returns ``(eigenvalues,
    state (vec, id, val))`` with ``vec`` ordered by eigenvalue —
    ``vec 0`` is the trivial constant vector."""
    return _block_eigen(graph, cutoff + 1, "laplacian", tol, max_iters, seed)


def adjacency_eigenvectors(
    graph: Graph,
    cutoff: int,
    tol: float = 1e-8,
    max_iters: int = 400,
    seed: int = 42,
) -> tuple[list[float], DataFrame]:
    """``algebraic.adjacencyEigenvectors(G, cutoff)`` — the ``cutoff+1``
    algebraically largest adjacency eigenpairs, descending."""
    return _block_eigen(graph, cutoff + 1, "adjacency", tol, max_iters, seed)


class SpectralPartitioner:
    """``partitioning.SpectralPartitioner`` (``partitioning.py:56-218``):
    recursive spectral bisection/trisection. ``balanced=True`` splits at
    the exact reference quantile (the ``floor(len·i/sections)``-th order
    statistic of the eigenvector over the current part — reproduced with
    an orderBy/offset pick, no driver collect of values); ``False``
    splits at the mean. Partition labels are the reference's internal
    part counters; compact with ``zip_dense_rank`` if dense labels are
    needed."""

    def __init__(self, graph: Graph, count: int, balanced: bool = True) -> None:
        self.graph = graph
        self.count = int(count)
        self.balanced = balanced
        self._labels: DataFrame | None = None

    # -- reference helpers ---------------------------------------------------
    def _eigv(self, iteration: int) -> DataFrame:
        return self._vectors.where(F.col("vec") == iteration).select("id", "val")

    def _quantiles(self, members: DataFrame, count: int) -> list[float]:
        vals = members.orderBy("val")
        n = members.count()
        sections = count + 1
        out = []
        for i in range(1, sections):
            rank = math.floor(n * i / sections)
            row = vals.offset(rank).limit(1).collect()
            out.append(float(row[0]["val"]))
        return out

    def _trisect(self, partition: int | None = None, iteration: int = 1) -> None:
        base = (
            self.graph.vertices if partition is None else self.partitions[partition]
        ).select("id")
        members = base.join(self._eigv(iteration), "id")
        q = self._quantiles(members, 2)
        pa, pb, pc = self.next_partition, self.next_partition + 1, self.next_partition + 2
        self.next_partition += 3
        self.partitions[pa] = members.where(F.col("val") < q[0]).select("id", "val")
        self.partitions[pb] = members.where(
            (F.col("val") >= q[0]) & (F.col("val") < q[1])
        ).select("id", "val")
        self.partitions[pc] = members.where(F.col("val") >= q[1]).select("id", "val")
        if partition is not None:
            del self.partitions[partition]

    def _bisect(
        self, count: int, partition: int | None = None, iteration: int = 1
    ) -> None:
        if count == 1:
            if partition is None:
                # degenerate request: everything in one part
                self.partitions[self.next_partition] = self.graph.vertices.select(
                    "id"
                ).withColumn("val", F.lit(0.0))
                self.next_partition += 1
            return
        if count == 3:
            self._trisect(partition=partition)
            return
        base = (
            self.graph.vertices if partition is None else self.partitions[partition]
        ).select("id")
        members = base.join(self._eigv(iteration), "id")
        if self.balanced:
            split = self._quantiles(members, 1)[0]
        else:
            split = float(members.agg(F.avg("val")).collect()[0][0])
        pa, pb = self.next_partition, self.next_partition + 1
        self.next_partition += 2
        self.partitions[pa] = members.where(F.col("val") < split).select("id", "val")
        self.partitions[pb] = members.where(F.col("val") >= split).select("id", "val")
        if partition is not None:
            del self.partitions[partition]
        if count > 2:
            if count % 2 == 0:
                self._bisect(count // 2, partition=pa, iteration=iteration + 1)
                self._bisect(count // 2, partition=pb, iteration=iteration + 1)
            else:
                nxt = (count - 1) // 2
                if nxt > 2:
                    self._bisect(nxt, partition=pa, iteration=iteration + 1)
                    self._bisect(nxt + 1, partition=pb, iteration=iteration + 1)
                else:
                    self._bisect(nxt, partition=pa, iteration=iteration + 1)
                    self._trisect(partition=pb, iteration=iteration + 1)

    def run(self) -> "SpectralPartitioner":
        depth = math.ceil(math.log(self.count, 2)) + 1 if self.count > 1 else 1
        _, self._vectors = laplacian_eigenvectors(self.graph, cutoff=depth)
        self._vectors = self._vectors.persist()
        self.next_partition = 0
        self.partitions: dict[int, DataFrame] = {}
        self._bisect(self.count)
        out = None
        for idx, df in self.partitions.items():
            part = df.select("id", F.lit(idx).alias("label"))
            out = part if out is None else out.unionAll(part)
        self._labels = out
        return self

    def get_partition(self) -> DataFrame:
        """``(id, label)`` — the reference's ``getPartition`` view."""
        if self._labels is None:
            raise RuntimeError("call run() first")
        return self._labels


class SpectralColoring:
    """``coloring.SpectralColoring`` (``coloring.py:6-90``): start with
    one color class, recursively split classes on the sign of the next
    adjacency eigenvector until no class contains an edge. ``max_depth``
    bounds how many eigenvectors are computed up front (the reference
    computes n−2 eagerly); a graph needing deeper splits raises."""

    def __init__(self, graph: Graph, max_depth: int = 8) -> None:
        self.graph = graph
        self.max_depth = max_depth
        self._coloring: DataFrame | None = None

    def _valid(self, members: DataFrame) -> bool:
        e = self.graph.canonical().select("src", "dst")
        ids = members.select("id")
        both = e.join(ids.withColumnRenamed("id", "src"), "src").join(
            ids.withColumnRenamed("id", "dst"), "dst"
        )
        return both.limit(1).count() == 0

    def _split(self, color: int, depth: int = 0) -> None:
        if depth >= self._depth_avail:
            raise RuntimeError(
                f"SpectralColoring needed more than max_depth={self.max_depth} "
                "eigenvectors; raise max_depth"
            )
        other = self.next_color
        self.next_color += 1
        vs = self.colors[color]
        eig = self._vectors.where(F.col("vec") == depth).select("id", "val")
        joined = vs.select("id").join(eig, "id")
        self.colors[color] = joined.where(F.col("val") >= 0).select("id")
        self.colors[other] = joined.where(F.col("val") < 0).select("id")
        if not self._valid(self.colors[color]):
            self._split(color, depth=depth + 1)
        if not self._valid(self.colors[other]):
            self._split(other, depth=depth + 1)

    def run(self) -> "SpectralColoring":
        n = self.graph.number_of_nodes()
        self._depth_avail = min(self.max_depth, max(1, n - 2))
        _, self._vectors = adjacency_eigenvectors(
            self.graph, cutoff=self._depth_avail - 1
        )
        self._vectors = self._vectors.persist()
        self.colors = {0: self.graph.vertices.select("id")}
        self.next_color = 1
        self._split(0)
        out = None
        for c, df in self.colors.items():
            part = df.select("id", F.lit(c).alias("color"))
            out = part if out is None else out.unionAll(part)
        self._coloring = out
        return self

    def get_coloring(self) -> DataFrame:
        """``(id, color)`` — ``getColoring`` as a frame."""
        if self._coloring is None:
            raise RuntimeError("call run() first")
        return self._coloring
