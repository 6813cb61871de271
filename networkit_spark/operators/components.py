"""Connected components — hash-min label propagation.

Reference semantics:

- ``ConnectedComponents`` (``cpp/components/ConnectedComponentsImpl.cpp:
  24-101``) runs BFS per unvisited node, labels = discovery order. BFS is
  inherently sequential; the reference itself ships the parallel variant
  ``ParallelConnectedComponents`` (``ParallelConnectedComponents.cpp:
  20-97``): labels init to node id (``Partition::allToSingletons``,
  ``cpp/structures/Partition.cpp:30-33``), then repeated
  ``label[u] ← min(label[u], min_{v∈N(u)} label[v])`` with coarsening
  recursion after 8 rounds (``:81-94``).
- The **partition** (which nodes share a component) is identical across
  variants; only the label values differ. We canonicalize to
  ``label = min node id in component`` — comparisons against the
  reference's discovery-order labels go through this relabel (SURVEY §5).

Spark plan per round (the canonical distributed hash-min):

    sym_edges ⋈ labels on src → groupBy(dst).min(label) → least(old, new)

with per-vertex self-loop rows injected into the symmetric edge table so
the round plan touches the label state exactly once (single-reference
rule, ``plans/iterate.py``). Round count is O(diameter) — fine for web
graphs (effective diameter ~6-20); for pathological chains, contract by
current labels with ``ParallelPartitionCoarsening`` and recurse (the
reference's own accelerator, ``ParallelConnectedComponents.cpp:81-94``).
Convergence = zero labels changed (one scalar agg per round). Rounds are
lineage-cut / durably checkpointed like PageRank.

``WeaklyConnectedComponents`` (``WeaklyConnectedComponents.cpp``, neighbors
= out ∪ in per ``ConnectedComponentsImpl.cpp:58-59``) is the same kernel
over the symmetrized directed edge table.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import CheckpointStore, Materializer


class ConnectedComponents(Algorithm):
    """Undirected connected components; rejects directed input like the
    reference ctor (``ConnectedComponentsImpl.cpp:14-17``)."""

    def __init__(
        self,
        graph: Graph,
        store: CheckpointStore | None = None,
        shortcut: bool = False,  # accepted for API stability; see _run note
        max_iterations: int = 200,
        fastsv_fallback: bool = True,
    ) -> None:
        if graph.directed and type(self) is ConnectedComponents:
            raise ValueError(
                "ConnectedComponents requires an undirected graph; use "
                "WeaklyConnectedComponents (ConnectedComponentsImpl.cpp:14-17)"
            )
        super().__init__(graph)
        self.store = store
        self.shortcut = shortcut
        self.max_iterations = max_iterations
        self.fastsv_fallback = fastsv_fallback
        self._labels: DataFrame | None = None
        self._iterations = 0
        self._converged = False

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        sym = (
            g.symmetrized()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .select("src", "dst", F.lit(False).alias("is_self"))
        )
        # flagged self-loop per vertex: the "min over neighbors AND self"
        # gather becomes ONE join against labels (single-reference rule,
        # plans/iterate.py) instead of gather + least(old, new), and the
        # flag carries each node's previous label through the same
        # aggregation so the per-round changed-count is a scan of the
        # materialized result, not an old⋈new join job
        sym = sym.unionAll(
            g.vertices.select(
                F.col("id").alias("src"), F.col("id").alias("dst"),
                F.lit(True).alias("is_self"),
            )
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        sym = sym.repartition(shuffle_parts, "src").persist()

        mat = Materializer(self.store)
        start_iter = 0
        labels = None
        if self.store is not None:
            resumed = self.store.latest(spark)
            if resumed is not None:
                start_iter, labels = resumed
                if "old_label" in labels.columns:
                    labels = labels.select("id", "label")
        if labels is None:
            # allToSingletons (Partition.cpp:30-33): label = own id
            labels = g.vertices.select("id", F.col("id").alias("label"))
            labels = mat.cut(0, labels, {"phase": "init"})

        it = start_iter
        while it - start_iter < self.max_iterations:
            t0 = time.time()
            it += 1
            # min label over {self} ∪ N(u): the self-loop rows inject each
            # node's own label, so `labels` is referenced exactly once in
            # the round plan (single-reference rule). Monotone: labels
            # only decrease, so this equals least(own, neighbor-min).
            cand = (
                sym.join(labels.hint("shuffle_hash"), sym.src == labels.id)
                .groupBy(F.col("dst").alias("id"))
                .agg(
                    F.min("label").alias("label"),
                    # exactly one self row per dst → its previous label
                    F.max(F.when(F.col("is_self"), F.col("label"))).alias(
                        "old_label"
                    ),
                )
            )
            # NOTE: no pointer-doubling shortcut — label[label[u]] is a
            # self-join of the in-flight state (two references), which
            # violates the single-reference rule and measured exponential.
            # Round count is O(diameter); web link graphs have effective
            # diameter ~6-20, and the coarsening operator (coarsening.py)
            # is the scale accelerator if a pathological chain appears.
            cand = mat.cut(it, cand, None) if self.store is None else cand
            changed = cand.where(F.col("label") != F.col("old_label")).count()
            if self.store is not None:
                cand = mat.cut(
                    it,
                    cand,
                    {
                        "algo": "connected_components",
                        "changed": changed,
                        "iter_wall_s": round(time.time() - t0, 4),
                    },
                )
            labels = cand.select("id", "label")
            if changed == 0:
                self._converged = True
                break
        else:
            # Exhausted max_iterations with labels still moving: hash-min
            # needs O(diameter) rounds, so a component with diameter >
            # max_iterations (e.g. a crawl-trap chain) would otherwise
            # silently yield a WRONG partition. With a durable checkpoint
            # store the partial state is resumable (a fresh run with the
            # same run_id continues from the last iteration), so only warn;
            # without one the partial labels are unreachable garbage —
            # fail loudly. Accessors guard on convergence either way.
            if self.store is None:
                if self.fastsv_fallback:
                    # O(log n) rescue for pathological diameters. NOTE:
                    # label-region COARSENING (the reference's
                    # ParallelConnectedComponents.cpp:81-94 accelerator)
                    # does NOT work here: after k hash-min rounds on a
                    # long chain each node's label is the min of its
                    # k-ball — a DISTINCT value per node — so regions
                    # are singletons and contraction shrinks nothing.
                    # FastSV's grandparent hooking + shortcutting is the
                    # correct accelerator, and it is plan-safe at this
                    # point because the label frame is materialized each
                    # round (the self-join is over a checkpointed frame,
                    # not in-flight state — see plans/iterate.py).
                    self._labels = self._fastsv_finish(labels, sym)
                    self._iterations = it - start_iter
                    self._converged = True
                    sym.unpersist()
                    return
                sym.unpersist()
                raise RuntimeError(
                    f"connected components did not converge in "
                    f"{self.max_iterations} rounds ({changed} labels still "
                    "changing); graph diameter exceeds max_iterations — raise "
                    "max_iterations or enable fastsv_fallback"
                )
            import warnings

            warnings.warn(
                f"connected components stopped after {self.max_iterations} "
                f"rounds with {changed} labels still changing; state is "
                "checkpointed — resume with the same run_id to continue",
                RuntimeWarning,
                stacklevel=2,
            )
        self._iterations = it - start_iter
        self._labels = labels
        sym.unpersist()

    def _fastsv_finish(self, labels: DataFrame, sym: DataFrame) -> DataFrame:
        """Finish a partially-converged hash-min run with FastSV rounds
        (Zhang, Azad & Yelick, "FastSV: a distributed-memory connected
        component algorithm with fast convergence", SIAM PP 2020 —
        public result): treat the label as a parent pointer f(u) (an id
        in u's component with f(u) ≤ u, which hash-min guarantees) and
        iterate

            g(u)   = f(f(u))                       (grandparent)
            mn(u)  = min over v ∈ N(u)∪{u} of g(v) (neighbor gather)
            f'(x)  = min(f(x), min_{u: g(u)=x} mn(u), mn(x))  (hooking)
            f''(u) = f'(f'(u))                     (shortcutting)

        f only decreases and stays inside the component; at the
        fixpoint f is constant per component (both endpoints of every
        edge agree) and equals the component's min id. Pointer jumping
        makes rounds O(log n) instead of O(diameter). Every round is
        materialized, so the f∘f self-joins are over checkpointed
        frames — linear plans."""
        from networkit_spark.plans.iterate import local_cut

        adj = sym.where(~F.col("is_self")).select("src", "dst")
        f = local_cut(labels)  # (id, label)
        for _ in range(64):  # log2-bounded; 64 covers any vertex count
            f2 = (
                f.join(
                    f.select(
                        F.col("id").alias("label"),
                        F.col("label").alias("glabel"),
                    ),
                    "label",
                )
                .select("id", F.col("glabel").alias("g"))
            )
            f2 = local_cut(f2)
            # mn(u) = min over N(u) ∪ {u} of g(v)
            gather = (
                adj.join(
                    f2.select(F.col("id").alias("src"), F.col("g").alias("gs")),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("gs").alias("nbr_g"))
            )
            mn = f2.join(gather, "id", "left").select(
                "id", F.least("g", F.coalesce("nbr_g", F.col("g"))).alias("mn")
            )
            mn = local_cut(mn)
            # hooking: push mn(u) onto grandparent g(u) and onto u itself
            hooks = (
                f2.join(mn, "id")
                .groupBy(F.col("g").alias("id"))
                .agg(F.min("mn").alias("hook"))
            )
            f1 = (
                f.join(hooks, "id", "left")
                .join(mn, "id", "left")
                .select(
                    "id",
                    F.least(
                        "label",
                        F.coalesce("hook", F.col("label")),
                        F.coalesce("mn", F.col("label")),
                    ).alias("label"),
                )
            )
            f1 = local_cut(f1)
            # shortcutting: f''(u) = f'(f'(u))
            nf = (
                f1.join(
                    f1.select(
                        F.col("id").alias("label"),
                        F.col("label").alias("ll"),
                    ),
                    "label",
                )
                .select("id", F.col("ll").alias("label"))
            )
            nf = local_cut(nf)
            changed = (
                nf.join(f.withColumnRenamed("label", "old"), "id")
                .where(F.col("label") != F.col("old"))
                .count()
            )
            f = nf
            if changed == 0:
                return f
        raise RuntimeError(
            "FastSV fallback did not converge in 64 rounds — this should "
            "be impossible (pointer jumping halves chain length per round)"
        )

    # ------------------------------------------------------------ accessors
    def _assure_converged(self) -> None:
        self.assure_finished()
        if not self._converged:
            raise RuntimeError(
                "connected components did not converge (stopped at "
                f"max_iterations={self.max_iterations}); partial labels are "
                "checkpointed — resume with the same run_id to finish"
            )

    def get_partition(self) -> DataFrame:
        """``labels(id, label)`` with label = min node id in component —
        the canonical relabel of the reference's Partition
        (``components.pyx:47-55``)."""
        self._assure_converged()
        return self._labels

    def number_of_components(self) -> int:
        """``ConnectedComponents::numberOfComponents``
        (``components.pyx:57-63``)."""
        self._assure_converged()
        return self._labels.select("label").distinct().count()

    def component_of_node(self, u: int) -> int:
        self._assure_converged()
        rows = self._labels.where(F.col("id") == u).collect()
        if not rows:
            raise KeyError(u)
        return rows[0]["label"]

    def get_component_sizes(self) -> DataFrame:
        """``getComponentSizes`` ≡ ``Partition::subsetSizes``
        (``Partition.cpp:100-108``)."""
        self._assure_converged()
        return self._labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))

    def number_of_iterations(self) -> int:
        self.assure_finished()
        return self._iterations

    def compact_partition(self) -> DataFrame:
        """Dense 0-based component ids (``Partition::compact``,
        ``Partition.cpp:69-98``): dense_rank over distinct labels."""
        self.assure_finished()
        from networkit_spark.graph import zip_dense_rank

        distinct = zip_dense_rank(self._labels, "label", "compact_label")
        return self._labels.join(F.broadcast(distinct), "label").select(
            "id", F.col("compact_label").alias("label")
        )


class WeaklyConnectedComponents(ConnectedComponents):
    """Directed weakly-connected components: same kernel, neighbors
    = out ∪ in (``WeaklyConnectedComponents.cpp``,
    ``ConnectedComponentsImpl.cpp:10-22,58-59``)."""

    def __init__(self, graph: Graph, **kwargs) -> None:
        if not graph.directed:
            raise ValueError(
                "WeaklyConnectedComponents requires a directed graph "
                "(ConnectedComponentsImpl.cpp:19-22)"
            )
        super().__init__(graph, **kwargs)


def extract_largest_connected_component(
    graph: Graph, compact: bool = False
) -> Graph:
    """``ConnectedComponents::extractLargestConnectedComponent``
    (``ConnectedComponentsImpl.cpp:72-101``): labels → argmax component by
    size → induced subgraph; ``compact=True`` remaps the surviving node
    ids to dense 0..k-1 by ascending original id (dense_rank)."""
    cc = ConnectedComponents(graph).run()
    labels = cc.get_partition()
    top = (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), F.asc("label"))
        .limit(1)
    )
    keep = labels.join(F.broadcast(top.select("label")), "label").select("id")
    sub = graph.subgraph_from_nodes(keep)
    if not compact:
        return sub
    from networkit_spark.graph import zip_dense_rank

    remap = zip_dense_rank(keep, "id", "new_id")
    e = sub.edges
    e = (
        e.join(remap.withColumnRenamed("id", "src").withColumnRenamed("new_id", "new_src"), "src")
        .join(remap.withColumnRenamed("id", "dst").withColumnRenamed("new_id", "new_dst"), "dst")
        .select(
            F.col("new_src").alias("src"), F.col("new_dst").alias("dst"), "weight"
        )
    )
    verts = remap.select(F.col("new_id").alias("id"))
    return Graph(e, directed=graph.directed, weighted=graph.weighted, vertices=verts)
