"""Reachability — ReachableNodes and AllSimplePaths.

Reference surface:

- ``cpp/reachability/ReachableNodes.cpp:19-130``: per-node count of
  reachable nodes. Undirected = the node's component size; directed =
  reachability over the SCC condensation (every node of an SCC reaches
  the same set). The reference's ``exact=false`` mode estimates bounds
  from sampled BFS; here the exact path is cheap enough to serve both —
  ``exact=False`` returns the exact value as both bounds (valid, tight;
  documented).
- ``cpp/reachability/AllSimplePaths.cpp``: enumerate all simple
  source→target paths up to a cutoff. Inherently exponential output —
  batched breadth-wise path extension with the visited set carried per
  path row; ``max_paths`` fails loudly before the output explodes.

Condensation reachability is a batched transitive-closure loop: state
``(src_cmp, cmp)`` pairs, one join per round over the SCC DAG —
O(DAG depth) rounds for all sources at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer


class ReachableNodes(Algorithm):
    def __init__(self, graph: Graph, exact: bool = True,
                 max_rounds: int = 10_000) -> None:
        super().__init__(graph)
        self.exact = exact
        self.max_rounds = max_rounds
        self._reach: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        mat = Materializer()
        if not g.directed:
            from networkit_spark.operators.components import (
                ConnectedComponents,
            )

            cc = ConnectedComponents(g).run()
            labels = cc.get_partition()
            sizes = labels.groupBy("label").agg(F.count("*").alias("r"))
            self._reach = labels.join(F.broadcast(sizes), "label").select(
                "id", "r"
            ).localCheckpoint()
            return

        from networkit_spark.operators.scc import (
            StronglyConnectedComponents,
        )

        scc = StronglyConnectedComponents(g).run()
        labels = scc.get_partition()  # (id, label)
        sizes = labels.groupBy(F.col("label").alias("cmp")).agg(
            F.count("*").alias("sz")
        )
        sizes = mat.cut(0, sizes)
        l_src = labels.select(F.col("id").alias("src"), F.col("label").alias("cs"))
        l_dst = labels.select(F.col("id").alias("dst"), F.col("label").alias("cd"))
        dag = (
            g.edges.select("src", "dst")
            .join(l_src, "src")
            .join(l_dst, "dst")
            .where(F.col("cs") != F.col("cd"))
            .select(F.col("cs").alias("a"), F.col("cd").alias("b"))
            .distinct()
        )
        dag = mat.cut(0, dag).persist()
        # transitive closure over the condensation: (root, cmp) pairs
        closure = sizes.select(F.col("cmp").alias("root"), F.col("cmp"))
        closure = mat.cut(0, closure)
        frontier = closure
        for rnd in range(1, self.max_rounds + 1):
            if frontier.limit(1).count() == 0:
                break
            nxt = (
                dag.join(
                    frontier.withColumnRenamed("cmp", "a").hint("shuffle_hash"),
                    "a",
                )
                .select("root", F.col("b").alias("cmp"))
                .distinct()
                .join(closure, ["root", "cmp"], "left_anti")
            )
            nxt = mat.cut(rnd, nxt)
            closure = mat.cut(rnd, closure.unionAll(nxt))
            frontier = nxt
        else:
            dag.unpersist()
            raise RuntimeError("condensation closure did not settle")
        dag.unpersist()
        per_root = (
            closure.join(F.broadcast(sizes), "cmp")
            .groupBy("root")
            .agg(F.sum("sz").alias("r"))
        )
        self._reach = labels.join(
            per_root.withColumnRenamed("root", "label"), "label"
        ).select("id", "r").localCheckpoint()

    # ------------------------------------------------------- accessors
    def get_reachable_nodes(self) -> DataFrame:
        """``(id, r)`` — reachable node count per node (including the
        node itself)."""
        self.assure_finished()
        return self._reach

    def number_of_reachable_nodes(self, u: int) -> int:
        """``ReachableNodes::numberOfReachableNodes``."""
        self.assure_finished()
        rows = self._reach.where(F.col("id") == int(u)).collect()
        if not rows:
            raise KeyError(u)
        return int(rows[0]["r"])

    def number_of_reachable_nodes_lb(self, u: int) -> int:
        """Lower bound — exact here (see module docstring)."""
        return self.number_of_reachable_nodes(u)

    def number_of_reachable_nodes_ub(self, u: int) -> int:
        """Upper bound — exact here (see module docstring)."""
        return self.number_of_reachable_nodes(u)


class AllSimplePaths(Algorithm):
    """``AllSimplePaths`` — every simple source→target path with at
    most ``cutoff`` edges. Path state rows carry their own visited
    array; each round extends every open path by one edge and keeps the
    simple ones. Output is inherently exponential — ``max_paths``
    bounds the frontier and fails loudly."""

    def __init__(
        self,
        graph: Graph,
        source: int,
        target: int,
        cutoff: int | None = None,
        max_paths: int = 1_000_000,
    ) -> None:
        super().__init__(graph)
        self.source = int(source)
        self.target = int(target)
        self.cutoff = int(cutoff) if cutoff is not None else None
        self.max_paths = max_paths
        self._paths: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        adj = (
            (g.edges if g.directed else g.symmetrized())
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        hops = self.cutoff if self.cutoff is not None else g.number_of_nodes()
        open_paths = spark.createDataFrame(
            [([self.source],)], "path array<bigint>"
        )
        open_paths = mat.cut(0, open_paths)
        found = []
        for rnd in range(1, hops + 1):
            ext = (
                adj.join(
                    open_paths.withColumn(
                        "src", F.element_at("path", -1)
                    ).hint("shuffle_hash"),
                    "src",
                )
                .where(~F.array_contains("path", F.col("dst")))
                .select(F.concat("path", F.array("dst")).alias("path"))
            )
            ext = mat.cut(rnd, ext)
            found.append(
                ext.where(F.element_at("path", -1) == self.target)
            )
            open_paths = ext.where(
                F.element_at("path", -1) != self.target
            )
            n_open = open_paths.count()
            if n_open == 0:
                break
            if n_open > self.max_paths:
                adj.unpersist()
                raise RuntimeError(
                    f"open path frontier exceeded {self.max_paths} — "
                    "tighten cutoff"
                )
        out = found[0]
        for f in found[1:]:
            out = out.unionAll(f)
        self._paths = out.localCheckpoint()
        adj.unpersist()

    # ------------------------------------------------------- accessors
    def get_all_paths(self) -> DataFrame:
        """``(path array<bigint>)`` — one row per simple path
        (``AllSimplePaths::getAllPaths``)."""
        self.assure_finished()
        return self._paths

    def number_of_simple_paths(self) -> int:
        """``AllSimplePaths::numberOfSimplePaths``."""
        self.assure_finished()
        return self._paths.count()
