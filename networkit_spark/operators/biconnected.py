"""Biconnected components — Tarjan–Vishkin over a BFS spanning forest.

Reference: ``BiconnectedComponents``
(``cpp/components/BiconnectedComponents.cpp:36-127``,
``include/networkit/components/BiconnectedComponents.hpp:26-72``) — an
iterative Tarjan DFS assigning each EDGE to exactly one block;
``getComponentSizes`` counts the distinct NODES per block and
``getComponentsOfNode`` returns every block touching a node.

A DFS is inherently sequential, so this engine computes the same blocks
with the classic DFS-free parallel formulation — Tarjan & Vishkin, "An
efficient parallel biconnectivity algorithm", SIAM J. Computing 14(4),
1985 (public result): root ANY spanning tree, number vertices in
preorder, compute subtree sizes ``nd`` and subtree-reach values
``low``/``high``, then build an auxiliary graph H over the tree edges
(one H-vertex per non-root vertex v, standing for the tree edge
(p(v), v)) with

  rule 1: for each non-tree edge {u, v} with neither endpoint an
          ancestor of the other → H-edge {u, v};
  rule 2: for each tree edge (v, w = p(v)) with w non-root → H-edge
          {v, w} iff low(v) < pre(w) or high(v) ≥ pre(w) + nd(w).

Connected components of H are exactly the biconnected components; a
non-tree edge lives in the block of its deeper endpoint's tree edge.

Spark plan (all DataFrame rounds, O(forest height) of them — the same
O(diameter) class as hash-min CC, which is small on web graphs):

1. hash-min ``ConnectedComponents`` → per-component root (= min id);
2. multi-root BFS with deterministic min-id parents → (level, parent);
3. subtree sizes bottom-up, one level per round;
4. preorder top-down: pre(v) = pre(p(v)) + 1 + Σ nd(smaller-id
   siblings) — the sibling prefix sums are ONE window over (parent),
   computed once, so each level round is a single join;
5. low/high bottom-up from pre + non-tree incident edges;
6. H edges by the two rules; blocks = hash-min CC over H (isolated
   H-vertices — bridges — keep their own id as label).

BFS-tree simplification (documented): in a BFS forest every ancestor
is at a strictly smaller level and every graph edge spans at most one
level, so an ancestor non-tree edge would connect (u, p(u)) — already
a tree edge. Hence ALL non-tree edges are unrelated-pairs and rule 1
applies to each without an ancestor test.

At scale: per-round joins are keyed on vertex ids (hash-partitioned);
level-gated rounds touch one BFS level per round; nothing collects to
the driver except 1-row scalars (forest height, counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer


class BiconnectedComponents(Algorithm):
    def __init__(self, graph: Graph, max_rounds: int = 10_000) -> None:
        if graph.directed:
            raise ValueError(
                "biconnected components cannot be computed on directed "
                "graphs (BiconnectedComponents.cpp ctor)"
            )
        super().__init__(graph)
        self.max_rounds = max_rounds
        self._edge_comps: DataFrame | None = None
        self._num: int = 0

    def _run(self) -> None:
        from networkit_spark.operators.components import ConnectedComponents

        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        canon = (
            g.canonical()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        sym = canon.unionAll(
            canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        sym = sym.repartition(shuffle_parts, "src").persist()

        # ---- 1. roots: hash-min labels are component-min ids
        labels = ConnectedComponents(g).run().get_partition()  # (id, label)

        # ---- 2. multi-root BFS forest with min-id parents
        visited = labels.where(F.col("id") == F.col("label")).select(
            "id", F.lit(0).alias("level"),
            F.lit(None).cast("long").alias("parent"),
        )
        visited = mat.cut(0, visited)
        frontier = visited
        height = 0
        for r in range(1, self.max_rounds + 1):
            cand = frontier.hint("shuffle_hash").join(
                sym, frontier.id == sym.src
            ).select(F.col("dst").alias("id"), F.col("src").alias("cand_p"))
            nxt = (
                cand.join(visited.select("id"), "id", "left_anti")
                .groupBy("id")
                .agg(F.min("cand_p").alias("parent"))
                .select("id", F.lit(r).alias("level"), "parent")
            )
            nxt = mat.cut(r, nxt)
            if nxt.limit(1).count() == 0:
                break
            visited = mat.cut(100_000 + r, visited.unionAll(nxt))
            frontier = nxt
            height = r
        else:
            sym.unpersist()
            raise RuntimeError(
                f"BFS forest did not stabilize in {self.max_rounds} rounds"
            )

        tree = visited  # (id, level, parent)

        # ---- 3. subtree sizes, bottom-up one level per round
        state = tree.select("id", "level", "parent", F.lit(1).alias("nd"))
        for lev in range(height, 0, -1):
            contrib = (
                state.where(F.col("level") == lev)
                .groupBy(F.col("parent").alias("id"))
                .agg(F.sum("nd").alias("child_nd"))
            )
            state = state.join(contrib, "id", "left").select(
                "id", "level", "parent",
                (F.col("nd") + F.coalesce("child_nd", F.lit(0))).alias("nd"),
            )
            state = mat.cut(2000 + lev, state)

        # ---- 4. preorder top-down; sibling prefix sums in one window
        w = (
            Window.partitionBy("parent")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        state = state.withColumn(
            "offset",
            F.when(
                F.col("parent").isNull(), F.lit(0)
            ).otherwise(F.lit(1) + F.coalesce(F.sum("nd").over(w), F.lit(0))),
        )
        pre = state.where(F.col("level") == 0).select(
            "id", F.lit(0).cast("long").alias("pre")
        )
        for lev in range(1, height + 1):
            parents = pre.select(
                F.col("id").alias("parent"), F.col("pre").alias("ppre")
            )
            nxt = (
                state.where(F.col("level") == lev)
                .join(parents, "parent")
                .select("id", (F.col("ppre") + F.col("offset")).alias("pre"))
            )
            pre = mat.cut(3000 + lev, pre.unionAll(nxt))

        info = (
            state.select("id", "level", "parent", "nd")
            .join(pre, "id")
        )
        info = mat.cut(4000, info)

        # ---- 5. low/high bottom-up from pre + incident non-tree edges
        tree_pairs = info.where(F.col("parent").isNotNull()).select(
            F.col("parent").alias("src"), F.col("id").alias("dst")
        )
        tree_sym = tree_pairs.unionAll(
            tree_pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        nontree = sym.join(tree_sym, ["src", "dst"], "left_anti")
        pre_of = info.select(F.col("id").alias("dst"), F.col("pre").alias("npre"))
        nt_reach = nontree.join(pre_of, "dst").groupBy(
            F.col("src").alias("id")
        ).agg(F.min("npre").alias("nt_low"), F.max("npre").alias("nt_high"))
        lh = info.join(nt_reach, "id", "left").select(
            "id", "level", "parent", "nd", "pre",
            F.least("pre", F.coalesce("nt_low", F.col("pre"))).alias("low"),
            F.greatest("pre", F.coalesce("nt_high", F.col("pre"))).alias("high"),
        )
        lh = mat.cut(5000, lh)
        for lev in range(height, 0, -1):
            contrib = (
                lh.where(F.col("level") == lev)
                .groupBy(F.col("parent").alias("id"))
                .agg(F.min("low").alias("c_low"), F.max("high").alias("c_high"))
            )
            lh = lh.join(contrib, "id", "left").select(
                "id", "level", "parent", "nd", "pre",
                F.least("low", F.coalesce("c_low", F.col("low"))).alias("low"),
                F.greatest(
                    "high", F.coalesce("c_high", F.col("high"))
                ).alias("high"),
            )
            lh = mat.cut(6000 + lev, lh)

        # ---- 6. auxiliary graph H over non-root vertices
        nonroot = lh.where(F.col("parent").isNotNull())
        # rule 1: every non-tree edge joins the two child-side tree
        # edges (BFS forest ⇒ no ancestor non-tree edges; see module doc)
        nt_canon = nontree.where(F.col("src") < F.col("dst"))
        roots = lh.where(F.col("parent").isNull()).select(
            F.col("id").alias("r"), F.lit(True).alias("is_root")
        )
        h1 = (
            nt_canon.join(
                roots.withColumnRenamed("r", "src"), "src", "left_anti"
            ).join(roots.withColumnRenamed("r", "dst"), "dst", "left_anti")
            .select("src", "dst")
        )
        # rule 2: tree edge (v, w=p(v)), w non-root, subtree(v) escapes w
        pinfo = lh.select(
            F.col("id").alias("parent"), F.col("pre").alias("wpre"),
            F.col("nd").alias("wnd"), F.col("parent").alias("gparent"),
        )
        h2 = (
            nonroot.join(pinfo, "parent")
            .where(F.col("gparent").isNotNull())
            .where(
                (F.col("low") < F.col("wpre"))
                | (F.col("high") >= F.col("wpre") + F.col("wnd"))
            )
            .select(F.col("id").alias("src"), F.col("parent").alias("dst"))
        )
        h_edges = h1.unionAll(h2).select(
            "src", "dst", F.lit(1.0).alias("weight")
        )
        h_labels = (
            ConnectedComponents(Graph(h_edges, directed=False, weighted=True))
            .run()
            .get_partition()
        )
        block_of = (
            nonroot.select("id")
            .join(h_labels, "id", "left")
            .select("id", F.coalesce("label", F.col("id")).alias("block"))
        )
        block_of = mat.cut(7000, block_of)

        # ---- 7. per-edge block labels
        tree_edges = (
            nonroot.select("id", "parent")
            .join(block_of, "id")
            .select(
                F.least("id", "parent").alias("u"),
                F.greatest("id", "parent").alias("v"),
                "block",
            )
        )
        lev_of = lh.select(F.col("id").alias("dst"), F.col("level").alias("dlev"))
        nt_deep = (
            nt_canon.join(
                lh.select(F.col("id").alias("src"), F.col("level").alias("slev")),
                "src",
            )
            .join(lev_of, "dst")
            .select(
                "src", "dst",
                F.when(F.col("slev") >= F.col("dlev"), F.col("src"))
                .otherwise(F.col("dst"))
                .alias("deep"),
            )
        )
        nt_edges = (
            nt_deep.join(
                block_of.withColumnRenamed("id", "deep"), "deep"
            ).select(
                F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"),
                "block",
            )
        )
        self._edge_comps = mat.cut(8000, tree_edges.unionAll(nt_edges))
        self._num = int(
            self._edge_comps.agg(
                F.countDistinct("block").alias("c")
            ).collect()[0]["c"]
        )
        sym.unpersist()

    # ----------------------------------------------------------- access
    def edge_components(self) -> DataFrame:
        """``(u, v, block)`` — every edge's biconnected component
        (u < v canonical; block = min vertex id of the block's H-part)."""
        self.assure_finished()
        return self._edge_comps

    def number_of_components(self) -> int:
        """``BiconnectedComponents::numberOfComponents``."""
        self.assure_finished()
        return self._num

    def components_of_node(self) -> DataFrame:
        """``(id, block)`` — every block touching the node
        (``getComponentsOfNode``); isolated vertices have no row."""
        self.assure_finished()
        e = self._edge_comps
        return (
            e.select(F.col("u").alias("id"), "block")
            .unionAll(e.select(F.col("v").alias("id"), "block"))
            .distinct()
        )

    def get_component_sizes(self) -> DataFrame:
        """``(block, size)`` — distinct NODES per block
        (``getComponentSizes`` semantics)."""
        self.assure_finished()
        return self.components_of_node().groupBy("block").agg(
            F.count(F.lit(1)).alias("size")
        )
