"""PLM — parallel Louvain method, multi-level modularity optimization.

Reference: ``community.PLM(G, refine, gamma, par, maxIter, turbo,
recurse)`` (``cpp/community/PLM.cpp``, 325 LoC; wrapper
``networkit/community.pyx:350-391``): repeat {local move phase until no
node improves modularity; contract by the resulting partition
(``ParallelPartitionCoarsening.cpp:23-137``); recurse on the coarse
graph} and prolong the coarse partition back to the fine graph.

Spark re-expression — synchronous move sweeps (the reference's move
phase is asynchronous/OpenMP-racy like PLP; equivalence is asserted at
the invariant level: proper clustering, modularity quality, planted-
partition recovery — SURVEY §5):

Each sweep is four materialized stages, each referencing each input
frame once (single-reference rule, ``plans/iterate.py``):

    state   = labels ⋈ wdeg                      (id, comm, wdeg)
    volumes = state → groupBy(comm).sum(wdeg)    (comm, vol)
    links   = sym ⋈ state[src] → groupBy(dst, comm).sum(w)
    best    = links ⋈ volumes ⋈ state[dst] → ΔQ window argmax

Modularity gain of moving u (degree k_u) from community D to C
(``PLM.cpp`` ``modGain``):

    ΔQ = (w(u→C) − w(u→D∖u)) / W − γ·k_u·(vol(C) − vol(D∖u)) / (2W²)

A node moves only on strictly positive gain; ties break toward the
smaller community id (deterministic). Synchronous sweeps can oscillate
between symmetric states; the strict-gain rule plus the id tie-break
makes oscillation measure-zero in practice, and the sweep cap bounds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.coarsening import ParallelPartitionCoarsening
from networkit_spark.plans.iterate import Materializer, local_cut


class PLM(Algorithm):
    def __init__(
        self,
        graph: Graph,
        gamma: float = 1.0,
        max_sweeps: int = 8,
        max_levels: int = 10,
        min_moves_frac: float = 0.001,
        refine: bool = False,
    ) -> None:
        """``refine`` mirrors ``PLM(refine=...)`` (``PLM.cpp:262-284``,
        default false): after prolonging each coarse partition to the
        finer level, re-run the move phase there seeded with the
        prolonged labels."""
        if graph.directed:
            raise ValueError("PLM requires an undirected graph (PLM.cpp ctor)")
        super().__init__(graph)
        self.gamma = gamma
        self.max_sweeps = max_sweeps
        self.max_levels = max_levels
        self.min_moves_frac = min_moves_frac
        self.refine = refine
        self._labels: DataFrame | None = None
        self._timing: dict[str, list[float]] = {"move": [], "coarsen": []}

    # ----------------------------------------------------------- move phase
    def _move_phase(
        self, g: Graph, mat: Materializer, init_labels: DataFrame | None = None
    ) -> DataFrame:
        """Synchronous local-move sweeps on one level; returns labels.
        ``init_labels`` (id, comm) seeds the sweep — used by the refine
        phase (``PLM.cpp`` refine=true: re-run the move phase on the
        finer graph starting from the prolonged coarse partition)."""
        import time

        sym = (
            g.symmetrized()
            .select("src", "dst", "weight")
            .where(F.col("src") != F.col("dst"))
            .persist()
        )
        # volume convention (Louvain / Modularity.cpp): a self-loop adds
        # 2w to its node's volume but w to the total weight W — on coarse
        # levels the contracted intra-community weight lives in self-loops,
        # so this is load-bearing for correct gains after level 1
        sym_deg = g.symmetrized().groupBy(F.col("src").alias("id")).agg(
            F.sum("weight").alias("wd_sym")
        )
        self_w = (
            g.edges.where(F.col("src") == F.col("dst"))
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("weight").alias("wd_self"))
        )
        wdeg = (
            g.vertices.join(sym_deg, "id", "left")
            .join(self_w, "id", "left")
            .select(
                "id",
                (
                    F.coalesce("wd_sym", F.lit(0.0))
                    + F.coalesce("wd_self", F.lit(0.0))
                ).alias("wdeg"),
            )
            .persist()
        )
        total_w = g.canonical().agg(F.sum("weight")).collect()[0][0] or 0.0
        n = g.number_of_nodes()
        if total_w == 0:
            sym.unpersist()
            return g.vertices.select("id", F.col("id").alias("comm"))
        inv_w = 1.0 / total_w
        inv_2w2 = 1.0 / (2.0 * total_w * total_w)

        labels = mat.cut(
            0,
            init_labels.select("id", "comm")
            if init_labels is not None
            else g.vertices.select("id", F.col("id").alias("comm")),
        )
        for sweep in range(1, self.max_sweeps + 1):
            t0 = time.time()
            # stage 1: state = labels + weighted degree   [labels ×1]
            state = mat.cut(sweep, labels.join(wdeg, "id"))
            # stage 2: community volumes                  [state ×1]
            vols = mat.cut(
                sweep, state.groupBy("comm").agg(F.sum("wdeg").alias("vol"))
            )
            # stage 3: per-node weight into each neighbor community
            s_src = state.select(
                F.col("id").alias("src"), F.col("comm").alias("nbr_comm")
            )
            links = mat.cut(
                sweep,
                sym.join(s_src, "src")
                .groupBy(F.col("dst").alias("id"), "nbr_comm")
                .agg(F.sum("weight").alias("w_to")),
            )
            # stage 4: ΔQ argmax per node, window-free. Split the gain
            #   ΔQ = [w_to/W − γ·k_u·vol(C)/(2W²)]
            #      − [w(u→D∖u)/W − γ·k_u·vol(D∖u)/(2W²)]
            # into a candidate part (varies with C) and an own part
            # (constant per node): argmax over C needs only the candidate
            # part, so `min(struct(−score, comm))` — a map-side-partial
            # hash agg with the (gain desc, comm asc) tie-break baked into
            # struct ordering — replaces the row_number window, and
            # w(u→D∖u) falls out of the same agg instead of a second
            # window (same job-count trick as the PLP heaviest-label pick).
            own = state.select(
                "id", F.col("comm").alias("own_comm"), "wdeg"
            )
            v_cand = vols.select(F.col("comm").alias("nbr_comm"), F.col("vol").alias("vol_cand"))
            v_own = vols.select(F.col("comm").alias("own_comm"), F.col("vol").alias("vol_own"))
            cand = links.join(own, "id").join(v_cand, "nbr_comm")
            cand_score = (
                F.col("w_to") * inv_w
                - F.lit(self.gamma) * F.col("wdeg") * F.col("vol_cand") * inv_2w2
            )
            best = (
                cand.groupBy("id")
                .agg(
                    F.min(
                        F.when(
                            F.col("nbr_comm") != F.col("own_comm"),
                            F.struct(
                                (-cand_score).alias("neg_score"),
                                F.col("nbr_comm").alias("comm"),
                            ),
                        )
                    ).alias("best"),
                    F.max(
                        F.when(
                            F.col("nbr_comm") == F.col("own_comm"), F.col("w_to")
                        )
                    ).alias("w_to_own"),
                    F.first("own_comm").alias("own_comm"),
                    F.first("wdeg").alias("wdeg"),
                )
                .join(v_own, "own_comm")
            )
            # own part: w(u→D∖u)/W − γ·k_u·(vol_own − k_u)/(2W²)
            own_score = (
                F.coalesce(F.col("w_to_own"), F.lit(0.0)) * inv_w
                - F.lit(self.gamma)
                * F.col("wdeg")
                * (F.col("vol_own") - F.col("wdeg"))
                * inv_2w2
            )
            moves = best.where(
                F.col("best").isNotNull()
                & ((-F.col("best.neg_score") - own_score) > 0)
            ).select("id", F.col("best.comm").alias("new_comm"))
            moves = moves.transform(local_cut)
            n_moves = moves.count()
            new_labels = mat.cut(
                sweep,
                labels.join(moves, "id", "left").select(
                    "id", F.coalesce("new_comm", F.col("comm")).alias("comm")
                ),
            )
            labels = new_labels
            self._timing["move"].append(round(time.time() - t0, 4))
            if n_moves <= max(int(n * self.min_moves_frac), 0):
                break
        sym.unpersist()
        wdeg.unpersist()
        return labels

    # ----------------------------------------------------------------- run
    def _run(self) -> None:
        mat = Materializer()
        g = self.graph
        # fine-level labels, prolonged down the hierarchy as we return
        mapping_stack: list[DataFrame] = []
        graphs: list[Graph] = []
        level = 0
        current = g
        while level < self.max_levels:
            level += 1
            labels = self._move_phase(current, mat)
            n_comms = labels.select("comm").distinct().count()
            n_nodes = current.number_of_nodes()
            pc = ParallelPartitionCoarsening(
                current, labels.select("id", F.col("comm").alias("label"))
            ).run()
            graphs.append(current)
            mapping_stack.append(pc.get_fine_to_coarse_node_mapping())
            if n_comms == n_nodes:
                break
            current = pc.get_coarse_graph()
        # prolong: compose mappings top-down; with refine, re-optimize
        # each finer level seeded with its prolonged partition
        # (PLM.cpp refine=true)
        part = mapping_stack[-1].select("id", F.col("super").alias("comm"))
        if self.refine and len(mapping_stack) > 1:
            part = self._move_phase(graphs[-1], mat, init_labels=part)
        for i in reversed(range(len(mapping_stack) - 1)):
            part = (
                mapping_stack[i]
                .select("id", F.col("super").alias("pid"))
                .join(part.select(F.col("id").alias("pid"), "comm"), "pid")
                .select("id", "comm")
                .transform(local_cut)
            )
            if self.refine:
                part = self._move_phase(graphs[i], mat, init_labels=part)
        self._labels = part.select("id", F.col("comm").alias("label"))

    def get_partition(self) -> DataFrame:
        """``(id, label)`` final communities (labels = coarse ids)."""
        self.assure_finished()
        return self._labels

    def get_timing(self) -> dict[str, list[float]]:
        self.assure_finished()
        return self._timing
