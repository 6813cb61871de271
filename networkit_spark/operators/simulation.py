"""Epidemic simulation (SEIR) as synchronous message-passing rounds.

Re-expresses ``cpp/simulation/EpidemicSimulationSEIR.cpp`` (the
reference's only simulation module): per timestep every Infectious node
contacts its neighbors, each contact independently exposing a
Susceptible neighbor with probability ``trans_p``; Exposed nodes become
Infectious after ``e_time`` steps, Infectious become Removed after
``i_time`` steps; a per-timestep census of the four populations is the
result.

Divergence (documented): the reference sweeps nodes with
``parallelForNodes`` mutating shared state in place, so whether a node
promoted E→I in sweep *t* also contacts its neighbors in the same sweep
is an OpenMP scheduling race (the same class of divergence as PLM/PLP's
racy move order). This implementation is SYNCHRONOUS: all transitions
read the state at round start — contacts come from nodes Infectious at
round start, and every draw is a seeded md5 uniform per (edge, round),
so runs are bit-deterministic and partition-invariant. Scale shape: one
shuffle-hash join (infectious frontier × edges) + one aggregation per
round — the BFS/PLP plan, nothing per-row in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.operators.dedup import portable_hash32
from networkit_spark.plans.iterate import Materializer

_U32 = 4294967296.0

# state codes match the reference enum order (State::S..R,
# EpidemicSimulationSEIR.hpp:41)
S, E, I, R = 0, 1, 2, 3
_STATE_NAMES = {S: "S", E: "E", I: "I", R: "R"}


class EpidemicSimulationSEIR(Algorithm):
    """``EpidemicSimulationSEIR(G, tMax, transP, eTime, iTime, zero)``
    analog (``cpp/simulation/EpidemicSimulationSEIR.cpp:16-100``).

    ``get_data()`` returns the reference's stats rows
    ``(zero, t, state, population)`` for the four states per timestep;
    ``state_frame()`` returns the final per-node ``(id, state, since)``.
    """

    def __init__(
        self,
        graph: Graph,
        t_max: int = 30,
        trans_p: float = 0.5,
        e_time: int = 2,
        i_time: int = 7,
        zero: int | None = None,
        seed: int = 42,
    ) -> None:
        super().__init__(graph)
        if not (0.0 <= trans_p <= 1.0):
            raise ValueError("trans_p must be in [0, 1]")
        if t_max < 1:
            raise ValueError("t_max must be >= 1")
        self.t_max = int(t_max)
        self.trans_p = float(trans_p)
        self.e_time = int(e_time)
        self.i_time = int(i_time)
        self.zero = zero
        self.seed = seed
        self._stats: list[tuple[int, int, int, int]] = []
        self._state: DataFrame | None = None

    def _run(self) -> None:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()

        zero = self.zero
        if zero is None:
            # reference picks a random node; deterministic analog: the
            # seeded-hash minimum over vertex ids
            zero = (
                g.vertices.select(
                    F.min(
                        F.struct(
                            portable_hash32(
                                F.col("id").cast("string"),
                                f"seir{self.seed}:zero",
                            ).alias("h"),
                            F.col("id").alias("id"),
                        )
                    ).alias("m")
                ).collect()[0]["m"]["id"]
            )
        self._zero = int(zero)

        # contact edges: forNeighborsOf(u) = out-neighbors on directed
        # graphs, all neighbors on undirected ones
        contact_edges = g.edges if g.directed else g.symmetrized()
        sym = (
            contact_edges.select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        sym = sym.repartition(shuffle_parts, "src").persist()

        # (id, st, since): since = timestamp of the last state change
        state = g.vertices.select(
            "id",
            F.when(F.col("id") == self._zero, F.lit(I))
            .otherwise(F.lit(S))
            .alias("st"),
            F.lit(0).alias("since"),
        )
        state = mat.cut(0, state)

        for t in range(self.t_max):
            infectious = state.where(F.col("st") == I).select(
                F.col("id").alias("src")
            )
            # one contact draw per directed (infectious → neighbor)
            # edge per round; a node is exposed if ANY contact succeeds
            contact = (
                sym.join(infectious.hint("shuffle_hash"), "src")
                .where(
                    portable_hash32(
                        F.concat_ws(
                            ":",
                            F.col("src"),
                            F.col("dst"),
                            F.lit(t),
                        ),
                        f"seir{self.seed}",
                    )
                    / F.lit(_U32)
                    <= self.trans_p
                )
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            new_state = (
                state.join(
                    contact.withColumn("hit", F.lit(True)), "id", "left"
                )
                .select(
                    "id",
                    F.when(
                        (F.col("st") == S) & F.col("hit").isNotNull(),
                        F.lit(E),
                    )
                    .when(
                        (F.col("st") == E)
                        & (F.lit(t) - F.col("since") >= self.e_time),
                        F.lit(I),
                    )
                    .when(
                        (F.col("st") == I)
                        & (F.lit(t) - F.col("since") >= self.i_time),
                        F.lit(R),
                    )
                    .otherwise(F.col("st"))
                    .alias("st"),
                    "since",
                    F.col("st").alias("prev"),
                )
                .select(
                    "id",
                    "st",
                    F.when(F.col("st") != F.col("prev"), F.lit(t))
                    .otherwise(F.col("since"))
                    .alias("since"),
                )
            )
            state = mat.cut(t + 1, new_state)
            census = {
                r["st"]: r["c"]
                for r in state.groupBy("st")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            }
            for s in (S, E, I, R):
                self._stats.append((self._zero, t, s, census.get(s, 0)))

        self._state = state
        sym.unpersist()

    def get_data(self) -> list[tuple[int, int, int, int]]:
        """Reference ``getData()``: rows ``(zero, t, state, population)``
        for states S(0), E(1), I(2), R(3) at every timestep."""
        self.assure_finished()
        return list(self._stats)

    def state_frame(self) -> DataFrame:
        """Final per-node ``(id, state, since)`` frame."""
        self.assure_finished()
        return self._state.select(
            "id", F.col("st").alias("state"), "since"
        )
