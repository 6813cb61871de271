"""Node2Vec — p/q-biased random walks + co-occurrence embeddings.

Reference: ``Node2Vec`` (``cpp/embedding/Node2Vec.cpp:36-62``,
``include/networkit/embedding/Node2Vec.hpp:31-46``) over
``BiasedRandomWalk`` (``cpp/embedding/BiasedRandomWalk.cpp:48-120``):
N walks per node of length L; the FIRST hop is uniform over neighbors
(``oneWalk``: ``Aux::Random::index(nn)``, weight-blind), later hops
sample neighbor ``x`` of ``cur`` with unnormalized probability

    weight/p   if x == prev          (return)
    weight     if x in N(prev)       (triangle / stay local)
    weight/q   otherwise             (drift away)

then ``learnEmbeddings`` runs word2vec SGNS over the walk corpus
(window 10). The reference's GTest (``FiniteEmbeddingTest.cpp``) checks
finiteness of the features, not specific values — the embedding step is
stochastic by nature.

Spark-first re-expression (not a port):

- **Walks** are L join-agg rounds over the adjacency DataFrame. Each
  round: candidates = state ⋈ adj on ``cur = src`` (SHUFFLE_HASH, state
  is the small side); the ``x ∈ N(prev)`` predicate is a left join of
  the candidate (prev, x) pairs against the same edge set — the wedge
  join this engine already leans on for triangles. Sampling one
  neighbor per walk is the Efraimidis–Spirakis exponential race
  (public: "Weighted random sampling with a reservoir", IPL 2006):
  key = -ln(u)/bias with u a seeded xxhash64 uniform per (walk, step,
  candidate); min_by(key) is an ordinary aggregation, so the whole
  step is one shuffle with partial aggregation — no alias tables, no
  per-vertex state, hub candidates fold map-side.
- **Embeddings**: SGNS factorizes the shifted PPMI co-occurrence
  matrix (Levy & Goldberg, "Neural word embedding as implicit matrix
  factorization", NeurIPS 2014 — public result), so we build the PPMI
  matrix of window-``win`` walk co-occurrences exactly (one self-join
  on walk_id + groupBy) and project it to D dims with a seeded
  Rademacher (±1) random projection (Johnson–Lindenstrauss; Achlioptas
  2003). Fully deterministic given the seed, one explode + groupBy —
  the nnz·D blowup is bounded by partial aggregation and a modest D.

Determinism: every random choice derives from ``xxhash64(seed, ...)``,
so results are bit-stable across runs and partitionings — pytest gates
seeded determinism; the driver gate is rows+schema (stochastic
estimator has no closed SQL form).

At 100 TB: per-round shuffle volume is Σ deg(cur) over active walks
(the gather this engine's PageRank already sustains); the race
aggregation is partially aggregated map-side; nothing collects to the
driver. The co-occurrence matrix is vocab²-bounded and the projection
shuffles nnz·D rows once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.base import Algorithm
from networkit_spark.plans.iterate import Materializer

#: 2^64 as float, to map xxhash64 onto (0, 1]
_U64 = float(1 << 64)


def _uniform(*cols, seed: int) -> F.Column:
    """Deterministic uniform in (0, 1] from xxhash64 of the columns."""
    h = F.xxhash64(F.lit(seed), *cols)
    # shift from [-2^63, 2^63) to (0, 2^64] then scale
    return (h.cast("double") + F.lit(2.0**63) + F.lit(1.0)) / F.lit(_U64)


class Node2Vec(Algorithm):
    """p/q-biased walks + PPMI-projection embeddings (see module doc)."""

    def __init__(
        self,
        graph: Graph,
        p: float = 1.0,
        q: float = 1.0,
        walk_length: int = 80,
        walks_per_node: int = 10,
        dim: int = 128,
        window: int = 10,
        seed: int = 1,
        portable: bool = False,
    ) -> None:
        """``portable=True`` swaps every random draw from ``xxhash64``
        to the md5-prefix hash (``dedup.portable_hash32``) and fixes
        the PPMI lanes on the 1e-6 integer lattice, making the ENTIRE
        pipeline — walks, co-occurrence, PPMI, Rademacher projection —
        reproducible bit-for-bit in ANSI SQL: the walk race keys are
        ``−ln(u)/bias`` with dyadic biases (weight·{1/p, 1, 1/q} for
        dyadic p, q) and dyadic-rational u, the co-occurrence and PPMI
        inputs are exact integers, and the projection sums integers
        below 2^53 (exact in any order). ``projection_lanes()`` then
        exposes the all-integer pre-normalization frame the driver
        gate hashes against a DuckDB twin."""
        if p <= 0 or q <= 0:
            raise ValueError("p and q must be positive")
        if walk_length < 1 or walks_per_node < 1 or dim < 1 or window < 1:
            raise ValueError("walk_length, walks_per_node, dim, window >= 1")
        super().__init__(graph)
        self.p = float(p)
        self.q = float(q)
        self.walk_length = walk_length
        self.walks_per_node = walks_per_node
        self.dim = dim
        self.window = window
        self.seed = seed
        self.portable = portable
        self._walks: DataFrame | None = None
        self._features: DataFrame | None = None
        self._lanes: DataFrame | None = None

    # ------------------------------------------------------------ walks
    def _biased_walks(self) -> DataFrame:
        g = self.graph
        spark = g.edges.sparkSession
        mat = Materializer()
        adj = (
            (g.edges if g.directed else g.symmetrized())
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        adj = adj.repartition(shuffle_parts, "src").persist()
        # edge-set view for the x ∈ N(prev) probe (weights irrelevant)
        pairs = adj.select(
            F.col("src").alias("prev"), F.col("dst").alias("x"),
            F.lit(True).alias("is_nbr"),
        )

        # walk_id = start * walks_per_node + replica — dense and stable
        starts = g.vertices.select(
            F.explode(
                F.sequence(
                    F.col("id") * self.walks_per_node,
                    F.col("id") * self.walks_per_node + self.walks_per_node - 1,
                )
            ).alias("walk_id"),
            F.col("id").alias("cur"),
        ).select("walk_id", F.lit(None).cast("long").alias("prev"), "cur")

        emitted = [
            starts.select(
                "walk_id", F.lit(0).alias("pos"), F.col("cur").alias("node")
            )
        ]
        state = mat.cut(0, starts)

        for step in range(1, self.walk_length):
            cand = state.hint("shuffle_hash").join(
                adj, state.cur == adj.src
            ).select(
                "walk_id", "prev",
                F.col("src").alias("cur"), F.col("dst").alias("x"), "weight",
            )
            if step == 1:
                # first hop: uniform over neighbors, weight-blind
                # (BiasedRandomWalk.cpp oneWalk: Aux::Random::index)
                bias = F.lit(1.0)
            else:
                cand = cand.join(pairs, ["prev", "x"], "left")
                bias = (
                    F.when(F.col("x") == F.col("prev"),
                           F.col("weight") / self.p)
                    .when(F.col("is_nbr"), F.col("weight"))
                    .otherwise(F.col("weight") / self.q)
                )
            if self.portable:
                from networkit_spark.operators.dedup import portable_hash32

                h = portable_hash32(
                    F.concat_ws(
                        ":",
                        F.col("walk_id").cast("string"),
                        F.lit(step).cast("string"),
                        F.col("x").cast("string"),
                    ),
                    f"n2v{self.seed}",
                )
                # dyadic rational in (0, 1] — exactly representable
                u = (h.cast("double") + F.lit(1.0)) / F.lit(2.0**32)
            else:
                u = _uniform(
                    F.col("walk_id"), F.lit(step), F.col("x"), seed=self.seed
                )
            key = -F.log(u) / bias
            # struct-min: deterministic tie rule (race, then smallest x)
            # — min_by leaves equal-race ties undefined
            nxt = (
                cand.select("walk_id", "cur", "x", key.alias("race"))
                .groupBy("walk_id")
                .agg(F.min(F.struct("race", "x", "cur")).alias("pick"))
                .select(
                    "walk_id",
                    F.col("pick.cur").alias("prev"),
                    F.col("pick.x").alias("cur"),
                )
            )
            state = mat.cut(step, nxt)
            emitted.append(
                state.select(
                    "walk_id", F.lit(step).alias("pos"),
                    F.col("cur").alias("node"),
                )
            )

        walks = emitted[0]
        for e in emitted[1:]:
            walks = walks.unionAll(e)
        walks = walks.localCheckpoint()
        adj.unpersist()
        return walks

    # -------------------------------------------------------- embedding
    def _embed(self, walks: DataFrame) -> DataFrame:
        """Shifted-PPMI co-occurrence + seeded ±1 random projection."""
        a = walks.select(
            "walk_id", F.col("pos").alias("pa"), F.col("node").alias("u")
        )
        b = walks.select(
            "walk_id", F.col("pos").alias("pb"), F.col("node").alias("w")
        )
        co = (
            a.join(b, "walk_id")
            .where(
                (F.col("pa") != F.col("pb"))
                & (F.abs(F.col("pa") - F.col("pb")) <= self.window)
            )
            .groupBy("u", "w")
            .agg(F.count(F.lit(1)).cast("double").alias("n_uw"))
        )
        tot = co.agg(F.sum("n_uw").alias("t"))
        nu = co.groupBy("u").agg(F.sum("n_uw").alias("n_u"))
        nw = co.groupBy("w").agg(F.sum("n_uw").alias("n_w"))
        ppmi = (
            co.join(nu, "u")
            .join(nw, "w")
            .crossJoin(F.broadcast(tot))
            .select(
                "u", "w",
                F.greatest(
                    F.lit(0.0),
                    F.log(F.col("n_uw") * F.col("t")
                          / (F.col("n_u") * F.col("n_w"))),
                ).alias("ppmi"),
            )
            .where(F.col("ppmi") > 0)
        )
        # Rademacher projection: sign(w, d) = ±1 from the seeded hash
        d_col = F.explode(F.sequence(F.lit(0), F.lit(self.dim - 1))).alias("d")
        if self.portable:
            from networkit_spark.operators.dedup import portable_hash32

            sign = F.when(
                portable_hash32(
                    F.concat_ws(
                        ":",
                        F.col("w").cast("string"),
                        F.col("d").cast("string"),
                    ),
                    f"n2vsign{self.seed}",
                )
                % 2
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            # 1e-6 integer lattice: the lane sum is then a sum of
            # integers < 2^53 — exact in any order, hence identical in
            # any engine (see __init__ docstring)
            contrib = F.floor(F.col("ppmi") * F.lit(1e6) + F.lit(0.5)) * sign
        else:
            sign = F.when(
                (F.xxhash64(F.lit(self.seed + 1), F.col("w"), F.col("d"))
                 % 2) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            contrib = F.col("ppmi") * sign
        comp = (
            ppmi.select("u", "w", "ppmi", d_col)
            .groupBy("u", "d")
            .agg(F.sum(contrib).alias("val"))
        )
        if self.portable:
            self._lanes = (
                self.graph.vertices.select("id")
                .crossJoin(
                    self.graph.vertices.sparkSession.range(self.dim).select(
                        F.col("id").cast("int").alias("d")
                    )
                )
                .join(
                    comp.select(F.col("u").alias("id"), "d", "val"),
                    ["id", "d"],
                    "left",
                )
                .select(
                    "id",
                    "d",
                    F.coalesce("val", F.lit(0.0)).cast("long").alias("lane"),
                )
            ).localCheckpoint()
            comp = comp.select(
                "u", "d", (F.col("val") / F.lit(1e6)).alias("val")
            )
        feats = (
            comp.groupBy(F.col("u").alias("id"))
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("d", "val"))
                    ),
                    lambda s: s["val"],
                ).alias("raw")
            )
        )
        # unit-L2 normalize so downstream cosine / ANN operators can
        # consume the column directly
        norm = F.sqrt(
            F.aggregate(
                "raw", F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        feats = feats.select(
            "id",
            F.when(norm > 0, F.transform("raw", lambda x: x / norm))
            .otherwise(F.col("raw"))
            .alias("feature"),
        )
        # isolated vertices never appear in a co-occurrence pair: emit
        # zero vectors to keep one row per node (reference getFeatures
        # returns a vector for every node)
        zeros = F.array_repeat(F.lit(0.0), self.dim)
        return (
            self.graph.vertices.join(feats, "id", "left")
            .select(
                "id",
                F.coalesce("feature", zeros).alias("feature"),
            )
        )

    def _run(self) -> None:
        walks = self._biased_walks()
        self._walks = walks
        self._features = self._embed(walks)

    # ------------------------------------------------------- accessors
    def walks(self) -> DataFrame:
        """``(walk_id, pos, node)`` — the sampled walk corpus."""
        self.assure_finished()
        return self._walks

    def get_features(self) -> DataFrame:
        """``(id, feature array<double>)`` — unit-L2 node embeddings
        (``Node2Vec::getFeatures``)."""
        self.assure_finished()
        return self._features

    def projection_lanes(self) -> DataFrame:
        """``(id, d, lane)`` — the ALL-INTEGER pre-normalization
        projection lanes (portable mode only): lane = Σ_w
        round(1e6·PPMI(u,w))·sign(w,d). Every value is an exact
        integer, so the frame is bit-reproducible across engines — the
        driver's node2vec hash gate compares it against an independent
        DuckDB recomputation of the whole pipeline."""
        self.assure_finished()
        if self._lanes is None:
            raise RuntimeError("projection_lanes requires portable=True")
        return self._lanes
