"""Deterministic graph generators as DataFrame producers.

Mirrors the reference's generator module used for test fixtures
(``cpp/generators/ErdosRenyiGenerator.cpp``,
``ClusteredRandomGraphGenerator.cpp``, ``RmatGenerator.cpp``) — but as
seeded, reproducible DataFrame programs: ``spark.range`` + arithmetic
hash-based sampling, no driver-side loops, so the same generator runs
unchanged at 10^9 nodes on a cluster. The hash is ``xxhash64`` (a Spark
built-in, stable across runs/partitionings for fixed input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import Graph

# xxhash64 returns a signed 64-bit value; map to [0,1) uniformly
_U64_SPAN = 2.0**64


def _unit_hash(*cols) -> F.Column:
    """Deterministic uniform [0,1) from hashed columns."""
    h = F.xxhash64(*cols)
    return (h.cast("double") + F.lit(2.0**63)) / F.lit(_U64_SPAN)


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = False
) -> Graph:
    """G(n, p): each (unordered) pair kept independently with prob p.

    Pairs are enumerated as ``spark.range(n*n)`` decomposed to (u,v) —
    fine for test sizes; the crossJoin-free arithmetic keeps it a single
    narrow scan. Undirected keeps u<v pairs only.
    """
    pairs = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("src"),
        (F.col("id") % n).alias("dst").cast("long"),
    )
    if directed:
        pairs = pairs.where(F.col("src") != F.col("dst"))
    else:
        pairs = pairs.where(F.col("src") < F.col("dst"))
    edges = pairs.where(_unit_hash(F.col("src"), F.col("dst"), F.lit(seed)) < p)
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(
        edges.withColumn("weight", F.lit(1.0)),
        directed=directed,
        vertices=verts,
    )


def clustered_random(
    spark: SparkSession,
    n: int,
    k: int,
    p_in: float,
    p_out: float,
    seed: int = 42,
) -> tuple[Graph, DataFrame]:
    """Planted-partition graph (``ClusteredRandomGraphGenerator.cpp``):
    n nodes in k equal clusters; intra-cluster pairs with p_in,
    inter-cluster with p_out. Returns (graph, ground_truth(id, label)).
    Used for PLP recovery tests (``CommunityGTest.cpp:67-86,125-147``)."""
    cluster = (F.col("id") % k).alias("label")
    truth = spark.range(n).select(F.col("id").cast("long"), cluster)
    pairs = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("src"),
        (F.col("id") % n).cast("long").alias("dst"),
    ).where(F.col("src") < F.col("dst"))
    same = (F.col("src") % k) == (F.col("dst") % k)
    u = _unit_hash(F.col("src"), F.col("dst"), F.lit(seed))
    edges = pairs.where(
        (same & (u < p_in)) | (~same & (u < p_out))
    ).withColumn("weight", F.lit(1.0))
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, vertices=verts), truth


def chung_lu(
    spark: SparkSession,
    n: int,
    exponent: float = 2.5,
    avg_degree: float = 8.0,
    seed: int = 42,
) -> Graph:
    """Chung-Lu expected-degree model (``cpp/generators/
    ChungLuGenerator.cpp``): undirected pair (u,v) kept with probability
    ``min(1, w_u·w_v / S)`` where ``S = Σ w``. Weights follow a
    deterministic power law ``w_i ∝ (i+1)^(-1/(exponent-1))`` scaled to
    the requested average degree — the standard web-graph degree profile.

    Pair enumeration is the same ``spark.range(n²)`` scan as
    :func:`erdos_renyi` (test scale); at cluster scale one would switch
    to per-node binomial sampling, the plan shape stays a narrow scan.
    """
    alpha = 1.0 / (exponent - 1.0)
    # driver-side closed form for the normalization (exact, no data scan);
    # w_i = c·(i+1)^-alpha with c chosen so Σ w = n·avg_degree
    s = sum((i + 1.0) ** -alpha for i in range(n))
    c = n * avg_degree / s
    pairs = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("src"),
        (F.col("id") % n).cast("long").alias("dst"),
    ).where(F.col("src") < F.col("dst"))
    wu = F.pow(F.col("src") + 1.0, -alpha) * c
    wv = F.pow(F.col("dst") + 1.0, -alpha) * c
    p = F.least(F.lit(1.0), wu * wv / F.lit(n * avg_degree))
    edges = pairs.where(_unit_hash(F.col("src"), F.col("dst"), F.lit(seed)) < p)
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges.withColumn("weight", F.lit(1.0)), directed=False, vertices=verts)


def watts_strogatz(
    spark: SparkSession, n: int, k: int = 4, p: float = 0.1, seed: int = 42
) -> Graph:
    """Watts-Strogatz small world (``cpp/generators/
    WattsStrogatzGenerator.cpp``): ring lattice (each node linked to the
    next k/2 ids) with each edge's far endpoint rewired to a uniform
    random node with probability p. One ``spark.range(n·k/2)`` scan.
    """
    half = max(1, k // 2)
    base = spark.range(n * half).select(
        (F.col("id") / half).cast("long").alias("src"),
        (
            ((F.col("id") / half).cast("long") + F.col("id") % half + 1) % n
        ).alias("ring_dst"),
    )
    u_rewire = _unit_hash(F.col("src"), F.col("ring_dst"), F.lit(seed), F.lit(1))
    u_target = _unit_hash(F.col("src"), F.col("ring_dst"), F.lit(seed), F.lit(2))
    dst = F.when(
        u_rewire < p, (u_target * n).cast("long")
    ).otherwise(F.col("ring_dst").cast("long"))
    edges = (
        base.select(F.col("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, vertices=verts)


def barabasi_albert_like(
    spark: SparkSession, n: int, k: int = 3, seed: int = 42
) -> Graph:
    """BA-style preferential attachment (``cpp/generators/
    BarabasiAlbertGenerator.cpp``). True PA is sequential (each edge
    depends on the running degree sequence); the standard scalable
    stand-in with the same stationary degree law is the *copying model*:
    node i attaches its c-th edge to ``j = floor(i · u²)`` — quadratic
    concentration toward early (high-degree) ids reproduces the rich-get-
    richer tail without sequential state. Deterministic per (i, c, seed).
    """
    rows = spark.range(k, n * k).select(
        (F.col("id") / k).cast("long").alias("src"),
        (F.col("id") % k).alias("c"),
    ).where(F.col("src") >= 1)
    u = _unit_hash(F.col("src"), F.col("c"), F.lit(seed))
    edges = (
        rows.select(
            "src", (F.pow(u, 2.0) * F.col("src")).cast("long").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, vertices=verts)


def rmat_like(
    spark: SparkSession,
    scale: int = 14,
    avg_degree: int = 16,
    seed: int = 42,
    directed: bool = True,
) -> Graph:
    """RMAT-style skewed web graph (``cpp/generators/RmatGenerator.cpp``),
    expressed without iteration: endpoints drawn from a power-law-ish
    distribution by exponentiating a uniform hash. Hub vertices exist by
    construction — the fixture for skew handling (salting /
    degree-orientation) and the bench input.

    n = 2^scale nodes, m = n·avg_degree edges; endpoint id
    = floor(n · u^3) concentrates mass near id 0 (Zipf-like tail).
    """
    n = 1 << scale
    m = n * avg_degree
    eid = spark.range(m)
    u_src = _unit_hash(F.col("id"), F.lit(seed), F.lit(1))
    u_dst = _unit_hash(F.col("id"), F.lit(seed), F.lit(2))
    edges = eid.select(
        (F.pow(u_src, 3.0) * n).cast("long").alias("src"),
        (F.pow(u_dst, 3.0) * n).cast("long").alias("dst"),
    ).withColumn("weight", F.lit(1.0))
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=directed, vertices=verts)


def hyperbolic(
    spark: SparkSession,
    n: int,
    avg_degree: float = 6.0,
    exponent: float = 3.0,
    seed: int = 42,
) -> Graph:
    """Random hyperbolic graph, threshold variant
    (``cpp/generators/HyperbolicGenerator.cpp``,
    ``include/networkit/generators/HyperbolicGenerator.hpp:24`` —
    Krioukov et al. 2010, public model): n points in the hyperbolic
    disk of radius R, angle uniform, radius with density
    ``α·sinh(αr)/(cosh(αR)−1)`` where ``α = (exponent−1)/2``; an edge
    joins every pair at hyperbolic distance ≤ R. R is calibrated the
    standard way (R ≈ 2·ln(8n/(π·k̄)) for α=1) so the expected average
    degree is ~``avg_degree``; the degree law follows ``exponent``.

    Spark plan — exact threshold graph without the n² scan:

    - points from ``spark.range`` + inverse-CDF of seeded hashes
      (deterministic, partition-stable);
    - **inner** points (r ≤ R/2) are O(e^{−αR/2}·n) — broadcast and
      test against everyone;
    - **outer×outer** pairs use an angular band join: for
      r1, r2 ≥ R/2 the reach Δθ_max(r1, r2) = arccos((cosh r1·cosh r2
      − cosh R)/(sinh r1·sinh r2)) is maximal at r1 = r2 = R/2, so
      bucketing angles at that width and joining each point with its
      own + adjacent buckets covers every qualifying pair exactly;
      the exact distance test then filters.

    This is the banding idea of von Looz & Meyerhenke's generator
    (the reference's own implementation), flattened to one exploded
    equi-join.
    """
    import math

    if n < 2:
        raise ValueError("n must be >= 2")
    alpha = (exponent - 1.0) / 2.0
    r_disk = 2.0 * math.log(8.0 * n / (math.pi * avg_degree))
    ids = spark.range(n).select(F.col("id").cast("long"))
    theta = _unit_hash(F.col("id"), F.lit(seed)) * (2.0 * math.pi)
    # inverse CDF of sinh density: F(r) = (cosh(αr)−1)/(cosh(αR)−1)
    u = _unit_hash(F.col("id"), F.lit(seed + 1))
    r = (
        F.acosh(u * (math.cosh(alpha * r_disk) - 1.0) + 1.0) / alpha
    )
    pts = ids.select("id", theta.alias("th"), r.alias("r"))
    pts = pts.localCheckpoint()

    def hyp_close(t1, r1, t2, r2):
        dth = F.abs(t1 - t2)
        dth = F.least(dth, 2.0 * math.pi - dth)
        coshd = (
            F.cosh(r1) * F.cosh(r2) - F.sinh(r1) * F.sinh(r2) * F.cos(dth)
        )
        return coshd <= math.cosh(r_disk) + 1e-12

    half = r_disk / 2.0
    inner = pts.where(F.col("r") <= half)
    outer = pts.where(F.col("r") > half)
    # inner x all (inner is exponentially small): broadcast join
    a = inner.select(
        F.col("id").alias("src"), F.col("th").alias("t1"), F.col("r").alias("r1")
    )
    b = pts.select(
        F.col("id").alias("dst"), F.col("th").alias("t2"), F.col("r").alias("r2")
    )
    e_inner = (
        b.join(F.broadcast(a), F.col("src") != F.col("dst"))
        .where(hyp_close(F.col("t1"), F.col("r1"), F.col("t2"), F.col("r2")))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    # outer x outer: band join at the maximal outer reach
    cosw = (math.cosh(half) ** 2 - math.cosh(r_disk)) / (math.sinh(half) ** 2)
    w = math.acos(max(-1.0, min(1.0, cosw)))
    n_buckets = max(1, int(2.0 * math.pi / max(w, 1e-9)))
    width = 2.0 * math.pi / n_buckets
    ob = outer.select(
        "id", "th", "r", (F.col("th") / width).cast("long").alias("b")
    )
    lhs = ob.select(
        F.col("id").alias("src"), F.col("th").alias("t1"),
        F.col("r").alias("r1"),
        F.explode(
            F.array(
                F.pmod(F.col("b") - 1, F.lit(n_buckets)),
                F.col("b"),
                F.pmod(F.col("b") + 1, F.lit(n_buckets)),
            )
        ).alias("b"),
    )
    rhs = ob.select(
        F.col("id").alias("dst"), F.col("th").alias("t2"),
        F.col("r").alias("r2"), "b",
    )
    e_outer = (
        lhs.join(rhs, "b")
        .where(F.col("src") < F.col("dst"))
        .where(hyp_close(F.col("t1"), F.col("r1"), F.col("t2"), F.col("r2")))
        .select("src", "dst")
        .distinct()
    )
    # inner-inner pairs appear in e_inner only (outer band excludes them)
    edges = e_inner.unionAll(e_outer).distinct().withColumn(
        "weight", F.lit(1.0)
    )
    return Graph(edges, directed=False, vertices=ids)


def lfr_like(
    spark: SparkSession,
    n: int,
    avg_degree: float = 8.0,
    exponent: float = 2.5,
    community_exponent: float = 1.5,
    min_community: int = 8,
    mu: float = 0.2,
    seed: int = 42,
):
    """LFR-style community benchmark graph
    (``include/networkit/generators/LFRGenerator.hpp:26``; Lancichinetti,
    Fortunato & Radicchi 2008, public model), expected-degree variant —
    named ``_like`` for the same reason as :func:`barabasi_albert_like`:
    the reference rewires to EXACT degree sequences, this generator
    keeps the LFR structure (power-law degrees with exponent
    ``exponent``, power-law community sizes with ``community_exponent``,
    mixing fraction ``mu`` of inter-community edge mass) but realizes
    it Chung-Lu style, which is the distributed-friendly formulation.

    Returns ``(Graph, ground_truth)`` where ground_truth is
    ``(id, label)`` — the planted partition for community-detection
    tests (PLP/PLM recover it at low ``mu``).
    """
    import math

    if not (0.0 <= mu <= 1.0):
        raise ValueError("mu must be in [0, 1]")
    # community sizes ∝ s^-community_exponent over a bounded range:
    # assign nodes to communities by hashed power-law draw over
    # n/min_community slots, then rank-compact
    n_comm = max(1, n // min_community)
    u_c = _unit_hash(F.col("id"), F.lit(seed + 7))
    beta = 1.0 / max(community_exponent - 1.0, 0.25)
    comm = (u_c * (n_comm ** beta)).cast("double")
    label = F.least(
        F.lit(n_comm - 1), F.pow(comm, 1.0 / beta).cast("long")
    )
    ids = spark.range(n).select(F.col("id").cast("long"))
    members = ids.select("id", label.alias("label"))
    members = members.localCheckpoint()

    # per-node Chung-Lu weight (power-law)
    alpha = 1.0 / (exponent - 1.0)
    s = float(sum((i + 1.0) ** -alpha for i in range(n)))
    c = n * avg_degree / s
    wcol = (F.pow(F.col("id") + 1.0, -alpha) * c).alias("w")

    lab_u = members.select(F.col("id").alias("src"), F.col("label").alias("lu"))
    lab_v = members.select(F.col("id").alias("dst"), F.col("label").alias("lv"))
    pairs = (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("long").alias("src"),
            (F.col("id") % n).cast("long").alias("dst"),
        )
        .where(F.col("src") < F.col("dst"))
        .join(lab_u, "src")
        .join(lab_v, "dst")
    )
    wu = F.pow(F.col("src") + 1.0, -alpha) * c
    wv = F.pow(F.col("dst") + 1.0, -alpha) * c
    base_p = F.least(F.lit(1.0), wu * wv / F.lit(n * avg_degree))
    same = F.col("lu") == F.col("lv")
    # LFR mixing: rescale so the expected INTRA edge-mass fraction is
    # (1−mu). q = intra share under unscaled Chung-Lu (one aggregate);
    # intra mass × (1−mu)/q, inter mass × mu/(1−q) keeps the total
    # expected degree ~avg_degree while planting the mixing structure.
    shares = pairs.agg(
        F.sum(F.when(same, base_p)).alias("intra"),
        F.sum(base_p).alias("tot"),
    ).collect()[0]
    q = max(1e-9, min(1.0 - 1e-9, float(shares["intra"] / shares["tot"])))
    p = F.when(
        same, F.least(F.lit(1.0), base_p * ((1.0 - mu) / q))
    ).otherwise(base_p * (mu / (1.0 - q)))
    edges = pairs.where(
        _unit_hash(F.col("src"), F.col("dst"), F.lit(seed)) < p
    ).select("src", "dst", F.lit(1.0).alias("weight"))
    g = Graph(edges, directed=False, vertices=ids)
    return g, members


class PowerlawDegreeSequence:
    """``cpp/generators/PowerlawDegreeSequence.cpp:9-190``: powerlaw
    degree distribution P(d) ∝ d^gamma on [minDeg, maxDeg] with the
    reference's fitting helpers. Driver-side utility (the table is
    maxDeg−minDeg+1 entries); the drawn SEQUENCE is seeded and
    reproducible, with the reference's even-sum fix (decrement one
    maximum-degree entry, ``PowerlawDegreeSequence.cpp:180-182``)."""

    def __init__(self, min_deg: int, max_deg: int, gamma: float) -> None:
        if min_deg > max_deg:
            raise ValueError("Error: minDeg must not be larger than maxDeg")
        if gamma > -1:
            raise ValueError("Error: gamma must be lower than -1")
        self.min_deg = int(min_deg)
        self.max_deg = int(max_deg)
        self.gamma = float(gamma)
        self._cum: list[float] | None = None

    def run(self) -> "PowerlawDegreeSequence":
        cum = []
        s = 0.0
        for d in range(self.max_deg, self.min_deg - 1, -1):
            s += float(d) ** self.gamma
            cum.append(s)
        self._cum = [c / s for c in cum]
        self._cum[-1] = 1.0
        return self

    def _assure(self) -> None:
        if self._cum is None:
            raise RuntimeError("call run() first")

    def get_expected_average_degree(self) -> float:
        self._assure()
        prev = 0.0
        avg = 0.0
        for i, c in enumerate(self._cum):
            avg += (c - prev) * (self.max_deg - i)
            prev = c
        return avg

    def get_degree(self, u: float) -> int:
        """Inverse-CDF draw for a uniform ``u`` in [0, 1)."""
        self._assure()
        import bisect

        i = bisect.bisect_right(self._cum, u)
        return self.max_deg - min(i, len(self._cum) - 1)

    def get_degree_sequence(self, n: int, seed: int = 42) -> list[int]:
        import hashlib

        self._assure()
        seq = []
        for i in range(n):
            h = hashlib.md5(f"pds{seed}:{i}".encode()).hexdigest()
            seq.append(self.get_degree(int(h[:13], 16) / 16**13))
        if sum(seq) % 2 != 0:
            seq[seq.index(max(seq))] -= 1
        return seq

    def set_minimum_from_average_degree(self, avg: float) -> None:
        """Binary search on minDeg (``PowerlawDegreeSequence.cpp:54-91``)."""
        lo, hi = 1, self.max_deg
        self.min_deg = lo
        self.run()
        if self.get_expected_average_degree() > avg:
            raise ValueError("The average degree is too low")
        if self.max_deg < avg:
            raise ValueError(
                "The average degree must not be higher than the maximum degree"
            )
        avg_l, avg_r = self.get_expected_average_degree(), float(self.max_deg)
        while lo + 1 < hi:
            self.min_deg = (lo + hi) // 2
            self.run()
            a = self.get_expected_average_degree()
            if a > avg:
                avg_r, hi = a, self.min_deg
            else:
                avg_l, lo = a, self.min_deg
        self.min_deg = lo if avg - avg_l < avg_r - avg else hi
        self._cum = None


def stochastic_blockmodel(
    spark: SparkSession,
    n: int,
    membership: list[int],
    affinity: list[list[float]],
    seed: int = 42,
) -> Graph:
    """``cpp/generators/StochasticBlockmodel.cpp``: undirected SBM —
    pair (u, v) becomes an edge with probability
    ``affinity[block(u)][block(v)]``. Membership ships as a broadcast
    frame; the k×k affinity joins by block pair, so the generator is
    one pair scan at any scale."""
    if len(membership) != n:
        raise ValueError("membership size must be n")
    k = len(affinity)
    for row in affinity:
        if len(row) != k:
            raise ValueError("affinity must be square")
    mdf = spark.createDataFrame(
        [(i, int(b)) for i, b in enumerate(membership)], "id long, block int"
    )
    adf = spark.createDataFrame(
        [
            (i, j, float(affinity[i][j]))
            for i in range(k)
            for j in range(k)
        ],
        "bu int, bv int, p double",
    )
    pairs = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("src"),
        (F.col("id") % n).cast("long").alias("dst"),
    ).where(F.col("src") < F.col("dst"))
    edges = (
        pairs.join(
            F.broadcast(mdf.withColumnRenamed("id", "src").withColumnRenamed("block", "bu")),
            "src",
        )
        .join(
            F.broadcast(mdf.withColumnRenamed("id", "dst").withColumnRenamed("block", "bv")),
            "dst",
        )
        .join(F.broadcast(adf), ["bu", "bv"])
        .where(_unit_hash(F.col("src"), F.col("dst"), F.lit(seed)) < F.col("p"))
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, vertices=verts)


def regular_ring_lattice(spark: SparkSession, n: int, k: int) -> Graph:
    """``cpp/generators/RegularRingLatticeGenerator.cpp``: every node
    links to its k nearest neighbors on each side of the ring."""
    if k < 1 or 2 * k >= n:
        raise ValueError("need 1 <= k and 2k < n")
    offs = spark.range(1, k + 1).select(F.col("id").alias("off"))
    edges = (
        spark.range(n)
        .select(F.col("id").cast("long").alias("src"))
        .crossJoin(F.broadcast(offs))
        .select(
            "src", ((F.col("src") + F.col("off")) % n).alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    verts = spark.range(n).select(F.col("id").cast("long"))
    return Graph(edges, directed=False, vertices=verts)


def _hh_edge_list(
    degrees: list[int], ignore_if_unrealizable: bool = False
) -> list[tuple[int, int]]:
    """Havel–Hakimi greedy (highest-degree node links to the
    next-highest ones). ``ignore_if_unrealizable`` mirrors the
    reference's ``ignoreIfRealizable=true``
    (``HavelHakimiGenerator.cpp:84-86``): when a node runs out of
    candidates it keeps whatever edges it got instead of raising."""
    seq = sorted(((int(d), i) for i, d in enumerate(degrees)), reverse=True)
    if sum(d for d, _ in seq) % 2 != 0 and not ignore_if_unrealizable:
        raise ValueError("degree sequence is not graphical (odd sum)")
    edges: list[tuple[int, int]] = []
    while seq and seq[0][0] > 0:
        d, u = seq.pop(0)
        take = 0
        for j in range(min(d, len(seq))):
            if seq[j][0] <= 0:
                break
            take += 1
        if take < d and not ignore_if_unrealizable:
            raise ValueError("degree sequence is not graphical")
        for j in range(take):
            dv, v = seq[j]
            edges.append((u, v))
            seq[j] = (dv - 1, v)
        seq.sort(reverse=True)
    return edges


def havel_hakimi(spark: SparkSession, degrees: list[int]) -> Graph:
    """``cpp/generators/HavelHakimiGenerator.cpp``: realize an exact
    degree sequence by the Havel–Hakimi greedy (highest-degree node
    links to the next-highest ones). The greedy is inherently
    sequential — driver-side like the reference, fixture scale; raises
    when the sequence is not graphical (the reference logs and erases)."""
    edges = _hh_edge_list(degrees)
    verts = spark.range(len(degrees)).select(F.col("id").cast("long"))
    edf = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges] or [],
        "src long, dst long, weight double",
    )
    return Graph(edf, directed=False, vertices=verts)


def dorogovtsev_mendes(spark: SparkSession, n: int, seed: int = 42) -> Graph:
    """``cpp/generators/DorogovtsevMendesGenerator.cpp``: start from a
    triangle; every new node attaches to BOTH endpoints of a uniformly
    chosen existing edge. The growth process is inherently sequential —
    driver-side seeded loop like the reference (fixture scale)."""
    if n < 3:
        raise ValueError("need n >= 3")
    import hashlib

    edges = [(0, 1), (1, 2), (0, 2)]
    for u in range(3, n):
        h = hashlib.md5(f"dm{seed}:{u}".encode()).hexdigest()
        a, b = edges[int(h[:13], 16) % len(edges)]
        edges.append((a, u))
        edges.append((b, u))
    verts = spark.range(n).select(F.col("id").cast("long"))
    edf = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    return Graph(edf, directed=False, vertices=verts)


# ---------------------------------------------------------------------------
# Geometric generators (PubWeb / Mocnik) — grid-cell spatial joins
# ---------------------------------------------------------------------------


def _torus_sqdist(x1, y1, x2, y2):
    """Squared distance on the unit torus, mirroring
    ``PubWebGenerator::squaredDistanceInUnitTorus``
    (``cpp/generators/PubWebGenerator.cpp:33-44``): each coordinate
    delta wraps into [-0.5, 0.5] before squaring."""

    def wrap(dz):
        return (
            F.when(dz > 0.5, 1.0 - dz)
            .when(dz < -0.5, dz + 1.0)
            .otherwise(dz)
        )

    dx = wrap(F.col(x1) - F.col(x2))
    dy = wrap(F.col(y1) - F.col(y2))
    return dx * dx + dy * dy


def pub_web_areas(
    n: int, num_dense_areas: int, seed: int
) -> tuple[list[dict], int]:
    """Seeded PubWeb dense-area geometry — centers, radii, per-area node
    counts and id ranges (``PubWebGenerator::{chooseDenseAreaSizes,
    chooseClusterSizes}``, ``cpp/generators/PubWebGenerator.cpp:105-126``)
    plus the total node count after rounding. Shared by the static
    point recipe and :class:`~networkit_spark.dynamic_generators.
    DynamicPubWebGenerator` (which draws NEW nodes from the same
    areas)."""
    import hashlib

    def _u(tag: str) -> float:
        h = hashlib.md5(f"pubweb{seed}:{tag}".encode()).hexdigest()
        return int(h[:13], 16) / float(1 << 52)

    max_rad, factor = 0.2, 5.0  # MAX_DENSE_AREA_RADIUS, MIN_MAX_DENSE_AREA_FACTOR
    areas = []
    for a in range(num_dense_areas):
        f = _u(f"rad{a}") * factor + 1.0
        areas.append(
            {
                "rad": max_rad * f * f / (factor * factor),
                "x": _u(f"cx{a}"),
                "y": _u(f"cy{a}"),
            }
        )
    mass = sum(c["rad"] ** 1.5 for c in areas)
    scale = (
        (n * (num_dense_areas / (num_dense_areas + 2.0))) / mass
        if mass > 0
        else 0.0
    )
    for c in areas:
        c["num"] = int(round(scale * c["rad"] ** 1.5))
    # cumulative id ranges per area; ids past the areas are background.
    # (Like the reference, rounding can overshoot n — then the graph has
    # sum(num) nodes and no background points.)
    lo = 0
    for c in areas:
        c["lo"], c["hi"] = lo, lo + c["num"]
        lo += c["num"]
    total = max(n, lo)
    return areas, total


def pub_web_points(
    spark: SparkSession,
    n: int,
    num_dense_areas: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Seeded PubWeb point distribution (``(id, x, y)`` on the unit
    torus): ``num_dense_areas`` circular dense areas with anti-quadratic
    radii holding ~``areas/(areas+2)`` of the mass, the rest uniform
    background — the coordinate recipe of
    ``PubWebGenerator::{chooseDenseAreaSizes,chooseClusterSizes,
    fillDenseAreas,spreadRemainingNodes}``
    (``cpp/generators/PubWebGenerator.cpp:105-143``) with hash-seeded
    draws instead of the sequential Mersenne stream.

    Area centers/radii/counts are O(areas) driver scalars; per-node
    coordinates are pure column expressions over ``spark.range(n)``."""
    import math

    if n < 1:
        raise ValueError("n must be >= 1")

    areas, total = pub_web_areas(n, num_dense_areas, seed)

    ids = spark.range(total).select(F.col("id").cast("long"))
    u_ang = _unit_hash(F.col("id"), F.lit(seed), F.lit("ang"))
    u_dst = _unit_hash(F.col("id"), F.lit(seed), F.lit("dst"))
    two_pi = 2.0 * math.pi
    x_expr = u_ang  # background default: uniform
    y_expr = u_dst
    for c in areas:
        in_a = (F.col("id") >= c["lo"]) & (F.col("id") < c["hi"])
        ax = c["x"] + F.cos(u_ang * two_pi) * (u_dst * c["rad"])
        ay = c["y"] + F.sin(u_ang * two_pi) * (u_dst * c["rad"])
        x_expr = F.when(in_a, ax).otherwise(x_expr)
        y_expr = F.when(in_a, ay).otherwise(y_expr)

    def into_unit(z):
        # PubWebGenerator::intoUnitSquare — single ±1 wrap
        return F.when(z > 1.0, z - 1.0).when(z < 0.0, z + 1.0).otherwise(z)

    return ids.select(
        "id", into_unit(x_expr).alias("x"), into_unit(y_expr).alias("y")
    )


def _torus_grid_pairs(pts: DataFrame, radius: float) -> DataFrame:
    """Ordered candidate pairs at torus distance ≤ ``radius`` via a
    grid-cell equi-join: the plane splits into ``nc×nc`` cells of width
    ≥ radius, the right side replicates into its 3×3 wrapped neighbor
    cells (deduped), and one hash join on the cell id yields every
    qualifying ordered pair exactly once — no n² cross join, hub-free
    shuffle keys. Returns ``(id, x, y, nbr_id, nbr_x, nbr_y, sqdist)``.
    """
    nc = max(1, int(1.0 / radius))
    cell = lambda z: F.least(  # noqa: E731
        F.lit(nc - 1), F.floor(F.col(z) * nc).cast("long")
    )
    home = pts.select(
        "id", "x", "y", (cell("x") * nc + cell("y")).alias("c")
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    repl = (
        pts.select(
            F.col("id").alias("nbr_id"),
            F.col("x").alias("nbr_x"),
            F.col("y").alias("nbr_y"),
            cell("x").alias("cx"),
            cell("y").alias("cy"),
        )
        .select(
            "nbr_id",
            "nbr_x",
            "nbr_y",
            F.explode(
                F.array_distinct(
                    F.array(
                        *[
                            ((F.col("cx") + dx + nc) % nc) * nc
                            + ((F.col("cy") + dy + nc) % nc)
                            for dx, dy in offs
                        ]
                    )
                )
            ).alias("c"),
        )
    )
    sq = _torus_sqdist("x", "y", "nbr_x", "nbr_y")
    return (
        home.join(repl, "c")
        .where(F.col("id") != F.col("nbr_id"))
        .select("id", "x", "y", "nbr_id", "nbr_x", "nbr_y", sq.alias("sqdist"))
        .where(F.col("sqdist") <= radius * radius)
    )


def pub_web(
    spark: SparkSession,
    n: int,
    num_dense_areas: int = 12,
    neighborhood_radius: float = 0.125,
    max_neighbors: int = 16,
    seed: int = 42,
) -> Graph:
    """PubWeb P2P-topology generator
    (``cpp/generators/PubWebGenerator.cpp``,
    ``include/networkit/generators/PubWebGenerator.hpp:20-43``;
    Gehweiler & Meyerhenke HPGC'10, public model).

    The reference's ``determineNeighbors`` (PubWebGenerator.cpp:47-87)
    scans all n² pairs per node, pushes in-range pairs into a priority
    queue, pops ``maxNeigh`` entries (the self pair, distance 0, always
    occupies the first slot), and inserts an edge the SECOND time a
    canonical pair is popped — i.e. an edge exists iff BOTH endpoints
    rank it within their ``maxNeigh`` nearest in-range pairs (mutual
    k-nearest-neighbors within the radius). Weight =
    ``0.01 / sqdist`` (BASE_WEIGHT, PubWebGenerator.cpp:78).

    Spark plan — the same edge set without the n² scan: grid-cell
    spatial join for in-range ordered pairs (one equi-join), self rows
    unioned in, per-anchor ``row_number`` over ``(sqdist, pair)`` keeps
    the top ``max_neighbors``, and a count-2 aggregation on the
    canonical pair realizes "popped by both endpoints". Divergences:
    hash-seeded coordinates (not the sequential Mersenne stream), and
    distance ties rank by canonical pair ascending where the
    reference's max-heap pops the larger pair first — measure-zero for
    continuous seeded coordinates."""
    from pyspark.sql import Window

    pts = pub_web_points(spark, n, num_dense_areas, seed).localCheckpoint()
    cand = _torus_grid_pairs(pts, neighborhood_radius)
    self_rows = pts.select(
        "id",
        "x",
        "y",
        F.col("id").alias("nbr_id"),
        F.col("x").alias("nbr_x"),
        F.col("y").alias("nbr_y"),
        F.lit(0.0).alias("sqdist"),
    )
    ranked = (
        cand.select("id", "nbr_id", "sqdist")
        .unionAll(self_rows.select("id", "nbr_id", "sqdist"))
        .withColumn("lo", F.least("id", "nbr_id"))
        .withColumn("hi", F.greatest("id", "nbr_id"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("id").orderBy("sqdist", "lo", "hi")
            ),
        )
        .where((F.col("rk") <= max_neighbors) & (F.col("id") != F.col("nbr_id")))
    )
    edges = (
        ranked.groupBy("lo", "hi")
        .agg(F.count("*").alias("cnt"), F.first("sqdist").alias("sqdist"))
        .where(F.col("cnt") == 2)
        .select(
            F.col("lo").alias("src"),
            F.col("hi").alias("dst"),
            (F.lit(0.01) / F.col("sqdist")).alias("weight"),
        )
    )
    verts = pts.select("id")
    return Graph(edges, directed=False, weighted=True, vertices=verts)


def mocnik_points(
    spark: SparkSession, n: int, dim: int = 2, seed: int = 42
) -> DataFrame:
    """Seeded uniform points in the d-ball of radius 0.5 around
    (0.5, …, 0.5), rejection-sampled from the unit cube exactly like
    ``MocnikGeneratorBasic::generate`` (MocnikGeneratorBasic.cpp:52-64)
    — expressed as a fixed fan of 40 seeded attempts per id with the
    first in-ball attempt winning (miss probability < 1e-25 per id at
    d=2). Returns ``(id, x0, …, x{dim-1})``."""
    attempts = 40
    ids = spark.range(n).select(F.col("id").cast("long"))
    tries = ids.select(
        "id",
        F.explode(F.array(*[F.lit(t) for t in range(attempts)])).alias("t"),
    )
    coords = [
        _unit_hash(F.col("id"), F.col("t"), F.lit(seed), F.lit(f"d{j}"))
        for j in range(dim)
    ]
    sq_c = None
    for c in coords:
        term = (c - 0.5) * (c - 0.5)
        sq_c = term if sq_c is None else sq_c + term
    cand = tries.select(
        "id",
        "t",
        *[c.alias(f"x{j}") for j, c in enumerate(coords)],
        sq_c.alias("sq_center"),
    ).where(F.col("sq_center") < 0.25)
    first = cand.groupBy("id").agg(F.min("t").alias("t"))
    return cand.join(first, ["id", "t"]).drop("t", "sq_center")


def mocnik_basic(
    spark: SparkSession,
    n: int,
    k: float = 2.5,
    dim: int = 2,
    seed: int = 42,
) -> Graph:
    """Mocnik spatial-network model, non-improved variant
    (``cpp/generators/MocnikGeneratorBasic.cpp``,
    ``include/networkit/generators/MocnikGeneratorBasic.hpp``; Mocnik
    Sci. Rep. 2018, public model): n points uniform in the d-ball of
    radius 0.5 around (0.5, …, 0.5) (rejection-sampled from the unit
    cube), and a DIRECTED edge u→v for every v ≠ u with
    ``dist(u, v) ≤ k · distMin(u)`` where distMin is u's
    nearest-neighbor distance.

    Rejection sampling is expressed as a fixed fan of seeded attempts
    per id (first in-ball attempt wins — 40 attempts put the miss
    probability below 1e-25 at d=2, raises loudly if any id misses);
    distMin is a min-aggregation over the pair frame. The pair frame is
    the arithmetic ``spark.range(n*n)`` decomposition (the model's edge
    density is Θ(n) only after distMin thresholding; candidate
    generation is quadratic in the reference too — its header calls
    this the non-improved algorithm, fixture scale)."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if k <= 1.0:
        raise ValueError("k must be > 1 (MocnikGeneratorBasic.cpp:46)")
    ids = spark.range(n).select(F.col("id").cast("long"))
    pts = mocnik_points(spark, n, dim, seed).localCheckpoint()
    if pts.count() != n:
        raise RuntimeError(
            "mocnik_basic: rejection sampling missed for some id — "
            "raise the attempt fan"
        )
    a = pts
    b = pts.select(
        F.col("id").alias("nbr_id"),
        *[F.col(f"x{j}").alias(f"y{j}") for j in range(dim)],
    )
    pair_ids = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("id"),
        (F.col("id") % n).cast("long").alias("nbr_id"),
    ).where(F.col("id") != F.col("nbr_id"))
    sq = None
    for j in range(dim):
        d = F.col(f"x{j}") - F.col(f"y{j}")
        sq = d * d if sq is None else sq + d * d
    pairs = (
        pair_ids.join(a, "id")
        .join(b, "nbr_id")
        .select("id", "nbr_id", F.sqrt(sq).alias("dist"))
    )
    pairs = pairs.localCheckpoint()
    dmin = pairs.groupBy("id").agg(F.min("dist").alias("dist_min"))
    edges = (
        pairs.join(dmin.hint("shuffle_hash"), "id")
        .where(F.col("dist") <= k * F.col("dist_min"))
        .select(
            F.col("id").alias("src"),
            F.col("nbr_id").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    return Graph(edges, directed=True, vertices=ids)


def mocnik(
    spark: SparkSession,
    dim: int,
    ns: int | list[int],
    ks: float | list[float],
    weighted: bool | list[float] = False,
    seed: int = 42,
) -> Graph:
    """Mocnik spatial-network model, improved-generator SEMANTICS
    (``cpp/generators/MocnikGenerator.cpp:19-340``,
    ``include/networkit/generators/MocnikGenerator.hpp:134-140``): the
    features the improved class adds over the basic one — multiple
    LAYERS (``ns`` node counts with per-layer ``ks``), WEIGHTED edges
    (weight = distance × per-layer relative weight; ``weighted`` may be
    the bool flag or the relative-weight list), first-layer edges
    winning on conflicts (``addEdgesToGraph``: non-base layers only add
    edges not already present, ``MocnikGenerator.cpp:288-291``). The
    reference's cell array / boxSurface machinery is purely its
    sequential neighbor-search accelerator for the SAME model — the
    distributed twin of that accelerator is the pair-frame + min-agg
    plan shared with :func:`mocnik_basic` (at scale a grid-cell join as
    in ``pub_web`` would replace the pair frame; fixture scale here,
    like the reference's own use).

    All layers share one position draw over ``max(ns)`` nodes
    (``MocnikGenerator::generate`` draws positions once, lines
    317-329); layer j's edges use the first ``ns[j]`` nodes with
    ``k = ks[j]``.
    """
    ns_list = [ns] if isinstance(ns, int) else list(ns)
    ks_list = [ks] * len(ns_list) if isinstance(ks, (int, float)) else list(ks)
    if isinstance(weighted, bool):
        rel = [1.0] * len(ns_list)
        is_weighted = weighted
    else:
        rel = [float(w) for w in weighted]
        is_weighted = True
    if len(ks_list) != len(ns_list) or len(rel) != len(ns_list):
        raise ValueError("ns, ks, and relative weights must align")
    if any(n_ <= 1 for n_ in ns_list):
        raise ValueError("every layer size must be > 1")
    if any(k_ <= 1.0 for k_ in ks_list):
        raise ValueError("every k must be > 1")
    if dim < 1:
        raise ValueError("dim must be >= 1")
    n_max = max(ns_list)
    ids = spark.range(n_max).select(F.col("id").cast("long"))
    pts = mocnik_points(spark, n_max, dim, seed).localCheckpoint()
    if pts.count() != n_max:
        raise RuntimeError("mocnik: rejection sampling missed for some id")
    b = pts.select(
        F.col("id").alias("nbr_id"),
        *[F.col(f"x{j}").alias(f"y{j}") for j in range(dim)],
    )
    sq = None
    for j in range(dim):
        d = F.col(f"x{j}") - F.col(f"y{j}")
        sq = d * d if sq is None else sq + d * d
    edges = None
    for layer, (n_l, k_l, rw) in enumerate(zip(ns_list, ks_list, rel)):
        pair_ids = spark.range(n_l * n_l).select(
            (F.col("id") / n_l).cast("long").alias("id"),
            (F.col("id") % n_l).cast("long").alias("nbr_id"),
        ).where(F.col("id") != F.col("nbr_id"))
        pairs = (
            pair_ids.join(pts, "id")
            .join(b, "nbr_id")
            .select("id", "nbr_id", F.sqrt(sq).alias("dist"))
            .localCheckpoint()
        )
        dmin = pairs.groupBy("id").agg(F.min("dist").alias("dist_min"))
        w_expr = (
            (F.col("dist") * F.lit(rw)) if is_weighted else F.lit(1.0)
        )
        layer_edges = (
            pairs.join(dmin.hint("shuffle_hash"), "id")
            .where(F.col("dist") <= k_l * F.col("dist_min"))
            .select(
                F.col("id").alias("src"),
                F.col("nbr_id").alias("dst"),
                w_expr.alias("weight"),
            )
        )
        if edges is None:
            edges = layer_edges
        else:
            # non-base layers never override an existing edge
            fresh = layer_edges.join(
                edges.select("src", "dst"), ["src", "dst"], "left_anti"
            )
            edges = edges.unionAll(fresh)
    return Graph(
        edges.localCheckpoint(), directed=True, weighted=is_weighted,
        vertices=ids,
    )


def edge_switching_markov_chain(
    spark: SparkSession,
    degrees: list[int],
    seed: int = 42,
    swaps_per_edge: int = 10,
) -> Graph:
    """``cpp/generators/EdgeSwitchingMarkovChainGenerator.cpp``: realize
    the exact degree sequence with Havel–Hakimi, then randomize by
    ``10·m`` degree-biased edge switches (pick two endpoints
    degree-proportionally, pick a random neighbor of each, swap the two
    edges unless that would create a loop, duplicate, or existing
    edge), giving up after ``2·10·m`` attempts like the reference.
    The Markov chain is inherently sequential — driver-side seeded loop
    like :func:`havel_hakimi` (fixture scale); draws come from an md5
    stream instead of the reference's Mersenne twister (documented
    divergence, same null-model distribution)."""
    adj = _esmc_adjacency(degrees, seed, swaps_per_edge=swaps_per_edge)
    out = [(u, v, 1.0) for u in adj for v in adj[u] if u < v]
    verts = spark.range(len(degrees)).select(F.col("id").cast("long"))
    edf = spark.createDataFrame(
        out or [], "src long, dst long, weight double"
    )
    return Graph(edf, directed=False, vertices=verts)


def _esmc_adjacency(
    degrees: list[int],
    seed: int,
    tag: str = "",
    swaps_per_edge: int = 10,
    ignore_if_unrealizable: bool = False,
) -> dict[int, set[int]]:
    """Pure-python EdgeSwitchingMarkovChain core: Havel–Hakimi start +
    seeded degree-biased switches. Returns the undirected adjacency
    (local node ids = positions in ``degrees``)."""
    import hashlib

    hh = _hh_edge_list(degrees, ignore_if_unrealizable)
    adj: dict[int, set[int]] = {i: set() for i in range(len(degrees))}
    for a, b in hh:
        adj[a].add(b)
        adj[b].add(a)
    node_selection: list[int] = []
    for u, d in enumerate(degrees):
        node_selection.extend([u] * int(d))
    m = len(hh)
    needed, max_try = m * swaps_per_edge, m * swaps_per_edge * 2
    performed = 0

    def draw(sub: str, span: int) -> int:
        h = hashlib.md5(f"esmc{seed}:{tag}{sub}".encode()).hexdigest()
        return int(h[:13], 16) % span

    att = 0
    while att < max_try and performed < needed and node_selection:
        att += 1
        s1 = node_selection[draw(f"a{att}", len(node_selection))]
        s2 = node_selection[draw(f"b{att}", len(node_selection))]
        if s1 == s2 or not adj[s1] or not adj[s2]:
            continue
        n1 = sorted(adj[s1])
        n2 = sorted(adj[s2])
        t1 = n1[draw(f"c{att}", len(n1))]
        t2 = n2[draw(f"d{att}", len(n2))]
        if t1 == t2 or s1 == t2 or s2 == t1:
            continue
        if t2 in adj[s1] or t1 in adj[s2]:
            continue
        adj[s1].discard(t1), adj[t1].discard(s1)
        adj[s2].discard(t2), adj[t2].discard(s2)
        adj[s1].add(t2), adj[t2].add(s1)
        adj[s2].add(t1), adj[t1].add(s2)
        performed += 1
    return adj


class _Md5Stream:
    """Deterministic uniform stream for the driver-side LFR loops."""

    def __init__(self, seed: int, tag: str) -> None:
        self._prefix = f"lfr{seed}:{tag}"
        self._i = 0

    def u(self) -> float:
        import hashlib

        self._i += 1
        h = hashlib.md5(f"{self._prefix}:{self._i}".encode()).hexdigest()
        return int(h[:13], 16) / float(1 << 52)

    def index(self, n: int) -> int:
        return min(int(self.u() * n), n - 1)

    def shuffle(self, xs: list) -> None:
        # Fisher-Yates with stream draws
        for i in range(len(xs) - 1, 0, -1):
            j = self.index(i + 1)
            xs[i], xs[j] = xs[j], xs[i]


def lfr(
    spark: SparkSession,
    n: int,
    avg_degree: int = 8,
    max_degree: int = 32,
    degree_exponent: float = -2.0,
    min_community: int = 10,
    max_community: int = 50,
    community_exponent: float = -1.0,
    mu: float = 0.2,
    seed: int = 42,
) -> tuple[Graph, DataFrame]:
    """LFR community benchmark with EXACT degree sequences
    (``cpp/generators/LFRGenerator.cpp``,
    ``include/networkit/generators/LFRGenerator.hpp:26``; Lancichinetti,
    Fortunato & Radicchi 2008, public model), the reference's own
    pipeline re-run driver-side at fixture scale:

    1. powerlaw degree sequence with the minimum fitted to
       ``avg_degree`` (``generatePowerlawDegreeSequence``);
    2. powerlaw community sizes drawn until they fill n, the remainder
       added to the smallest (``generatePowerlawCommunitySizeSequence``);
    3. internal degrees ``(1-mu)·deg`` with probabilistic rounding and
       an assured minimum of 1 (``setMu``; the reference rounds via
       ``std::remainder`` whose sign quirk biases >0.5 fractions
       downward — this implementation rounds to ceil with probability
       equal to the fraction, documented divergence);
    4. the reference's realizability checks (max/min internal degree vs
       community sizes, sorted matching) — raises RuntimeError verbatim
       when violated;
    5. node→community assignment: random feasible placement with
       eviction from full communities, merging the two smallest
       communities and restarting when assignment thrashes
       (``assignNodesToCommunities``);
    6. per-community intra graphs via EdgeSwitchingMarkovChain with the
       reference's odd-sum ±1 fix (``generateIntraClusterGraph``);
    7. one global inter graph on the external degrees, intra-community
       collisions rewired by seeded switches and dropped when
       unswappable (``generateInterClusterGraph``).

    All draws come from seeded md5 streams instead of the shared
    Mersenne twister (documented divergence — same process, independent
    randomness). Like :func:`havel_hakimi`, the construction is
    inherently sequential and driver-side (fixture scale); the
    distributed expected-degree variant for large fixtures is
    :func:`lfr_like`.

    Returns ``(Graph, ground_truth)`` with ground_truth ``(id, label)``.
    """
    if not (0.0 <= mu <= 1.0):
        raise ValueError("mu must be in [0, 1]")
    if max_degree >= n:
        raise ValueError("The maximum degree must be smaller than the number of nodes")

    # 1. degree sequence
    pds = PowerlawDegreeSequence(1, max_degree, degree_exponent)
    pds.set_minimum_from_average_degree(float(avg_degree))
    pds.run()
    degrees = pds.get_degree_sequence(n, seed=seed)

    # 2. community size sequence
    csd = PowerlawDegreeSequence(
        min_community, max_community, community_exponent
    ).run()
    cstream = _Md5Stream(seed, "csize")
    community_sizes: list[int] = []
    total = 0
    while True:
        s = csd.get_degree(cstream.u())
        if total + s <= n:
            community_sizes.append(s)
            total += s
        else:
            community_sizes[community_sizes.index(min(community_sizes))] += (
                n - total
            )
            break

    # 3. internal degrees
    istream = _Md5Stream(seed, "intdeg")
    internal = [0] * n
    for u in range(n):
        if degrees[u] == 0:
            continue
        int_deg = (1.0 - mu) * degrees[u]
        if int_deg < 1.0:
            internal[u] = 1
        else:
            frac = int_deg - int(int_deg)
            internal[u] = int(int_deg) + (1 if istream.u() < frac else 0)

    # 5. assignment (with the reference's merge-two-smallest retry);
    # 4.'s realizability checks run inside the loop because merges
    # change the community size sequence
    astream = _Md5Stream(seed, "assign")
    while True:
        max_int, min_int = max(internal), min(internal)
        if max_int >= max(community_sizes):
            raise RuntimeError(
                "Graph not realizable, the maximum internal degree is "
                "greater than the largest possible internal degree."
            )
        if min_int >= min(community_sizes):
            raise RuntimeError(
                "Graph not realizable, no node can be placed in the "
                "smallest community."
            )
        sorted_int = sorted(internal)
        sorted_sizes = sorted(community_sizes)
        ci, in_c = 0, 0
        ok = True
        for deg in sorted_int:
            if in_c == sorted_sizes[ci]:
                ci += 1
                in_c = 0
            if deg >= sorted_sizes[ci]:
                ok = False
                break
            in_c += 1
        if not ok:
            raise RuntimeError(
                "Graph not realizable, community sizes too small or "
                "internal degrees too large"
            )

        community_selection: list[int] = []
        for c, s in enumerate(community_sizes):
            community_selection.extend([c] * s)
        astream.shuffle(community_selection)
        members: list[list[int]] = [[] for _ in community_sizes]
        remaining = list(community_sizes)
        to_assign: list[int] = []
        for u in range(n):
            c = community_selection[u]
            if community_sizes[c] > internal[u]:
                members[c].append(u)
                remaining[c] -= 1
            else:
                to_assign.append(u)
        attempts = 0
        succeeded = True
        while to_assign:
            c = community_selection[astream.index(len(community_selection))]
            i = astream.index(len(to_assign))
            u = to_assign[i]
            to_assign[i] = to_assign[-1]
            to_assign.pop()
            while internal[u] >= community_sizes[c]:
                c = community_selection[
                    astream.index(len(community_selection))
                ]
            members[c].append(u)
            if remaining[c] > 0:
                remaining[c] -= 1
                attempts = 0
            else:
                r = astream.index(len(members[c]))
                to_assign.append(members[c][r])
                members[c][r] = members[c][-1]
                members[c].pop()
                attempts += 1
            if attempts > 3 * n:
                # merge the two smallest communities and restart
                mi = community_sizes.index(min(community_sizes))
                mv = community_sizes.pop(mi)
                mj = community_sizes.index(min(community_sizes))
                community_sizes[mj] += mv
                succeeded = False
                break
        if succeeded:
            break

    label_of = {}
    for c, ms in enumerate(members):
        for u in ms:
            label_of[u] = c

    # 6. intra-cluster graphs (odd-sum fix + ESMC in ignore mode)
    edges: set[tuple[int, int]] = set()
    for c, ms in enumerate(members):
        local = sorted(ms)
        intra = [min(internal[u], len(local) - 1) for u in local]
        fstream = _Md5Stream(seed, f"fix{c}")
        guard = 0
        while sum(intra) % 2 != 0 and guard < 4 * len(local):
            guard += 1
            i = fstream.index(len(local))
            if fstream.u() >= 0.5:
                if intra[i] < len(local) - 1 and intra[i] < degrees[local[i]]:
                    intra[i] += 1
                    internal[local[i]] += 1
            else:
                if intra[i] > 1:
                    intra[i] -= 1
                    internal[local[i]] -= 1
        adj = _esmc_adjacency(
            intra, seed, tag=f"intra{c}:", ignore_if_unrealizable=True
        )
        for a in adj:
            for b in adj[a]:
                if a < b:
                    edges.add((local[a], local[b]))

    # 7. inter-cluster graph on external degrees, intra collisions
    # rewired then dropped
    external = [max(0, degrees[u] - internal[u]) for u in range(n)]
    iadj = _esmc_adjacency(
        external, seed, tag="inter:", ignore_if_unrealizable=True
    )
    rstream = _Md5Stream(seed, "rewire")
    to_remove = [
        (a, b)
        for a in iadj
        for b in iadj[a]
        if a < b and label_of[a] == label_of[b]
    ]
    node_selection = []
    for u, d in enumerate(external):
        node_selection.extend([u] * d)
    m_inter = sum(len(s) for s in iadj.values()) // 2
    max_attempts = m_inter * 10
    tries = 0
    while to_remove and tries <= max_attempts:
        tries += 1
        i = rstream.index(len(to_remove))
        s1, t1 = to_remove[i]
        if t1 not in iadj[s1]:
            to_remove[i] = to_remove[-1]
            to_remove.pop()
            continue
        if not node_selection:
            break
        s2 = node_selection[rstream.index(len(node_selection))]
        if s2 == s1 or s2 == t1 or not iadj[s2]:
            continue
        n2 = sorted(iadj[s2])
        t2 = n2[rstream.index(len(n2))]
        if t1 == t2 or s1 == t2:
            continue
        if t2 in iadj[s1] or t1 in iadj[s2]:
            continue
        iadj[s1].discard(t1), iadj[t1].discard(s1)
        iadj[s2].discard(t2), iadj[t2].discard(s2)
        iadj[s1].add(t2), iadj[t2].add(s1)
        iadj[s2].add(t1), iadj[t1].add(s2)
        to_remove[i] = to_remove[-1]
        to_remove.pop()
        if label_of[s1] == label_of[t2]:
            to_remove.append((min(s1, t2), max(s1, t2)))
        if label_of[s2] == label_of[t1]:
            to_remove.append((min(s2, t1), max(s2, t1)))
    for a, b in to_remove:  # unswappable leftovers are dropped
        iadj[a].discard(b), iadj[b].discard(a)
    for a in iadj:
        for b in iadj[a]:
            if a < b:
                edges.add((a, b))

    verts = spark.range(n).select(F.col("id").cast("long"))
    edf = spark.createDataFrame(
        [(a, b, 1.0) for a, b in sorted(edges)] or [],
        "src long, dst long, weight double",
    )
    truth = spark.createDataFrame(
        [(u, label_of[u]) for u in range(n)], "id long, label long"
    )
    return Graph(edf, directed=False, vertices=verts), truth
