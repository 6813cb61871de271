"""Dynamic graph sources — the reference's ``Dynamic*Generator`` family,
producing ordered ``GraphEvent`` frames instead of callback streams.

Reference surface:

- ``cpp/generators/DynamicPathGenerator.cpp:12-29`` — one new node +
  one edge to the previous node per step.
- ``cpp/generators/DynamicDorogovtsevMendesGenerator.cpp:14-54`` —
  initial triangle, then per step a new node wired to BOTH endpoints of
  a uniformly drawn existing edge.
- ``cpp/generators/DynamicForestFireGenerator.cpp:24-139`` — per step a
  new node burns through the graph BFS-style from a random ambassador
  (geometric out-burn with probability ``p``; in directed mode an
  additional backward burn with probability ``p·r``) and connects to
  every burned node.
- ``cpp/generators/DynamicBarabasiAlbertGenerator.cpp:14-80`` —
  ``initializeGraph`` lays a k-node path, then per step one new node
  draws ``k`` DISTINCT targets preferentially by degree (uniform draw
  over the degree sum, ascending-id scan, retry on duplicates).

These growth processes are single-token sequential Markov chains over
shared state (each step's distribution depends on every prior step), so
— like the exact-LFR pipeline and ``HavelHakimi`` — they run
DRIVER-SIDE at fixture scale. Their OUTPUT is the Spark-native event
frame ``(seq, etype, u, v, w)`` (the same shape ``read_dgs`` yields),
replayable by :func:`networkit_spark.streaming.events.apply_events`, a
:class:`~networkit_spark.streaming.events.GraphUpdater`, or
:func:`~networkit_spark.streaming.events.graph_from_stream`; at engine
scale the distributed static generators (``generators.py``) plus the
streaming sources are the path. All draws are seeded (the reference
pulls from its global URNG — stream-incompatible by construction).

Each generator is STATEFUL like the reference: a second ``generate``
call continues the same process (node ids and the event ``seq`` keep
counting).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from networkit_spark.streaming.events import (
    EDGE_ADDITION,
    NODE_ADDITION,
    TIME_STEP,
)

_EVENT_SCHEMA = "seq long, etype string, u long, v long, w double"


class _DynamicSource:
    """Shared event-buffer plumbing: subclasses append event tuples via
    ``_node/_edge/_time_step`` and return one ordered frame per
    ``generate`` call."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._seq = 0

    def _start(self) -> list:
        self._events: list[tuple] = []
        return self._events

    def _emit(self, etype: str, u=None, v=None, w=None) -> None:
        self._events.append((self._seq, etype, u, v, w))
        self._seq += 1

    def _node(self, u: int) -> None:
        self._emit(NODE_ADDITION, int(u))

    def _edge(self, u: int, v: int, w: float = 1.0) -> None:
        self._emit(EDGE_ADDITION, int(u), int(v), float(w))

    def _time_step(self) -> None:
        self._emit(TIME_STEP)

    def _frame(self) -> DataFrame:
        return self.spark.createDataFrame(self._events, _EVENT_SCHEMA)


class DynamicPathGenerator(_DynamicSource):
    """``DynamicPathGenerator.cpp:12-29`` — path growth: the first call
    adds the root, then every step appends one node and the edge to its
    predecessor followed by a TIME_STEP."""

    def __init__(self, spark: SparkSession) -> None:
        super().__init__(spark)
        self._u: int | None = None
        self._next = 0

    def generate(self, n_steps: int) -> DataFrame:
        self._start()
        if self._u is None:
            self._u = self._next
            self._next += 1
            self._node(self._u)
        for _ in range(n_steps):
            v = self._next
            self._next += 1
            self._node(v)
            self._edge(self._u, v, 1.0)
            self._u = v
            self._time_step()
        return self._frame()


class DynamicDorogovtsevMendesGenerator(_DynamicSource):
    """``DynamicDorogovtsevMendesGenerator.cpp:14-54`` — the first call
    emits the seed triangle (nodes 0,1,2 and its three edges, one
    TIME_STEP); every step adds a node connected to both endpoints of a
    uniformly drawn EXISTING edge (including edges added in earlier
    steps), then a TIME_STEP."""

    def __init__(self, spark: SparkSession, seed: int = 42) -> None:
        super().__init__(spark)
        self.rng = random.Random(seed)
        self._edges: list[tuple[int, int]] = []
        self._u = 0
        self._initial = True

    def generate(self, n_steps: int) -> DataFrame:
        self._start()
        if self._initial:
            s1, s2, s3 = 0, 1, 2
            self._u = 2
            for s in (s1, s2, s3):
                self._node(s)
            for a, b in ((s1, s2), (s2, s3), (s3, s1)):
                self._edges.append((a, b))
                self._edge(a, b)
            self._time_step()
            self._initial = False
        for _ in range(n_steps):
            self._u += 1
            u = self._u
            self._node(u)
            s, t = self._edges[self.rng.randrange(len(self._edges))]
            self._edges.append((s, u))
            self._edges.append((t, u))
            self._edge(u, s)
            self._edge(u, t)
            self._time_step()
        return self._frame()


class DynamicForestFireGenerator(_DynamicSource):
    """``DynamicForestFireGenerator.cpp:24-139`` — forest-fire growth
    (Leskovec et al.): per step a new node picks a uniform ambassador,
    burns BFS-style (per visited node, repeatedly draw a uniform
    unvisited neighbor while a coin with success probability ``p``
    keeps landing — a geometric burn count; directed mode adds a
    backward burn at ``p·r``), and connects to EVERY burned node. The
    first step of the first call only seeds node 0."""

    def __init__(self, spark: SparkSession, p: float, directed: bool = False,
                 r: float = 1.0, seed: int = 42) -> None:
        super().__init__(spark)
        self.p = float(p)
        self.directed = bool(directed)
        self.r = float(r)
        self.rng = random.Random(seed)
        self._out: dict[int, list[int]] = {}
        self._in: dict[int, list[int]] = {}
        self._first = True

    def _select_edges(self, u: int, prob: float, visited: set[int],
                      backward: bool) -> set[int]:
        pool = [x for x in (self._in if backward else self._out)[u]
                if x not in visited]
        chosen: set[int] = set()
        while True:
            q = self.rng.random()
            if q > prob or not pool:
                break
            i = self.rng.randrange(len(pool))
            chosen.add(pool[i])
            pool[i] = pool[-1]
            pool.pop()
        return chosen

    def generate(self, n_steps: int) -> DataFrame:
        self._start()
        steps = n_steps
        if self._first and steps > 0:
            self._out[0] = []
            self._in[0] = []
            self._node(0)
            self._time_step()
            self._first = False
            steps -= 1
        for _ in range(steps):
            a = self.rng.randrange(len(self._out))  # ids are dense
            v = len(self._out)
            self._out[v] = []
            self._in[v] = []
            self._node(v)
            visited = {a}
            queue = [a]
            burned = [a]
            while queue:
                w = queue.pop(0)
                edges = self._select_edges(w, self.p, visited, False)
                if self.directed:
                    edges |= self._select_edges(w, self.p * self.r,
                                                visited, True)
                for x in sorted(edges):
                    queue.append(x)
                    burned.append(x)
                    visited.add(x)
            for w in burned:
                self._out[v].append(w)
                self._in[w].append(v)
                if not self.directed:
                    self._out[w].append(v)
                    self._in[v].append(w)
                self._edge(v, w)
            self._time_step()
        return self._frame()


class DynamicBarabasiAlbertGenerator(_DynamicSource):
    """``DynamicBarabasiAlbertGenerator.cpp:14-80`` — preferential
    attachment: ``initialize_graph`` lays a ``k``-node path; each
    ``generate`` step adds one node and draws ``k`` DISTINCT targets by
    the reference's scheme (uniform integer in ``[0, degSum]``,
    ascending-id scan subtracting degrees, accept at ``rand ≤ deg(v)``,
    retry whole draws until k distinct targets accumulate), then bumps
    the degree sum by 2 per edge. ``generate`` raises before
    ``initialize_graph`` exactly like the reference."""

    def __init__(self, spark: SparkSession, k: int, seed: int = 42) -> None:
        if not k:
            raise ValueError("k must be at least 1")
        super().__init__(spark)
        self.k = int(k)
        self.rng = random.Random(seed)
        self._deg: dict[int, int] = {}
        self._deg_sum = 0
        self._initialized = False

    def initialize_graph(self) -> DataFrame:
        self._start()
        self._node(0)
        self._deg[0] = 0
        for i in range(1, self.k):
            self._node(i)
            self._edge(i, i - 1)
            self._deg[i] = self._deg.get(i, 0) + 1
            self._deg[i - 1] += 1
        self._deg_sum = sum(self._deg.values())
        self._initialized = True
        self._time_step()
        return self._frame()

    def generate(self, n_steps: int = 1) -> DataFrame:
        if not self._initialized:
            raise RuntimeError(
                "Graph instance has not been initialized - call "
                "initializeGraph first"
            )
        self._start()
        for _ in range(n_steps):
            u = len(self._deg)
            self._node(u)
            self._deg[u] = 0
            targets: set[int] = set()
            while len(targets) < self.k:
                rand = self.rng.randint(0, self._deg_sum)
                for v in range(u):
                    if rand <= self._deg[v]:
                        targets.add(v)
                        break
                    rand -= self._deg[v]
            for v in sorted(targets):
                self._edge(u, v)
                self._deg[u] += 1
                self._deg[v] += 1
                self._deg_sum += 2
            self._time_step()
        return self._frame()


class DynamicPubWebGenerator(_DynamicSource):
    """Dynamic PubWeb: 5% node churn per step over the torus
    mutual-kNN-in-radius structure.

    Reference: ``DynamicPubWebGenerator``
    (``cpp/generators/DynamicPubWebGenerator.cpp:14-183``): per step,
    delete ``⌊0.05·n⌋`` random nodes (incident EDGE_REMOVALs then
    NODE_REMOVAL), insert as many new ones (NODE_ADDITION; coordinates
    drawn from a uniformly chosen dense area — or background noise with
    probability 1/(areas+1)), recompute the mutual-kNN-within-radius
    edge structure and emit the diff: surviving edges get
    EDGE_WEIGHT_UPDATE (w = 0.01/sqdist, ``BASE_WEIGHT``), vanished
    edges EDGE_REMOVAL, new ones EDGE_ADDITION; TIME_STEP per step.

    The initial points/areas are exactly the static recipe
    (:func:`generators.pub_web_points` / :func:`generators.
    pub_web_areas`, same seed), so the initial dump replays to the
    static :func:`generators.pub_web` graph — cross-validated in
    pytest. Like the rest of this module the churn process is a
    sequential Markov chain, so it runs driver-side at fixture scale;
    the per-step structure recompute is the same mutual-kNN rule the
    distributed static generator evaluates with a grid join
    (``generators._torus_grid_pairs``). Seeded divergence (documented,
    like every generator here): node deletions draw from the alive-id
    list via a seeded Mersenne stream, not the reference's global URNG
    rejection loop — same distribution.
    """

    BASE_WEIGHT = 0.01  # PubWebGenerator.cpp BASE_WEIGHT

    def __init__(
        self,
        spark: SparkSession,
        n: int,
        num_dense_areas: int = 12,
        neighborhood_radius: float = 0.125,
        max_neighbors: int = 16,
        seed: int = 42,
        write_initial_graph_to_stream: bool = True,
    ) -> None:
        from networkit_spark.generators import pub_web_areas, pub_web_points

        super().__init__(spark)
        self.rad = float(neighborhood_radius)
        self.maxn = int(max_neighbors)
        self.rng = random.Random(seed ^ 0x9E3779B9)
        self.areas, _ = pub_web_areas(n, num_dense_areas, seed)
        self.num_dense_areas = num_dense_areas
        pts = pub_web_points(self.spark, n, num_dense_areas, seed).collect()
        self.coords: dict[int, tuple[float, float]] = {
            int(r["id"]): (float(r["x"]), float(r["y"])) for r in pts
        }
        self._next_id = max(self.coords) + 1
        self._edges = self._structure()
        self._write_initial = write_initial_graph_to_stream
        self._new_coords: list[tuple[int, float, float]] = []

    # ------------------------------------------------------ geometry
    @staticmethod
    def _sqdist(a: tuple[float, float], b: tuple[float, float]) -> float:
        dx = abs(a[0] - b[0])
        dy = abs(a[1] - b[1])
        dx = min(dx, 1.0 - dx)
        dy = min(dy, 1.0 - dy)
        return dx * dx + dy * dy

    def _structure(self) -> dict[tuple[int, int], float]:
        """Mutual-kNN-within-radius edges over the current coordinate
        set — the driver twin of the static generator's grid join +
        count-2 rule (``generators.pub_web``), grid-bucketed so each
        step is O(n·k), not n²."""
        nc = max(1, int(1.0 / self.rad))
        cells: dict[tuple[int, int], list[int]] = {}
        for i, (x, y) in self.coords.items():
            cells.setdefault(
                (min(nc - 1, int(x * nc)), min(nc - 1, int(y * nc))), []
            ).append(i)
        rad2 = self.rad * self.rad
        counts: dict[tuple[int, int], int] = {}
        sqd: dict[tuple[int, int], float] = {}
        for i, p in self.coords.items():
            cx = min(nc - 1, int(p[0] * nc))
            cy = min(nc - 1, int(p[1] * nc))
            cand = []
            seen_cells = set()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    cc = ((cx + dx) % nc, (cy + dy) % nc)
                    if cc in seen_cells:
                        continue
                    seen_cells.add(cc)
                    for j in cells.get(cc, ()):  # includes i itself
                        d2 = self._sqdist(p, self.coords[j])
                        if d2 <= rad2:
                            lo, hi = min(i, j), max(i, j)
                            cand.append((d2, lo, hi, j))
            cand.sort()
            for d2, lo, hi, j in cand[: self.maxn]:
                if i == j:
                    continue
                counts[(lo, hi)] = counts.get((lo, hi), 0) + 1
                sqd[(lo, hi)] = d2
        return {
            e: self.BASE_WEIGHT / sqd[e]
            for e, c in counts.items()
            if c == 2 and sqd[e] > 0.0
        }

    def _draw_coordinate(self) -> tuple[float, float]:
        import math

        pick = self.rng.randint(0, self.num_dense_areas)  # inclusive: +1 noise slot
        if pick < self.num_dense_areas:
            c = self.areas[pick]
            ang = self.rng.random() * 2.0 * math.pi
            dist = self.rng.random() * c["rad"]
            x = c["x"] + math.cos(ang) * dist
            y = c["y"] + math.sin(ang) * dist
            # intoUnitSquare single ±1 wrap
            x = x - 1.0 if x > 1.0 else (x + 1.0 if x < 0.0 else x)
            y = y - 1.0 if y > 1.0 else (y + 1.0 if y < 0.0 else y)
            return (x, y)
        return (self.rng.random(), self.rng.random())

    # ------------------------------------------------------- process
    def generate(self, n_steps: int) -> DataFrame:
        from networkit_spark.streaming.events import (
            EDGE_REMOVAL,
            EDGE_WEIGHT_UPDATE,
            NODE_REMOVAL,
        )

        self._start()
        self._new_coords = []
        if self._write_initial:
            for v in sorted(self.coords):
                self._node(v)
            for (u, v), w in sorted(self._edges.items()):
                self._edge(u, v, w)
            self._time_step()
            self._write_initial = False
        n_churn = int(len(self.coords) * 0.05)
        for _ in range(n_steps):
            for _ in range(n_churn):  # deletions
                victim = self.rng.choice(sorted(self.coords))
                for (a, b) in sorted(self._edges):
                    if a == victim or b == victim:
                        self._emit(EDGE_REMOVAL, a, b)
                        del self._edges[(a, b)]
                del self.coords[victim]
                self._emit(NODE_REMOVAL, victim)
            for _ in range(n_churn):  # insertions
                nid = self._next_id
                self._next_id += 1
                xy = self._draw_coordinate()
                self.coords[nid] = xy
                self._new_coords.append((nid, xy[0], xy[1]))
                self._node(nid)
            new_edges = self._structure()
            for e in sorted(self._edges):
                if e in new_edges:
                    self._emit(EDGE_WEIGHT_UPDATE, e[0], e[1], new_edges[e])
                else:
                    self._emit(EDGE_REMOVAL, e[0], e[1])
            for e in sorted(new_edges):
                if e not in self._edges:
                    self._emit(EDGE_ADDITION, e[0], e[1], new_edges[e])
            self._edges = new_edges
            self._time_step()
        return self._frame()

    # ----------------------------------------------------- accessors
    def get_coordinates(self) -> DataFrame:
        """``getCoordinates`` — current ``(id, x, y)``."""
        return self.spark.createDataFrame(
            [(i, x, y) for i, (x, y) in sorted(self.coords.items())],
            "id long, x double, y double",
        )

    def get_new_coordinates(self) -> DataFrame:
        """``getNewCoordinates`` — nodes added by the last
        ``generate`` call."""
        return self.spark.createDataFrame(
            self._new_coords, "id long, x double, y double"
        )

    def get_graph(self) -> "Graph":
        """``getGraph`` — current weighted snapshot."""
        from networkit_spark.graph import Graph

        edges = self.spark.createDataFrame(
            [(u, v, w) for (u, v), w in sorted(self._edges.items())],
            "src long, dst long, weight double",
        )
        vertices = self.spark.createDataFrame(
            [(i,) for i in sorted(self.coords)], "id long"
        )
        return Graph(edges, directed=False, weighted=True, vertices=vertices)


class DynamicHyperbolicGenerator(_DynamicSource):
    """Dynamic random hyperbolic graph — nodes drift in the hyperbolic
    disk, edges are the distance-≤R threshold structure.

    Reference: ``DynamicHyperbolicGenerator``
    (``cpp/generators/DynamicHyperbolicGenerator.cpp:20-330``): each
    node carries a persistent (angular, radial) movement vector drawn
    once (``initializeMovement``, radial scaled ×10); per step each
    node moves with probability ``move_each_step`` — radial movement in
    cosh-cdf space with boundary bounce and center crossing
    (``moveNode``, lines 168-211), angular movement ∝ 1/r — and the
    edge diff of moved nodes is emitted (EDGE_REMOVAL / EDGE_ADDITION)
    followed by TIME_STEP. Threshold model only (T = 0): the
    reference's T > 0 path samples probabilistic edges through its
    quadtree URNG stream, which has no distribution-faithful seeded
    twin; T = 0 edges are a deterministic function of positions.

    Initial positions are EXACTLY the static recipe
    (:func:`generators.hyperbolic`, same seed) — pytest cross-validates
    the initial snapshot against the static generator — and every
    subsequent edge set equals the brute-force threshold structure of
    the current positions (the distributed twin of the per-step
    recompute IS the static generator's band join). Movement
    bookkeeping is a sequential Markov chain → driver-side at fixture
    scale like the rest of this module.
    """

    def __init__(
        self,
        spark: SparkSession,
        n: int,
        avg_degree: float = 6.0,
        exponent: float = 3.0,
        move_each_step: float = 1.0,
        move_distance: float = 0.1,
        seed: int = 42,
    ) -> None:
        import math

        super().__init__(spark)
        if n < 2:
            raise ValueError("n must be >= 2")
        if not 0.0 <= move_each_step <= 1.0:
            raise ValueError("move_each_step must be a probability")
        self.alpha = (exponent - 1.0) / 2.0
        self.R = 2.0 * math.log(8.0 * n / (math.pi * avg_degree))
        self.move_each_step = float(move_each_step)
        self.rng = random.Random(seed ^ 0x51ED270)
        # initial points: the static generator's exact seeded recipe
        from pyspark.sql import functions as F
        from networkit_spark.generators import _unit_hash

        ids = spark.range(n).select(F.col("id").cast("long"))
        theta = _unit_hash(F.col("id"), F.lit(seed)) * (2.0 * math.pi)
        u = _unit_hash(F.col("id"), F.lit(seed + 1))
        r = F.acosh(u * (math.cosh(self.alpha * self.R) - 1.0) + 1.0) / self.alpha
        rows = ids.select("id", theta.alias("th"), r.alias("r")).collect()
        self.angles = {int(x["id"]): float(x["th"]) for x in rows}
        self.radii = {int(x["id"]): float(x["r"]) for x in rows}
        # persistent movement vectors (initializeMovement, scale=10)
        scale = 10.0
        self.ang_mov = {
            i: self.rng.uniform(-move_distance, move_distance) for i in self.angles
        }
        self.rad_mov = {
            i: self.rng.uniform(-scale * move_distance, scale * move_distance)
            for i in self.angles
        }
        self._edges = self._structure()

    # ------------------------------------------------------ geometry
    def _hyp_dist_le_R(self, i: int, j: int) -> bool:
        import math

        dth = abs(self.angles[i] - self.angles[j])
        dth = min(dth, 2.0 * math.pi - dth)
        coshd = math.cosh(self.radii[i]) * math.cosh(self.radii[j]) - math.sinh(
            self.radii[i]
        ) * math.sinh(self.radii[j]) * math.cos(dth)
        return coshd <= math.cosh(self.R) + 1e-12

    def _structure(self) -> set:
        nodes = sorted(self.angles)
        return {
            (u, v)
            for ix, u in enumerate(nodes)
            for v in nodes[ix + 1 :]
            if self._hyp_dist_le_R(u, v)
        }

    def _move_node(self, i: int) -> None:
        import math

        maxcdf = math.cosh(self.alpha * self.R)
        newcosh = math.cosh(self.alpha * self.radii[i]) + self.alpha * self.rad_mov[i]
        newphi = self.angles[i]
        if newcosh > maxcdf:
            newcosh -= 2.0 * (newcosh - maxcdf)
            self.rad_mov[i] *= -1.0
        if newcosh < 1.0:
            newcosh += 2.0 * (1.0 - newcosh)
            self.rad_mov[i] *= -1.0
            newphi += -math.pi if newphi > math.pi else math.pi
        newradius = math.acosh(newcosh) / self.alpha
        if newradius >= self.R:
            newradius = math.nextafter(self.R, -math.inf)
        newphi += self.ang_mov[i] / newradius
        newphi %= 2.0 * math.pi
        self.angles[i] = newphi
        self.radii[i] = newradius

    # ------------------------------------------------------- process
    def generate(self, n_steps: int) -> DataFrame:
        from networkit_spark.streaming.events import EDGE_REMOVAL

        self._start()
        for _ in range(n_steps):
            moved = [
                i for i in sorted(self.angles)
                if self.rng.random() < self.move_each_step
            ]
            for i in moved:
                self._move_node(i)
            if moved:
                new_edges = self._structure()
                for (u, v) in sorted(self._edges - new_edges):
                    self._emit(EDGE_REMOVAL, u, v)
                for (u, v) in sorted(new_edges - self._edges):
                    self._edge(u, v)
                self._edges = new_edges
            self._time_step()
        return self._frame()

    # ----------------------------------------------------- accessors
    def get_graph(self) -> "Graph":
        """``getGraph`` — threshold graph of the current positions."""
        from networkit_spark.graph import Graph
        from pyspark.sql import functions as F  # noqa: F401

        edges = self.spark.createDataFrame(
            [(u, v, 1.0) for (u, v) in sorted(self._edges)],
            "src long, dst long, weight double",
        )
        vertices = self.spark.createDataFrame(
            [(i,) for i in sorted(self.angles)], "id long"
        )
        return Graph(edges, directed=False, weighted=False, vertices=vertices)

    def get_coordinates(self) -> DataFrame:
        """``getCoordinates`` twin — polar ``(id, angle, radius)``."""
        return self.spark.createDataFrame(
            [
                (i, self.angles[i], self.radii[i])
                for i in sorted(self.angles)
            ],
            "id long, angle double, radius double",
        )
