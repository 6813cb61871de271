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
