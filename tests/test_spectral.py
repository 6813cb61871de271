"""Spectral family vs numpy goldens: the distributed block subspace
iteration against dense ``numpy.linalg.eigh``, and the
SpectralPartitioner / SpectralColoring recursions against literal numpy
ports of the reference control flow (``partitioning.py:56-218``,
``coloring.py:6-90``). Weighted-path fixtures keep the spectrum simple
(Jacobi matrices have distinct eigenvalues), so eigenvectors are unique
up to sign and the ports are exact."""

import math

import numpy as np
import pytest

from networkit_spark import Graph
from networkit_spark.operators.spectral import (
    SpectralColoring,
    SpectralPartitioner,
    adjacency_eigenvectors,
    laplacian_eigenvectors,
)

# weighted path on 9 nodes — distinct positive weights
P9 = [(i, i + 1, 1.0 + 0.1 * i) for i in range(8)]
N9 = 9


def _dense(edges, n):
    A = np.zeros((n, n))
    for u, v, w in edges:
        A[u, v] = A[v, u] = w
    L = np.diag(A.sum(axis=1)) - A
    return A, L


def _collect_vecs(state, k, n):
    out = np.zeros((k, n))
    for r in state.collect():
        out[r["vec"], r["id"]] = r["val"]
    return out


@pytest.fixture(scope="module")
def g9(spark):
    return Graph.from_edge_list(spark, P9, weighted=True, num_nodes=N9)


def test_laplacian_eigenpairs_match_numpy(g9):
    evals, state = laplacian_eigenvectors(g9, cutoff=2, tol=1e-10, max_iters=600)
    A, L = _dense(P9, N9)
    ref = np.linalg.eigh(L)[0][:3]
    assert evals[0] == pytest.approx(0.0, abs=1e-6)
    assert evals == pytest.approx(list(ref), abs=1e-4)
    vecs = _collect_vecs(state, 3, N9)
    ref_vecs = np.linalg.eigh(L)[1]
    for j in range(3):
        # direction match up to sign
        assert abs(float(vecs[j] @ ref_vecs[:, j])) == pytest.approx(1.0, abs=1e-3)


def test_adjacency_eigenpairs_match_numpy(g9):
    evals, state = adjacency_eigenvectors(g9, cutoff=1, tol=1e-10, max_iters=600)
    A, _ = _dense(P9, N9)
    w, v = np.linalg.eigh(A)
    assert evals == pytest.approx([float(w[-1]), float(w[-2])], abs=1e-4)
    vecs = _collect_vecs(state, 2, N9)
    assert abs(float(vecs[0] @ v[:, -1])) == pytest.approx(1.0, abs=1e-3)
    assert abs(float(vecs[1] @ v[:, -2])) == pytest.approx(1.0, abs=1e-3)


# ------------------------- numpy port of the reference SpectralPartitioner
class _NumpyPartitioner:
    def __init__(self, edges, n, count, balanced=True):
        self.n, self.count, self.balanced = n, count, balanced
        _, L = _dense(edges, n)
        w, v = np.linalg.eigh(L)
        self.eig = [v[:, i] for i in range(len(w))]

    def _quantiles(self, eigv, vertices, count=1):
        values = sorted(eigv[i] for i in vertices)
        return [
            values[math.floor(len(values) * i / (count + 1))]
            for i in range(1, count + 1)
        ]

    def _trisect(self, partition=None, iteration=1):
        vertices = (
            list(range(self.n)) if partition is None else self.partitions[partition]
        )
        eigv = self.eig[iteration]
        q = self._quantiles(eigv, vertices, count=2)
        pa, pb, pc = self.nxt, self.nxt + 1, self.nxt + 2
        self.nxt += 3
        self.partitions[pa] = [v for v in vertices if eigv[v] < q[0]]
        self.partitions[pb] = [
            v for v in vertices if q[0] <= eigv[v] < q[1]
        ]
        self.partitions[pc] = [v for v in vertices if eigv[v] >= q[1]]
        if partition is not None:
            del self.partitions[partition]

    def _bisect(self, count, partition=None, iteration=1):
        if count == 1:
            return
        if count == 3:
            self._trisect(partition=partition)
            return
        vertices = (
            list(range(self.n)) if partition is None else self.partitions[partition]
        )
        eigv = self.eig[iteration]
        if self.balanced:
            split = self._quantiles(eigv, vertices)[0]
        else:
            split = float(np.mean([eigv[v] for v in vertices]))
        pa, pb = self.nxt, self.nxt + 1
        self.nxt += 2
        self.partitions[pa] = [v for v in vertices if eigv[v] < split]
        self.partitions[pb] = [v for v in vertices if eigv[v] >= split]
        if partition is not None:
            del self.partitions[partition]
        if count > 2:
            if count % 2 == 0:
                self._bisect(count // 2, pa, iteration + 1)
                self._bisect(count // 2, pb, iteration + 1)
            else:
                nxt = (count - 1) // 2
                if nxt > 2:
                    self._bisect(nxt, pa, iteration + 1)
                    self._bisect(nxt + 1, pb, iteration + 1)
                else:
                    self._bisect(nxt, pa, iteration + 1)
                    self._trisect(pb, iteration + 1)

    def run(self):
        self.nxt = 0
        self.partitions = {}
        self._bisect(self.count)
        return {frozenset(v) for v in self.partitions.values() if v}


def _spark_partition_sets(labels):
    out = {}
    for r in labels.collect():
        out.setdefault(r["label"], set()).add(r["id"])
    return {frozenset(v) for v in out.values() if v}


@pytest.mark.parametrize("count,balanced", [(2, True), (3, True), (4, True), (2, False)])
def test_spectral_partitioner_matches_numpy_port(spark, g9, count, balanced):
    import itertools

    # eigenvectors are sign-ambiguous, independently per vector — the
    # golden is the SET of partitions the reference port produces over
    # all sign patterns of the (≤3) eigenvectors it consults
    depth = math.ceil(math.log(count, 2)) + 1
    goldens = set()
    for signs in itertools.product([1.0, -1.0], repeat=depth):
        p = _NumpyPartitioner(P9, N9, count, balanced)
        for i, s in enumerate(signs):
            p.eig[1 + i] = s * p.eig[1 + i]
        goldens.add(frozenset(p.run()))
    sp = SpectralPartitioner(g9, count, balanced=balanced).run()
    got = frozenset(_spark_partition_sets(sp.get_partition()))
    assert got in goldens
    assert len(got) == count


def test_spectral_partitioner_bisects_two_cliques(spark):
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, num_nodes=6)
    sp = SpectralPartitioner(g, 2).run()
    got = _spark_partition_sets(sp.get_partition())
    assert got == {frozenset({0, 1, 2}), frozenset({3, 4, 5})}


# ---------------------------- numpy port of the reference SpectralColoring
def _numpy_coloring(edges, n, max_depth):
    A, _ = _dense(edges, n)
    w, v = np.linalg.eigh(A)
    order = np.argsort(-w)
    eig = [v[:, i] for i in order]
    adj = {i: set() for i in range(n)}
    for u, vv, _w in edges:
        adj[u].add(vv)
        adj[vv].add(u)
    colors = {0: set(range(n))}
    nxt = [1]

    def valid(c):
        for x in colors[c]:
            if adj[x] & colors[c]:
                return False
        return True

    def split(color, depth=0):
        if depth >= max_depth:
            raise RuntimeError("depth")
        other = nxt[0]
        nxt[0] += 1
        vs = colors[color]
        colors[color] = {x for x in vs if eig[depth][x] >= 0}
        colors[other] = {x for x in vs if eig[depth][x] < 0}
        if not valid(color):
            split(color, depth + 1)
        if not valid(other):
            split(other, depth + 1)

    split(0)
    return {frozenset(s) for s in colors.values() if s}


def test_spectral_coloring_proper(spark, g9):
    # prove termination on the numpy port first, then require the Spark
    # twin to produce a PROPER coloring (degenerate-free spectrum makes
    # the class sets match the port up to global sign; properness is the
    # contract either way)
    _numpy_coloring(P9, N9, max_depth=7)  # must not raise
    sc = SpectralColoring(Graph.from_edge_list(spark, P9, weighted=True,
                                               num_nodes=N9), max_depth=7).run()
    rows = sc.get_coloring().collect()
    color = {r["id"]: r["color"] for r in rows}
    assert len(color) == N9  # every node exactly once
    for u, v, _w in P9:
        assert color[u] != color[v]
