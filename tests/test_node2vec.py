"""Node2Vec — biased-walk validity, seeded determinism, feature shape.

Mirrors the reference test intent (FiniteEmbeddingTest.cpp: features
exist for every node and are finite) plus the walk-semantics contracts
from BiasedRandomWalk.cpp that ARE deterministic under our seeded
sampler.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark import Graph, Node2Vec


def _graph(spark, rows, directed=False):
    return Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        directed=directed,
        weighted=True,
    )


@pytest.fixture(scope="module")
def karate_ish(spark):
    # two triangles bridged by a path — enough structure for the
    # p/q biases to matter
    edges = [
        (0, 1), (1, 2), (0, 2),
        (2, 3), (3, 4),
        (4, 5), (5, 6), (4, 6),
    ]
    return _graph(spark, [(a, b, 1.0) for a, b in edges])


def test_walks_are_paths_in_the_graph(spark, karate_ish):
    n2v = Node2Vec(
        karate_ish, walk_length=5, walks_per_node=2, dim=4, window=2, seed=3
    ).run()
    w = n2v.walks()
    a = w.select("walk_id", F.col("pos").alias("p"), F.col("node").alias("u"))
    b = w.select(
        "walk_id", (F.col("pos") - 1).alias("p"), F.col("node").alias("v")
    )
    steps = a.join(b, ["walk_id", "p"]).select("u", "v")
    sym = karate_ish.symmetrized().select(
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.lit(True).alias("ok"),
    )
    bad = steps.join(sym, ["u", "v"], "left").where(F.col("ok").isNull())
    assert bad.count() == 0
    # pos 0 is the start node encoded in the walk id
    starts = w.where(F.col("pos") == 0)
    assert (
        starts.where(F.col("node") != (F.col("walk_id") / 2).cast("long"))
        .count()
        == 0
    )


def test_seeded_determinism(spark, karate_ish):
    def run(seed):
        n2v = Node2Vec(
            karate_ish, walk_length=4, walks_per_node=2, dim=4,
            window=2, seed=seed,
        ).run()
        walks = sorted(
            (r["walk_id"], r["pos"], r["node"])
            for r in n2v.walks().collect()
        )
        feats = {
            r["id"]: tuple(round(x, 9) for x in r["feature"])
            for r in n2v.get_features().collect()
        }
        return walks, feats

    w1, f1 = run(11)
    w2, f2 = run(11)
    w3, _ = run(12)
    assert w1 == w2
    assert f1 == f2
    assert w1 != w3  # different seed must change at least one step


def test_pq_bias_forces_drift(spark):
    # path 0-1-2: from 0 the first hop is 1; with p huge (return bias
    # ~0) the only other candidate wins every time: pos 2 must be 2
    g = _graph(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    n2v = Node2Vec(
        g, p=1e12, q=1.0, walk_length=3, walks_per_node=4, dim=2,
        window=2, seed=5,
    ).run()
    w = n2v.walks()
    from_zero = w.where((F.col("walk_id") < 4) & (F.col("pos") == 2))
    rows = from_zero.collect()
    assert rows and all(r["node"] == 2 for r in rows)


def test_features_full_finite_normalized(spark, karate_ish):
    dim = 6
    n2v = Node2Vec(
        karate_ish, walk_length=5, walks_per_node=3, dim=dim,
        window=3, seed=9,
    ).run()
    rows = n2v.get_features().collect()
    assert len(rows) == 7  # one row per node
    for r in rows:
        assert len(r["feature"]) == dim
        assert all(math.isfinite(x) for x in r["feature"])
        norm = math.sqrt(sum(x * x for x in r["feature"]))
        assert norm == pytest.approx(1.0, abs=1e-9) or norm == 0.0


def test_validation(spark, karate_ish):
    with pytest.raises(ValueError):
        Node2Vec(karate_ish, p=0.0)
    with pytest.raises(ValueError):
        Node2Vec(karate_ish, walk_length=0)


# ---------------------------------------------------------------------
# Embedding-quality parity: PPMI + JL projection vs word2vec SGNS.
#
# The reference learns embeddings with SGNS over the walk corpus
# (cpp/embedding/LearnEmbedding.cpp, Node2Vec.cpp:36-62); this engine
# substitutes the exact shifted-PPMI factorization + seeded Rademacher
# projection (Levy & Goldberg 2014 prove SGNS implicitly factorizes
# shifted PPMI — public result, documented at node2vec.py module doc).
# The vectors differ feature-by-feature BY CONSTRUCTION; what must
# match is downstream quality. This test measures both embeddings on
# the same task — link prediction on held-out edges via cosine score —
# and requires both AUCs above a floor and within a band of each
# other, turning the documented substitution into a measured
# equivalence.
# ---------------------------------------------------------------------


def _two_community_edges():
    """Deterministic 2-community graph: dense intra, sparse inter."""
    edges = []
    for lo, hi in ((0, 15), (15, 30)):
        for a in range(lo, hi):
            for b in range(a + 1, hi):
                if (a * 31 + b * 17) % 5 < 2:  # ~40% intra density
                    edges.append((a, b))
    edges += [(3, 18), (7, 22), (11, 27)]  # bridges
    return edges


def _auc(scores_pos, scores_neg):
    """Rank-based AUC (Mann-Whitney)."""
    pairs = 0.0
    for p in scores_pos:
        for n in scores_neg:
            pairs += 1.0 if p > n else (0.5 if p == n else 0.0)
    return pairs / (len(scores_pos) * len(scores_neg))


def _cos(u, v):
    import numpy as np

    nu, nv = np.linalg.norm(u), np.linalg.norm(v)
    if nu == 0 or nv == 0:
        return 0.0
    return float(u @ v / (nu * nv))


def _sgns_train(walks_rows, n_nodes, dim, window, seed, epochs=5):
    """Minimal word2vec SGNS on the walk corpus — the reference's
    LearnEmbedding contract (skip-gram, negative sampling k=5,
    unigram^0.75 noise, lr decay), deterministic via a seeded RNG."""
    import numpy as np

    from collections import defaultdict

    walks = defaultdict(dict)
    for r in walks_rows:
        walks[r["walk_id"]][r["pos"]] = r["node"]
    corpus = [
        [w[p] for p in sorted(w)] for w in walks.values()
    ]
    rng = np.random.default_rng(seed)
    W = (rng.random((n_nodes, dim)) - 0.5) / dim
    C = np.zeros((n_nodes, dim))
    counts = np.zeros(n_nodes)
    for s in corpus:
        for t in s:
            counts[t] += 1
    noise = counts**0.75
    noise /= noise.sum()
    k = 5
    lr0 = 0.05
    steps = sum(len(s) for s in corpus) * epochs
    step = 0
    for _ in range(epochs):
        for s in corpus:
            for i, center in enumerate(s):
                lr = lr0 * max(1e-4, 1 - step / steps)
                step += 1
                for j in range(max(0, i - window), min(len(s), i + window + 1)):
                    if j == i:
                        continue
                    ctx = s[j]
                    negs = rng.choice(n_nodes, size=k, p=noise)
                    targets = [(ctx, 1.0)] + [(int(n), 0.0) for n in negs]
                    g_center = np.zeros(dim)
                    for t, label in targets:
                        z = 1.0 / (1.0 + np.exp(-W[center] @ C[t]))
                        g = (z - label) * lr
                        g_center += g * C[t]
                        C[t] -= g * W[center]
                    W[center] -= g_center
    return W


@pytest.mark.slow
def test_ppmi_jl_matches_sgns_link_prediction_quality(spark):
    import numpy as np

    edges = _two_community_edges()
    # deterministic ~15% holdout of intra-community edges, greedy with
    # a degree guard: never orphan a node (every endpoint keeps >= 2
    # train edges) and skip bridges so the train graph stays connected
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    held = []
    for a, b in edges:
        if abs(a - b) >= 15:
            continue  # bridge
        if (a * 13 + b * 7) % 7 == 0 and deg[a] > 2 and deg[b] > 2:
            held.append((a, b))
            deg[a] -= 1
            deg[b] -= 1
    train = [e for e in edges if e not in set(held)]
    g = _graph(spark, [(a, b, 1.0) for a, b in train])

    n2v = Node2Vec(
        g, p=1.0, q=1.0, walk_length=20, walks_per_node=8, dim=32,
        window=5, seed=7,
    ).run()
    feats = {
        r["id"]: np.array(r["feature"]) for r in n2v.get_features().collect()
    }
    walks_rows = n2v.walks().collect()
    sgns = _sgns_train(walks_rows, n_nodes=30, dim=32, window=5, seed=7)

    # negatives: deterministic non-edges, same count as positives
    edge_set = set(edges) | {(b, a) for a, b in edges}
    negs = []
    a, b = 0, 1
    for a in range(30):
        for b in range(a + 1, 30):
            if (a, b) not in edge_set and (a * 11 + b * 3) % 5 == 0:
                negs.append((a, b))
    negs = negs[: len(held)]
    assert len(held) >= 8 and len(negs) == len(held)

    auc_ppmi = _auc(
        [_cos(feats[a], feats[b]) for a, b in held],
        [_cos(feats[a], feats[b]) for a, b in negs],
    )
    auc_sgns = _auc(
        [_cos(sgns[a], sgns[b]) for a, b in held],
        [_cos(sgns[a], sgns[b]) for a, b in negs],
    )
    # both learners must beat the floor on the SAME corpus, and land
    # within a band of each other — the measured Levy-Goldberg
    # equivalence for this engine's substitution
    assert auc_ppmi >= 0.75, f"PPMI+JL AUC {auc_ppmi}"
    assert auc_sgns >= 0.75, f"SGNS AUC {auc_sgns}"
    assert abs(auc_ppmi - auc_sgns) <= 0.15, (auc_ppmi, auc_sgns)
