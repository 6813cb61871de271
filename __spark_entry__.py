"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship PageRank on a link graph derived from
sf0.001. ``queries()`` — one entry per implemented operator from
SURVEY.md §2, each taking (spark, sf_dir). ``oracle_sql()`` — matching
ANSI SQL for DuckDB over the same parquet views.

Graph derivation (deterministic, identical arithmetic in both engines):
the ``lineitem`` table is folded into a link graph with
``src = l_orderkey % V`` and ``dst = l_partkey % V``; multiplicity
becomes the edge weight. Parts are shared across many orders, so the
graph has realistic hub skew. ``V = 8192`` for the score kernels,
``V = 1024`` for the cubic-ish oracles (triangles, transitive closure).

Floating-point columns are rounded in BOTH engines (round 8 for
PageRank, 6 for ratios) so the driver's value-hash compares stably
despite summation-order differences.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from networkit_spark import (  # noqa: E402
    ConnectedComponents,
    Graph,
    LocalClusteringCoefficient,
    PLP,
    PageRank,
    TriangleEdgeScore,
)

V_BIG = 8192  # node-space for linear-cost kernels
V_SMALL = 1024  # node-space for cubic-ish oracle checks
PR_ITERS = 10
PLP_ITERS = 4

# Cross-query memo: the driver calls each queries() entry in sequence in
# one process/session, and ~20 of them start from the same derived graph
# (and several from the same connected-components run). Cache persisted
# frames keyed by the Spark application id so repeated construction cost
# is paid once per session instead of once per query.
_MEMO: dict = {}


def _memo(spark: SparkSession, key: tuple, build):
    full_key = (spark.sparkContext.applicationId,) + key
    if full_key not in _MEMO:
        _MEMO[full_key] = build()
    return _MEMO[full_key]


# --------------------------------------------------------------------- helpers
def _raw_edges(spark: SparkSession, sf_dir: str, v: int) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        (F.col("l_orderkey") % v).alias("src"),
        (F.col("l_partkey") % v).alias("dst"),
    )


def directed_graph(spark: SparkSession, sf_dir: str, v: int = V_BIG) -> Graph:
    """Directed weighted link graph; weight = link multiplicity."""

    def build() -> Graph:
        edges = (
            _raw_edges(spark, sf_dir, v)
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("double").alias("weight"))
            .localCheckpoint()
        )
        return Graph(edges, directed=True, weighted=True)

    return _memo(spark, ("dir", sf_dir, v), build)


def undirected_graph(spark: SparkSession, sf_dir: str, v: int = V_SMALL) -> Graph:
    """Undirected simple graph: canonicalized, self-loops removed,
    weight = multiplicity of the canonical pair."""

    def build() -> Graph:
        raw = _raw_edges(spark, sf_dir, v)
        edges = (
            raw.where(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("double").alias("weight"))
            .localCheckpoint()
        )
        return Graph(edges, directed=False, weighted=True)

    return _memo(spark, ("undir", sf_dir, v), build)


def _cc_run(spark: SparkSession, sf_dir: str) -> ConnectedComponents:
    """Shared converged hash-min run over the V_SMALL undirected graph
    (components / component_sizes / largest_component / modularity /
    coarsen all start from this partition)."""

    def build() -> ConnectedComponents:
        cc = ConnectedComponents(undirected_graph(spark, sf_dir)).run()
        cc._labels = cc._labels.localCheckpoint()
        return cc

    return _memo(spark, ("cc", sf_dir), build)


# SQL fragments mirroring the same derivations for DuckDB
def _sql_directed(v: int) -> str:
    return f"""
edges AS MATERIALIZED (
  SELECT l_orderkey % {v} AS src, l_partkey % {v} AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM lineitem GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges
  )
)"""


def _sql_undirected(v: int) -> str:
    return f"""
edges AS MATERIALIZED (
  SELECT least(l_orderkey % {v}, l_partkey % {v}) AS src,
         greatest(l_orderkey % {v}, l_partkey % {v}) AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM lineitem
  WHERE l_orderkey % {v} <> l_partkey % {v}
  GROUP BY 1, 2
),
sym AS MATERIALIZED (
  SELECT src, dst, weight FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst, weight FROM edges
),
nodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges
  )
)"""


# --------------------------------------------------------------------- queries
def q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = directed_graph(spark, sf_dir)
    return g.degrees().select(
        "id",
        "out_deg",
        "in_deg",
        F.round("w_out_deg", 6).alias("w_out_deg"),
        F.round("w_in_deg", 6).alias("w_in_deg"),
    )


def q_degree_sql() -> str:
    return f"""
WITH {_sql_directed(V_BIG)}
SELECT n.id AS id,
       coalesce(o.out_deg, 0) AS out_deg,
       coalesce(i.in_deg, 0) AS in_deg,
       round(coalesce(o.w_out_deg, 0), 6) AS w_out_deg,
       round(coalesce(i.w_in_deg, 0), 6) AS w_in_deg
FROM nodes n
LEFT JOIN (SELECT src AS id, count(*) AS out_deg, sum(weight) AS w_out_deg
           FROM edges GROUP BY src) o USING (id)
LEFT JOIN (SELECT dst AS id, count(*) AS in_deg, sum(weight) AS w_in_deg
           FROM edges GROUP BY dst) i USING (id)
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = directed_graph(spark, sf_dir)
    pr = PageRank(
        g, damp=0.85, tol=0.0, norm="l1", max_iterations=PR_ITERS,
        unroll=PR_ITERS,
    ).run()
    return pr.scores().select("id", F.round("score", 8).alias("score"))


def q_pagerank_sql() -> str:
    # unrolled power iteration: pr0 .. pr{PR_ITERS}, then final
    # normalization by the sum (PageRank.cpp:74-78 semantics)
    steps = []
    for k in range(1, PR_ITERS + 1):
        steps.append(
            f"""pr{k} AS MATERIALIZED (
  SELECT n.id AS id,
         (1 - 0.85) / (SELECT count(*) FROM nodes)
         + 0.85 * coalesce(s.msum, 0) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS id, sum(p.rank * e.weight / d.wdeg) AS msum
    FROM pr{k - 1} p
    JOIN edges e ON e.src = p.id
    JOIN wdeg d ON d.id = p.id
    GROUP BY e.dst
  ) s USING (id)
)"""
        )
    steps_sql = ",\n".join(steps)
    return f"""
WITH {_sql_directed(V_BIG)},
wdeg AS (SELECT src AS id, sum(weight) AS wdeg FROM edges GROUP BY src),
pr0 AS (SELECT id, 1.0 / (SELECT count(*) FROM nodes) AS rank FROM nodes),
{steps_sql}
SELECT id, round(rank / (SELECT sum(rank) FROM pr{PR_ITERS}), 8) AS score
FROM pr{PR_ITERS}
"""


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = _cc_run(spark, sf_dir)
    return cc.get_partition().select("id", "label")



_HASHMIN_ROUNDS = 8  # measured convergence at sf0.01 is 3 rounds (scripts/
# check_oracle.py preamble); 8 gives margin. A non-converged unroll shows
# up as a visible hash MISMATCH, never a silent pass.


def _sql_hashmin_labels() -> str:
    """Unrolled hash-min label propagation over ``sym``/``nodes`` (must be
    in scope from ``_sql_undirected``): the DuckDB twin of the engine's
    converged min-label fixpoint. Replaces the transitive-closure
    recursive CTE (~25-50s at sf0.01) with ~0.4s of bounded rounds."""
    steps = ["lab0 AS (SELECT id, id AS label FROM nodes)"]
    for k in range(1, _HASHMIN_ROUNDS + 1):
        steps.append(
            f"""lab{k} AS MATERIALIZED (
  SELECT l.id, least(l.label, coalesce(m.ml, l.label)) AS label
  FROM lab{k - 1} l LEFT JOIN (
    SELECT s.dst AS id, min(l2.label) AS ml
    FROM sym s JOIN lab{k - 1} l2 ON l2.id = s.src GROUP BY s.dst
  ) m USING (id)
)"""
        )
    steps.append(
        f"labels AS MATERIALIZED (SELECT id, label FROM lab{_HASHMIN_ROUNDS})"
    )
    return ",\n".join(steps)


def q_components_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_sql_hashmin_labels()}
SELECT id, label FROM labels
"""


def q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = _cc_run(spark, sf_dir)
    return cc.get_component_sizes().select("label", "size")


def q_component_sizes_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_sql_hashmin_labels()}
SELECT label, count(*) AS size FROM labels GROUP BY label
"""


def q_plp(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = undirected_graph(spark, sf_dir)
    plp = PLP(g, update_threshold=-1, max_iterations=PLP_ITERS).run()
    return plp.get_partition().select("id", "label")


def q_plp_sql() -> str:
    # unrolled synchronous sweeps with the (weight desc, label asc) tie
    # rule (PLP.cpp:87-90)
    steps = []
    for k in range(1, PLP_ITERS + 1):
        steps.append(
            f"""lab{k} AS MATERIALIZED (
  SELECT p.id AS id, coalesce(h.new_label, p.label) AS label
  FROM lab{k - 1} p
  LEFT JOIN (
    SELECT id, label AS new_label FROM (
      SELECT s.dst AS id, p2.label AS label,
             row_number() OVER (PARTITION BY s.dst
                                ORDER BY sum(s.weight) DESC, p2.label ASC) AS rn
      FROM sym s JOIN lab{k - 1} p2 ON p2.id = s.src
      GROUP BY s.dst, p2.label
    ) WHERE rn = 1
  ) h USING (id)
)"""
        )
    steps_sql = ",\n".join(steps)
    return f"""
WITH {_sql_undirected(V_SMALL)},
lab0 AS (SELECT id, id AS label FROM nodes),
{steps_sql}
SELECT id, label FROM lab{PLP_ITERS}
"""


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = undirected_graph(spark, sf_dir)
    lcc = LocalClusteringCoefficient(g).run()
    return lcc.triangles().select("id", "triangles")


_SQL_ORIENTED = """
deg AS MATERIALIZED (
  SELECT id, count(*) AS d FROM (
    SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges
  ) GROUP BY id
),
oriented AS MATERIALIZED (
  SELECT CASE WHEN (ds.d, e.src) < (dd.d, e.dst) THEN e.src ELSE e.dst END AS a,
         CASE WHEN (ds.d, e.src) < (dd.d, e.dst) THEN e.dst ELSE e.src END AS b,
         CASE WHEN (ds.d, e.src) < (dd.d, e.dst) THEN dd.d ELSE ds.d END AS d_b
  FROM edges e
  JOIN deg ds ON ds.id = e.src
  JOIN deg dd ON dd.id = e.dst
),
tris AS MATERIALIZED (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM oriented e1
  JOIN oriented e2 ON e1.a = e2.a
                  AND (e1.d_b, e1.b) < (e2.d_b, e2.b)
  WHERE EXISTS (SELECT 1 FROM oriented o
                WHERE o.a = e1.b AND o.b = e2.b)
)"""


def q_triangles_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_SQL_ORIENTED},
corners AS (
  SELECT a AS id FROM tris
  UNION ALL SELECT b AS id FROM tris
  UNION ALL SELECT c AS id FROM tris
)
SELECT n.id AS id, coalesce(t.cnt, 0) AS triangles
FROM nodes n
LEFT JOIN (SELECT id, count(*) AS cnt FROM corners GROUP BY id) t USING (id)
"""


def q_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = undirected_graph(spark, sf_dir)
    lcc = LocalClusteringCoefficient(g).run()
    return lcc.scores().select("id", F.round("score", 6).alias("lcc"))


def q_lcc_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_SQL_ORIENTED},
corners AS (
  SELECT a AS id FROM tris
  UNION ALL SELECT b AS id FROM tris
  UNION ALL SELECT c AS id FROM tris
),
tcount AS (SELECT id, count(*) AS cnt FROM corners GROUP BY id)
SELECT n.id AS id,
       round(CASE WHEN coalesce(d.d, 0) >= 2
                  THEN 2.0 * coalesce(t.cnt, 0) / (d.d * (d.d - 1))
                  ELSE 0.0 END, 6) AS lcc
FROM nodes n
LEFT JOIN deg d ON d.id = n.id
LEFT JOIN tcount t ON t.id = n.id
"""


def q_triangle_edge_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = undirected_graph(spark, sf_dir)
    tes = TriangleEdgeScore(g).run()
    return tes.edge_scores().select("u", "v", "score")


def q_triangle_edge_score_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_SQL_ORIENTED},
epairs AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tris
  UNION ALL SELECT least(a, c) AS u, greatest(a, c) AS v FROM tris
  UNION ALL SELECT least(b, c) AS u, greatest(b, c) AS v FROM tris
)
SELECT e.src AS u, e.dst AS v, coalesce(p.cnt, 0) AS score
FROM edges e
LEFT JOIN (SELECT u, v, count(*) AS cnt FROM epairs GROUP BY u, v) p
  ON p.u = e.src AND p.v = e.dst
"""


def q_simmelian_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric Simmelian backbone: per-edge prefix-ranked common-
    neighbor overlap (maxRank=5)."""
    from networkit_spark.operators.sparsification import simmelian_overlap_scores

    g = undirected_graph(spark, sf_dir)
    return simmelian_overlap_scores(g, max_rank=5).select(
        "u", "v", F.col("score").cast("long").alias("overlap")
    )


def q_simmelian_overlap_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_SQL_ORIENTED},
epairs AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tris
  UNION ALL SELECT least(a, c) AS u, greatest(a, c) AS v FROM tris
  UNION ALL SELECT least(b, c) AS u, greatest(b, c) AS v FROM tris
),
tri AS MATERIALIZED (
  SELECT e.src AS u, e.dst AS v, coalesce(p.cnt, 0) AS score
  FROM edges e
  LEFT JOIN (SELECT u, v, count(*) AS cnt FROM epairs GROUP BY u, v) p
    ON p.u = e.src AND p.v = e.dst
),
ranked AS MATERIALIZED (
  SELECT ego, alter, rank() OVER (PARTITION BY ego ORDER BY score DESC) - 1
           AS rnk
  FROM (
    SELECT u AS ego, v AS alter, score FROM tri
    UNION ALL
    SELECT v AS ego, u AS alter, score FROM tri
  )
  QUALIFY rnk <= 5
),
ov AS (
  SELECT t.u, t.v, count(*) AS c
  FROM tri t
  JOIN ranked r1 ON r1.ego = t.u
  JOIN ranked r2 ON r2.ego = t.v AND r2.alter = r1.alter
  GROUP BY t.u, t.v
)
SELECT t.u, t.v, coalesce(ov.c, 0) AS overlap
FROM tri t LEFT JOIN ov ON ov.u = t.u AND ov.v = t.v
"""


def q_largest_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = _cc_run(spark, sf_dir)
    return (
        cc.get_component_sizes()
        .orderBy(F.desc("size"), F.asc("label"))
        .limit(1)
        .select("label", "size")
    )


def q_largest_component_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_sql_hashmin_labels()}
SELECT label, count(*) AS size FROM labels GROUP BY label
ORDER BY size DESC, label ASC LIMIT 1
"""


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity of the hash-min component partition
    (coverage − Σ vol(C)²/vol(G)², ``cpp/community/Modularity.cpp:25-80``).
    Degenerate by construction (components are fully intra-cluster →
    coverage 1) but exercises the full quality-measure plan."""
    from networkit_spark.operators.quality import modularity

    g = undirected_graph(spark, sf_dir)
    cc = _cc_run(spark, sf_dir)
    m = modularity(g, cc.get_partition())
    return spark.createDataFrame([(round(m, 6),)], "modularity double")


def q_modularity_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_sql_hashmin_labels()},
tot AS (SELECT sum(weight) AS w FROM edges),
intra AS (
  SELECT sum(e.weight) AS w
  FROM edges e JOIN labels l1 ON l1.id = e.src
               JOIN labels l2 ON l2.id = e.dst
  WHERE l1.label = l2.label
),
vol AS (
  SELECT l.label, sum(d.wd) AS v
  FROM (SELECT src AS id, sum(weight) AS wd FROM sym GROUP BY src) d
  JOIN labels l ON l.id = d.id
  GROUP BY l.label
)
SELECT round(
  coalesce((SELECT w FROM intra), 0) / (SELECT w FROM tot)
  - (SELECT sum(v * v) FROM vol) / (4 * (SELECT w * w FROM tot)), 6
) AS modularity
"""


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Assortativity.cpp:63-90 Pearson mode over
    edge endpoint degrees) on the V_SMALL undirected graph."""
    from networkit_spark.operators.correlation import Assortativity

    g = undirected_graph(spark, sf_dir)
    deg = (
        g.symmetrized()
        .select("src", "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    r = Assortativity(g, attribute=deg).run().get_coefficient()
    return spark.createDataFrame([(round(r, 6),)], "assortativity double")


def q_assortativity_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
deg AS (
  SELECT src AS id, CAST(count(*) AS DOUBLE) AS x FROM sym GROUP BY src
),
pairs AS (
  SELECT du.x AS xu, dv.x AS xv
  FROM edges e JOIN deg du ON du.id = e.src JOIN deg dv ON dv.id = e.dst
),
mean AS (SELECT avg(xu) AS mx, avg(xv) AS my FROM pairs)
SELECT round(
  sum((xu - mx) * (xv - my))
  / sqrt(sum((xu - mx) * (xu - mx)) * sum((xv - my) * (xv - my))), 6
) AS assortativity
FROM pairs, mean
"""


_PQ_CLUSTERS = 32


def q_partition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster partition-evaluation panel over the deterministic
    ``id % 32`` partition of the V_SMALL undirected graph: intra-cluster
    density (``IntrapartitionDensity.cpp``), hub dominance
    (``PartitionHubDominance.cpp``), fragmentation against the hash-min
    CC partition (``PartitionFragmentation.cpp``), stable-node fraction
    (``StablePartitionNodes.cpp``), isolated inter-partition conductance
    and expansion (``IsolatedInterpartition{Conductance,Expansion}.cpp``).
    The mod partition cuts across components, so every measure is
    non-degenerate."""
    from networkit_spark.operators.quality import (
        intrapartition_density,
        isolated_interpartition_conductance,
        isolated_interpartition_expansion,
        partition_fragmentation,
        partition_hub_dominance,
        stable_partition_summary,
    )

    g = undirected_graph(spark, sf_dir)
    part = g.vertices.select("id", (F.col("id") % _PQ_CLUSTERS).alias("label"))
    cc = _cc_run(spark, sf_dir).get_partition()
    dens = intrapartition_density(g, part).select("label", "size", "density")
    dom = partition_hub_dominance(g, part).select("label", "dominance")
    frag = partition_fragmentation(g, part, cc).select("label", "fragmentation")
    stab = stable_partition_summary(g, part).select("label", "stable_fraction")
    iic = isolated_interpartition_conductance(g, part).select(
        "label", "conductance"
    )
    iie = isolated_interpartition_expansion(g, part).select("label", "expansion")
    out = (
        dens.join(dom, "label")
        .join(frag, "label")
        .join(stab, "label")
        .join(iic, "label")
        .join(iie, "label")
    )
    return out.select(
        "label",
        "size",
        F.round("density", 8).alias("density"),
        F.round("dominance", 8).alias("dominance"),
        F.round("fragmentation", 8).alias("fragmentation"),
        F.round("stable_fraction", 8).alias("stable_fraction"),
        F.round("conductance", 8).alias("conductance"),
        F.round("expansion", 8).alias("expansion"),
    )


def q_partition_quality_sql() -> str:
    k = _PQ_CLUSTERS
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_sql_hashmin_labels()},
part AS MATERIALIZED (SELECT id, id % {k} AS label FROM nodes),
sizes AS (SELECT label, count(*) AS size FROM part GROUP BY label),
ej AS MATERIALIZED (
  SELECT e.src, e.dst, e.weight, p1.label AS l_src, p2.label AS l_dst
  FROM edges e JOIN part p1 ON p1.id = e.src JOIN part p2 ON p2.id = e.dst
),
intra AS (
  SELECT l_src AS label, count(*) AS ie FROM ej
  WHERE l_src = l_dst GROUP BY l_src
),
dens AS (
  SELECT s.label, s.size,
         CASE WHEN s.size > 1
              THEN coalesce(ie, 0) / (s.size * (s.size - 1) / 2.0)
              ELSE 1.0 END AS density
  FROM sizes s LEFT JOIN intra USING (label)
),
ideg AS (
  SELECT sj.src AS id, p1.label, count(*) AS d
  FROM sym sj JOIN part p1 ON p1.id = sj.src
              JOIN part p2 ON p2.id = sj.dst
  WHERE p1.label = p2.label
  GROUP BY sj.src, p1.label
),
dom AS (
  SELECT s.label,
         CASE WHEN s.size > 1
              THEN coalesce(m.md, 0) * 1.0 / (s.size - 1)
              ELSE 1.0 END AS dominance
  FROM sizes s LEFT JOIN (
    SELECT label, max(d) AS md FROM ideg GROUP BY label
  ) m USING (label)
),
pieces AS (
  SELECT p.label, l.label AS comp, count(*) AS piece
  FROM part p JOIN labels l USING (id)
  GROUP BY p.label, l.label
),
frag AS (
  SELECT s.label, 1.0 - max(piece) * 1.0 / s.size AS fragmentation
  FROM sizes s JOIN pieces USING (label)
  GROUP BY s.label, s.size
),
lw AS (
  SELECT sj.src AS id, p2.label AS nbr_label, sum(sj.weight) AS w
  FROM sym sj JOIN part p2 ON p2.id = sj.dst
  GROUP BY sj.src, p2.label
),
node_stab AS (
  SELECT p.id, p.label,
         coalesce(sum(CASE WHEN lw.nbr_label = p.label THEN lw.w END), 0)
           AS own_w,
         coalesce(max(CASE WHEN lw.nbr_label <> p.label THEN lw.w END), 0)
           AS other_max,
         count(lw.nbr_label) AS nn
  FROM part p LEFT JOIN lw ON lw.id = p.id
  GROUP BY p.id, p.label
),
stab AS (
  SELECT label,
         avg(CASE WHEN nn = 0 OR (own_w > 0 AND own_w > other_max)
                  THEN 1.0 ELSE 0.0 END) AS stable_fraction
  FROM node_stab GROUP BY label
),
side AS (
  SELECT l_src AS label, weight,
         CASE WHEN l_src <> l_dst THEN weight ELSE 0 END AS cutw
  FROM ej
  UNION ALL
  SELECT l_dst AS label, weight,
         CASE WHEN l_src <> l_dst THEN weight ELSE 0 END AS cutw
  FROM ej
),
volcut AS (
  SELECT label, sum(cutw) AS cut, sum(weight) AS vol
  FROM side GROUP BY label
),
tot AS (SELECT 2.0 * sum(weight) AS tv FROM edges),
n_all AS (SELECT count(*) AS n FROM nodes)
SELECT d.label, d.size,
       round(d.density, 8) AS density,
       round(dom.dominance, 8) AS dominance,
       round(f.fragmentation, 8) AS fragmentation,
       round(st.stable_fraction, 8) AS stable_fraction,
       round(CASE WHEN least(v.vol, tot.tv - v.vol) > 0
                  THEN v.cut / least(v.vol, tot.tv - v.vol)
                  ELSE 0.0 END, 8) AS conductance,
       round(CASE WHEN least(d.size, n_all.n - d.size) > 0
                  THEN v.cut / least(d.size, n_all.n - d.size)
                  ELSE 0.0 END, 8) AS expansion
FROM dens d
JOIN dom USING (label)
JOIN frag f USING (label)
JOIN stab st USING (label)
JOIN volcut v USING (label)
CROSS JOIN tot CROSS JOIN n_all
"""


def q_spectral_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector + Katz centralities joined per node (merged family
    row: both ride the same 5-round unrolled power-iteration plan over
    the V_BIG directed graph; formerly two standalone gate entries)."""
    ev = q_eigenvector(spark, sf_dir).select(
        "id", F.col("score").alias("eigenvector")
    )
    kz = q_katz(spark, sf_dir).select("id", F.col("score").alias("katz"))
    return ev.join(kz, "id")


def q_spectral_ranks_sql() -> str:
    return f"""
SELECT e.id, e.score AS eigenvector, k.score AS katz
FROM ({q_eigenvector_sql()}) e JOIN ({q_katz_sql()}) k USING (id)
"""


# ------------------------------------------------------- document / text ops
def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keep min doc_id per md5(text)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("copies"))
    )


def q_doc_exact_dedup_sql() -> str:
    return """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS copies
FROM documents GROUP BY md5(text)
"""


def q_doc_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged text-analysis family (one gated query, one document scan):
    token count, length, punctuation ratio, stopword hits, plus n-gram
    language id (pred_lang, lang score) per document — all codegen
    column expressions, no UDF, and ONE projection: the language-id
    argmax columns are inlined next to the stats columns instead of
    joined back (both are per-row functions of the same scan; the old
    self-join was a pure shuffle tax)."""
    from networkit_spark.operators.textstats import lang_argmax

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text = F.col("text")
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    the_hits = F.size(F.split(F.concat(F.lit(" "), text, F.lit(" ")), r"\bthe\b")) - 1
    best, best_score = lang_argmax(text)
    return docs.select(
        "doc_id",
        F.when(F.trim(text) == "", 0)
        .otherwise(F.size(F.split(F.trim(text), r"\s+")))
        .alias("n_tokens"),
        n.alias("n_chars_computed"),
        F.round(punct.cast("double") / F.greatest(n, F.lit(1)), 6).alias("punct_ratio"),
        the_hits.alias("the_count"),
        best.alias("pred_lang"),
        best_score.alias("lang_score"),
    )


def q_doc_textstats_sql() -> str:
    lang_sql = q_doc_lang_id_sql()
    return rf"""
WITH lang AS ({lang_sql})
SELECT d.doc_id,
       CASE WHEN trim(d.text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END AS n_tokens,
       len(d.text) AS n_chars_computed,
       round(CAST(len(d.text) - len(regexp_replace(d.text, '[.,!?;:]', '', 'g')) AS DOUBLE)
             / greatest(len(d.text), 1), 6) AS punct_ratio,
       len(regexp_split_to_array(' ' || d.text || ' ', '\bthe\b')) - 1 AS the_count,
       lang.pred_lang,
       lang.score AS lang_score
FROM documents d JOIN lang ON lang.doc_id = d.doc_id
"""


def q_events_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the recrawl-dedup pattern
    (row_number over (partition by key order by ts desc))."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q_events_latest_sql() -> str:
    return """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------- extended graph kernels
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core decomposition via the h-index fixpoint (equals the peel's
    core numbers; kcore.py docstring). Oracle = the same fixpoint
    unrolled ``_KCORE_ROUNDS`` times in SQL — measured convergence at
    sf0.01 is 15-16 rounds (engine fixpoint confirms at iteration 16
    with unroll=4); extra rounds past the fixpoint are identity
    (monotone), so the unroll carries margin. The round-2 hash mismatch
    was a TYPE artifact, not an under-unroll: DuckDB's ``sum(BIGINT)``
    window is HUGEINT, making ``least(h, ge)`` (and so the output
    column) HUGEINT, which the driver's pandas hashing renders
    differently than Spark's long — hence the final CAST to BIGINT."""
    from networkit_spark.operators.kcore import CoreDecomposition

    g = undirected_graph(spark, sf_dir)
    cd = CoreDecomposition(g, unroll=4).run()
    return cd.core_numbers().select("id", "core")


_KCORE_ROUNDS = 20


def q_kcore_sql() -> str:
    steps = [
        """h0 AS MATERIALIZED (
  SELECT n.id, coalesce(d.c, 0) AS h
  FROM nodes n LEFT JOIN (
    SELECT src AS id, count(*) AS c FROM sym GROUP BY src) d USING (id)
)"""
    ]
    for k in range(1, _KCORE_ROUNDS + 1):
        steps.append(
            f"""h{k} AS MATERIALIZED (
  SELECT n.id, coalesce(x.h, 0) AS h
  FROM nodes n LEFT JOIN (
    SELECT dst AS id, max(least(h, ge)) AS h FROM (
      SELECT dst, h,
             sum(c) OVER (PARTITION BY dst ORDER BY h DESC
                          ROWS UNBOUNDED PRECEDING) AS ge
      FROM (SELECT s.dst, l.h, count(*) AS c
            FROM sym s JOIN h{k - 1} l ON l.id = s.src
            GROUP BY s.dst, l.h))
    GROUP BY dst) x USING (id)
)"""
        )
    return f"""
WITH {_sql_undirected(V_SMALL)},
{",".join(steps)}
SELECT id, CAST(h AS BIGINT) AS core FROM h{_KCORE_ROUNDS}
"""


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances from node 0 on the undirected graph."""
    from networkit_spark.operators.distance import BFS

    g = undirected_graph(spark, sf_dir)
    bfs = BFS(g, source=0, max_hops=30).run()
    return bfs.distances().select("id", "dist")


def q_bfs_hops_sql() -> str:
    return f"""
WITH RECURSIVE {_sql_undirected(V_SMALL)},
walk (id, d) AS (
  SELECT CAST(0 AS BIGINT) AS id, 0 AS d
  UNION
  SELECT s.dst AS id, w.d + 1 AS d
  FROM walk w JOIN sym s ON s.src = w.id
  WHERE w.d < 30
)
SELECT id, min(d) AS dist FROM walk GROUP BY id
"""


def q_apsp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark hop distances (APSP.cpp / SPSP.cpp contract) from sources
    {0,1,2,3} — all sources advance in one batched BFS."""
    from networkit_spark.operators.distance import APSP

    g = undirected_graph(spark, sf_dir)
    apsp = APSP(g, sources=[0, 1, 2, 3], max_hops=30).run()
    return apsp.distances().select("source", "id", "dist")


def q_apsp_sql() -> str:
    return f"""
WITH RECURSIVE {_sql_undirected(V_SMALL)},
walk (source, id, d) AS (
  SELECT id AS source, id, 0 FROM nodes WHERE id IN (0, 1, 2, 3)
  UNION
  SELECT w.source, s.dst AS id, w.d + 1 AS d
  FROM walk w JOIN sym s ON s.src = w.id
  WHERE w.d < 30
)
SELECT source, id, min(d) AS dist FROM walk GROUP BY source, id
"""


# Rigorous Bellman-Ford round bound: weights are 1..5 and the thin
# graph's hop diameter is <= 7, so any shortest weighted distance is
# <= 35; with unit-minimum weights a shortest path therefore uses <= 35
# edges -- 35 relaxation rounds provably reach the fixpoint.
_SSSP_ROUNDS = 35


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (Dijkstra.cpp result
    contract) from the smallest node id, deterministic weights
    w = 1 + (src+dst) % 5; oracle = unrolled Bellman-Ford."""
    from networkit_spark.operators.distance import Dijkstra

    g = _thin_directed_graph(spark, sf_dir)
    edges = g.edges.select(
        "src", "dst", (1 + (F.col("src") + F.col("dst")) % 5).cast("double").alias("weight")
    )
    wg = Graph(edges, directed=True, weighted=True)
    src = g.vertices.agg(F.min("id")).collect()[0][0]
    dj = Dijkstra(wg, source=int(src)).run()
    return dj.distances().select("id", F.round("dist", 6).alias("dist"))


def q_sssp_sql() -> str:
    steps = []
    for k in range(1, _SSSP_ROUNDS + 1):
        steps.append(
            f"""d{k} AS MATERIALIZED (
  SELECT p.id, least(p.dist, coalesce(m.nd, p.dist)) AS dist
  FROM d{k - 1} p LEFT JOIN (
    SELECT e.dst AS id, min(p2.dist + 1 + (e.src + e.dst) % 5) AS nd
    FROM e JOIN d{k - 1} p2 ON p2.id = e.src GROUP BY e.dst
  ) m USING (id)
)"""
        )
    return f"""
WITH {_SQL_THIN_DIRECTED},
d0 AS (
  SELECT id, CASE WHEN id = (SELECT min(id) FROM nodes)
                  THEN 0.0 ELSE 1e18 END AS dist
  FROM nodes
),
{",".join(steps)}
SELECT id, round(dist, 6) AS dist FROM d{_SSSP_ROUNDS} WHERE dist < 1e17
"""


def q_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract the undirected graph by its connected-component labels
    (``ParallelPartitionCoarsening``): super-edges with summed weights."""
    from networkit_spark.operators.coarsening import ParallelPartitionCoarsening

    g = undirected_graph(spark, sf_dir)
    cc = _cc_run(spark, sf_dir)
    pc = ParallelPartitionCoarsening(g, cc.get_partition()).run()
    return pc.get_coarse_graph().edges.select(
        "src", "dst", F.round("weight", 6).alias("weight")
    )


def q_coarsen_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_sql_hashmin_labels()},
compact AS (
  SELECT label, row_number() OVER (ORDER BY label) - 1 AS super
  FROM (SELECT DISTINCT label FROM labels)
),
mapping AS (SELECT l.id, c.super FROM labels l JOIN compact c USING (label))
SELECT least(ms.super, md.super) AS src,
       greatest(ms.super, md.super) AS dst,
       round(sum(e.weight), 6) AS weight
FROM edges e
JOIN mapping ms ON ms.id = e.src
JOIN mapping md ON md.id = e.dst
GROUP BY 1, 2
"""


def q_triangle_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparsification: GlobalThresholdFilter keeping edges with triangle
    (common-neighbor) score ≥ 2."""
    from networkit_spark.operators.sparsification import global_threshold_filter

    g = undirected_graph(spark, sf_dir)
    tes = TriangleEdgeScore(g).run()
    kept = global_threshold_filter(
        g, tes.edge_scores().withColumn("score", F.col("score").cast("double")), 2.0
    )
    return kept.edges.select("src", "dst")


def q_triangle_filter_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_SQL_ORIENTED},
epairs AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tris
  UNION ALL SELECT least(a, c) AS u, greatest(a, c) AS v FROM tris
  UNION ALL SELECT least(b, c) AS u, greatest(b, c) AS v FROM tris
)
SELECT e.src, e.dst
FROM edges e
JOIN (SELECT u, v, count(*) AS cnt FROM epairs GROUP BY u, v) p
  ON p.u = e.src AND p.v = e.dst
WHERE p.cnt >= 2
"""


def q_local_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalDegreeScore sparsifier (LocalDegreeScore.cpp:38-88):
    competition-ranked neighbor degrees, max over endpoints."""
    from networkit_spark.operators.sparsification import local_degree_scores

    g = undirected_graph(spark, sf_dir)
    return local_degree_scores(g).select(
        "u", "v", F.round("score", 6).alias("score")
    )


def q_local_degree_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym),
deg AS (SELECT src AS id, count(*) AS d FROM adj GROUP BY src),
j AS (
  SELECT a.src, a.dst, ds.d AS d_src, dd.d AS d_dst
  FROM adj a JOIN deg ds ON ds.id = a.src JOIN deg dd ON dd.id = a.dst
),
ranked AS (
  SELECT src, dst, d_src, d_dst,
         rank() OVER (PARTITION BY src ORDER BY d_dst DESC) AS rnk
  FROM j
),
scored AS (
  SELECT src, dst,
         CASE WHEN d_src > 1 THEN 1.0 - ln(rnk) / ln(d_src) ELSE 1.0 END AS e
  FROM ranked
)
SELECT least(src, dst) AS u, greatest(src, dst) AS v,
       round(max(e), 6) AS score
FROM scored GROUP BY 1, 2
"""


def q_scan_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCAN structural similarity (SCANStructuralSimilarityScore.cpp:
    10-16): (tri+1)/sqrt((du+1)(dv+1)) per canonical edge."""
    from networkit_spark.operators.sparsification import scan_similarity_scores

    g = undirected_graph(spark, sf_dir)
    return scan_similarity_scores(g).select(
        "u", "v", F.round("score", 6).alias("score")
    )


def q_scan_similarity_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_SQL_ORIENTED},
epairs AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tris
  UNION ALL SELECT least(a, c) AS u, greatest(a, c) AS v FROM tris
  UNION ALL SELECT least(b, c) AS u, greatest(b, c) AS v FROM tris
),
tri AS (
  SELECT e.src AS u, e.dst AS v, coalesce(p.cnt, 0) AS tri
  FROM edges e
  LEFT JOIN (SELECT u, v, count(*) AS cnt FROM epairs GROUP BY u, v) p
    ON p.u = e.src AND p.v = e.dst
),
sdeg AS (SELECT src AS id, count(DISTINCT dst) AS d FROM sym WHERE src <> dst GROUP BY src)
SELECT t.u, t.v,
       round((t.tri + 1) / sqrt((du.d + 1) * (dv.d + 1)), 6) AS score
FROM tri t JOIN sdeg du ON du.id = t.u JOIN sdeg dv ON dv.id = t.v
"""


def q_local_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalSimilarityScore (LocalSimilarityScore.cpp:17-66): ordinal
    per-node rank of neighbor Jaccard similarity, max over endpoints."""
    from networkit_spark.operators.sparsification import local_similarity_scores

    g = undirected_graph(spark, sf_dir)
    return local_similarity_scores(g).select(
        "u", "v", F.round("score", 6).alias("score")
    )


def q_local_similarity_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_SQL_ORIENTED},
epairs AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tris
  UNION ALL SELECT least(a, c) AS u, greatest(a, c) AS v FROM tris
  UNION ALL SELECT least(b, c) AS u, greatest(b, c) AS v FROM tris
),
tri AS MATERIALIZED (
  SELECT e.src AS u, e.dst AS v, coalesce(p.cnt, 0) AS tri
  FROM edges e
  LEFT JOIN (SELECT u, v, count(*) AS cnt FROM epairs GROUP BY u, v) p
    ON p.u = e.src AND p.v = e.dst
),
sdeg AS (SELECT src AS id, count(DISTINCT dst) AS d FROM sym WHERE src <> dst GROUP BY src),
both_dir AS (
  SELECT u, v, tri FROM tri
  UNION ALL SELECT v AS u, u AS v, tri FROM tri
),
simmed AS (
  SELECT b.u, b.v, di.d AS di,
         CAST(b.tri AS DOUBLE) / (di.d + dj.d - b.tri) AS sim
  FROM both_dir b JOIN sdeg di ON di.id = b.u JOIN sdeg dj ON dj.id = b.v
),
ranked AS (
  SELECT u, v, di,
         row_number() OVER (PARTITION BY u ORDER BY sim DESC, v ASC) AS rnk
  FROM simmed
),
scored AS (
  SELECT least(u, v) AS cu, greatest(u, v) AS cv,
         CASE WHEN di <= 1 THEN 1.0 ELSE 1.0 - ln(rnk) / ln(di) END AS e
  FROM ranked
)
SELECT cu AS u, cv AS v, round(max(e), 6) AS score
FROM scored GROUP BY 1, 2
"""


def q_jaccard_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard edge scores (JaccardDistance.cpp:38-40 /
    JaccardSimilaritySparsifier, sparsification.pyx:983)."""
    from networkit_spark.operators.sparsification import jaccard_similarity_scores

    g = undirected_graph(spark, sf_dir)
    return jaccard_similarity_scores(g).select(
        "u", "v", F.round("score", 6).alias("score")
    )


_SQL_EDGE_TRI = f"""
{_SQL_ORIENTED},
epairs AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tris
  UNION ALL SELECT least(a, c) AS u, greatest(a, c) AS v FROM tris
  UNION ALL SELECT least(b, c) AS u, greatest(b, c) AS v FROM tris
),
tri AS MATERIALIZED (
  SELECT e.src AS u, e.dst AS v, coalesce(p.cnt, 0) AS tri
  FROM edges e
  LEFT JOIN (SELECT u, v, count(*) AS cnt FROM epairs GROUP BY u, v) p
    ON p.u = e.src AND p.v = e.dst
),
sdeg AS (SELECT src AS id, count(DISTINCT dst) AS d FROM sym WHERE src <> dst GROUP BY src)"""


def q_jaccard_similarity_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_SQL_EDGE_TRI}
SELECT t.u, t.v,
       round(CAST(t.tri AS DOUBLE) / (du.d + dv.d - t.tri), 6) AS score
FROM tri t JOIN sdeg du ON du.id = t.u JOIN sdeg dv ON dv.id = t.v
"""


def q_chance_corrected_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChanceCorrectedTriangleScore (ChanceCorrectedTriangleScore.cpp:
    22-28): t·(n-2)/((du-1)(dv-1)), degree-1 special case."""
    from networkit_spark.operators.sparsification import (
        chance_corrected_triangle_scores,
    )

    g = undirected_graph(spark, sf_dir)
    return chance_corrected_triangle_scores(g).select(
        "u", "v", F.round("score", 6).alias("score")
    )


def q_chance_corrected_triangle_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
{_SQL_EDGE_TRI}
SELECT t.u, t.v,
       round(CASE WHEN t.tri > 0
                  THEN t.tri * ((SELECT count(*) FROM nodes) - 2.0)
                       / ((du.d - 1) * (dv.d - 1))
                  WHEN du.d = 1 OR dv.d = 1 THEN 1.0
                  ELSE 0.0 END, 6) AS score
FROM tri t JOIN sdeg du ON du.id = t.u JOIN sdeg dv ON dv.id = t.v
"""


def q_multiscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiscaleScore (MultiscaleScore.cpp:14-62): per-endpoint
    1-(1-w/Σw)^(k-1) significance, max over endpoints."""
    from networkit_spark.operators.sparsification import multiscale_scores

    g = undirected_graph(spark, sf_dir)
    return multiscale_scores(g).select(
        "u", "v", F.round("score", 6).alias("score")
    )


def q_multiscale_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
adj AS (SELECT src, dst, weight FROM sym WHERE src <> dst),
pn AS (
  SELECT src AS id, sum(weight) AS wsum, count(*) AS k FROM adj GROUP BY src
),
sig AS (
  SELECT a.src, a.dst,
         1.0 - pow(1.0 - a.weight / p.wsum, p.k - 1) AS prob
  FROM adj a JOIN pn p ON p.id = a.src
)
SELECT least(src, dst) AS u, greatest(src, dst) AS v,
       round(max(prob), 6) AS score
FROM sig GROUP BY 1, 2
"""


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction indices over a deterministic pair sample (every
    canonical edge with (src+dst) % 7 == 0 — predicts existing links)."""
    from networkit_spark.operators.linkprediction import link_prediction_scores

    g = undirected_graph(spark, sf_dir)
    pairs = (
        g.canonical()
        .where((F.col("src") + F.col("dst")) % 7 == 0)
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )
    return link_prediction_scores(g, pairs)


def q_link_prediction_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym),
degs AS (SELECT src AS id, count(*) AS deg FROM adj GROUP BY src),
pairs AS (
  SELECT DISTINCT src AS u, dst AS v FROM edges WHERE (src + dst) % 7 = 0
),
cn AS (
  SELECT p.u, p.v, a1.dst AS w
  FROM pairs p
  JOIN adj a1 ON a1.src = p.u
  JOIN adj a2 ON a2.src = p.v AND a2.dst = a1.dst
),
agg AS (
  SELECT cn.u, cn.v, count(*) AS common_neighbors,
         sum(CASE WHEN d.deg > 1 THEN 1.0 / ln(d.deg) ELSE 0.0 END) AS aa,
         sum(1.0 / d.deg) AS ra
  FROM cn JOIN degs d ON d.id = cn.w
  GROUP BY cn.u, cn.v
),
nn AS (SELECT count(*) AS n FROM (SELECT DISTINCT src FROM sym))
SELECT p.u, p.v,
       coalesce(a.common_neighbors, 0) AS common_neighbors,
       round(CAST(coalesce(a.common_neighbors, 0) AS DOUBLE)
             / greatest(coalesce(du.deg, 0) + coalesce(dv.deg, 0)
                        - coalesce(a.common_neighbors, 0), 1), 6) AS jaccard,
       round(coalesce(a.aa, 0.0), 6) AS adamic_adar,
       coalesce(du.deg, 0) * coalesce(dv.deg, 0) AS pref_attachment,
       round(coalesce(a.ra, 0.0), 6) AS resource_allocation,
       round(CAST(coalesce(a.common_neighbors, 0) AS DOUBLE)
             / sqrt(greatest(coalesce(du.deg, 0) * coalesce(dv.deg, 0), 1)),
             6) AS neighborhood_distance,
       coalesce(du.deg, 0) + coalesce(dv.deg, 0)
         - coalesce(a.common_neighbors, 0) AS total_neighbors,
       coalesce(du.deg, 0) AS u_degree,
       coalesce(dv.deg, 0) AS v_degree,
       -- reference AdjustedRandIndex verbatim incl. its set_union quirk:
       -- b = c = |union| (AdjustedRandIndex.cpp:13-45)
       round(CASE WHEN (aa2.a*aa2.b + aa2.a*aa2.c + 2*aa2.a*aa2.d
                        + aa2.b*aa2.b + aa2.b*aa2.d + aa2.c*aa2.c
                        + aa2.c*aa2.d) = 0 THEN 0.0
             ELSE 2*(aa2.a*aa2.d - aa2.b*aa2.c)
                  / (aa2.a*aa2.b + aa2.a*aa2.c + 2*aa2.a*aa2.d
                     + aa2.b*aa2.b + aa2.b*aa2.d + aa2.c*aa2.c
                     + aa2.c*aa2.d) END, 6) AS adjusted_rand
FROM pairs p
LEFT JOIN agg a ON a.u = p.u AND a.v = p.v
LEFT JOIN degs du ON du.id = p.u
LEFT JOIN degs dv ON dv.id = p.v
CROSS JOIN nn
CROSS JOIN LATERAL (
  SELECT CAST(coalesce(a.common_neighbors, 0) AS DOUBLE) AS a,
         CAST(coalesce(du.deg, 0) + coalesce(dv.deg, 0)
              - coalesce(a.common_neighbors, 0) AS DOUBLE) AS b,
         CAST(coalesce(du.deg, 0) + coalesce(dv.deg, 0)
              - coalesce(a.common_neighbors, 0) AS DOUBLE) AS c,
         CAST(nn.n AS DOUBLE)
           - (coalesce(du.deg, 0) + coalesce(dv.deg, 0)
              - coalesce(a.common_neighbors, 0)) AS d
) aa2
"""


def q_neighbors_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NeighborsMeasureIndex over the same deterministic pair sample:
    |CN| + #(length-3 u→a→b→v walks)."""
    from networkit_spark.operators.linkprediction import neighbors_measure_scores

    g = undirected_graph(spark, sf_dir)
    pairs = (
        g.canonical()
        .where((F.col("src") + F.col("dst")) % 31 == 0)
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )
    return neighbors_measure_scores(g, pairs)


def q_neighbors_measure_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym),
pairs AS (
  SELECT DISTINCT src AS u, dst AS v FROM edges WHERE (src + dst) % 31 = 0
),
cn AS (
  SELECT p.u, p.v, count(*) AS c
  FROM pairs p
  JOIN adj a1 ON a1.src = p.u
  JOIN adj a2 ON a2.src = p.v AND a2.dst = a1.dst
  GROUP BY p.u, p.v
),
walks AS (
  SELECT p.u, p.v, count(*) AS c
  FROM pairs p
  JOIN adj au ON au.src = p.u
  JOIN adj m  ON m.src = au.dst
  JOIN adj av ON av.src = p.v AND av.dst = m.dst
  GROUP BY p.u, p.v
)
SELECT p.u, p.v,
       coalesce(cn.c, 0) + coalesce(walks.c, 0) AS neighbors_measure
FROM pairs p
LEFT JOIN cn ON cn.u = p.u AND cn.v = p.v
LEFT JOIN walks ON walks.u = p.u AND walks.v = p.v
"""


def q_same_community(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SameCommunityIndex with an explicit deterministic partition
    (id % 4) — exercises the operator's partition-join plumbing with a
    SQL-expressible community structure."""
    from networkit_spark.operators.linkprediction import same_community_scores

    g = undirected_graph(spark, sf_dir)
    pairs = (
        g.canonical()
        .where((F.col("src") + F.col("dst")) % 7 == 0)
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )
    part = g.vertices.select("id", (F.col("id") % 4).alias("label"))
    return same_community_scores(g, pairs, part)


def q_same_community_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
pairs AS (
  SELECT DISTINCT src AS u, dst AS v FROM edges WHERE (src + dst) % 7 = 0
)
SELECT u, v, CASE WHEN u % 4 = v % 4 THEN 1 ELSE 0 END AS same_community
FROM pairs
"""


def q_sfigality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.degree import Sfigality

    g = undirected_graph(spark, sf_dir)
    sf = Sfigality(g).run()
    return sf.scores().select("id", F.round("score", 6).alias("sfigality"))


def q_sfigality_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
adj AS MATERIALIZED (SELECT src, dst FROM sym),
degs AS (SELECT src AS id, count(*) AS deg FROM adj GROUP BY src)
SELECT n.id,
       round(coalesce(s.score, 0.0), 6) AS sfigality
FROM nodes n
LEFT JOIN (
  SELECT a.src AS id,
         CAST(sum(CASE WHEN du.deg < dv.deg THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS score
  FROM adj a
  JOIN degs du ON du.id = a.src
  JOIN degs dv ON dv.id = a.dst
  GROUP BY a.src
) s USING (id)
"""


def q_laplacian(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.degree import LaplacianCentrality

    g = undirected_graph(spark, sf_dir)
    lc = LaplacianCentrality(g).run()
    return lc.scores().select("id", F.round("score", 4).alias("laplacian"))


def q_laplacian_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
wdeg AS (SELECT src AS id, sum(weight) AS wd FROM sym GROUP BY src),
nbr AS (
  SELECT s.src AS id,
         sum(s.weight * (s.weight + 2.0 * w.wd)) AS t
  FROM sym s JOIN wdeg w ON w.id = s.dst
  GROUP BY s.src
)
SELECT n.id,
       round(pow(floor(coalesce(w.wd, 0.0)), 2) + coalesce(b.t, 0.0), 4)
         AS laplacian
FROM nodes n
LEFT JOIN wdeg w ON w.id = n.id
LEFT JOIN nbr b ON b.id = n.id
"""


def q_local_partition_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.degree import LocalPartitionCoverage

    g = undirected_graph(spark, sf_dir)
    part = g.vertices.select("id", (F.col("id") % 4).alias("label"))
    lpc = LocalPartitionCoverage(g, part).run()
    return lpc.scores().select("id", F.round("score", 6).alias("coverage"))


def q_local_partition_coverage_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)}
SELECT n.id,
       round(coalesce(s.score, 0.0), 6) AS coverage
FROM nodes n
LEFT JOIN (
  SELECT src AS id,
         sum(CASE WHEN src % 4 = dst % 4 THEN weight ELSE 0.0 END)
           / sum(weight) AS score
  FROM sym GROUP BY src
) s USING (id)
"""


def q_permanence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PermanenceCentrality against the deterministic id%4 partition."""
    from networkit_spark.operators.degree import PermanenceCentrality

    g = undirected_graph(spark, sf_dir)
    part = g.vertices.select("id", (F.col("id") % 4).alias("label"))
    pc = PermanenceCentrality(g, part).run()
    return pc.scores().select("id", F.round("score", 6).alias("permanence"))


def q_permanence_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
adj2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym),
st AS (
  SELECT src AS id, dst % 4 AS nl, src % 4 AS lc, count(*) AS s
  FROM adj2 GROUP BY 1, 2, 3
),
pn AS (
  SELECT id,
         sum(CASE WHEN nl = lc THEN s END) AS internal,
         max(CASE WHEN nl <> lc THEN s END) AS emax,
         sum(s) AS deg
  FROM st GROUP BY id
),
{_SQL_ORIENTED},
corners AS (
  SELECT a AS u, b AS y, c AS z FROM tris
  UNION ALL SELECT b AS u, a AS y, c AS z FROM tris
  UNION ALL SELECT c AS u, a AS y, b AS z FROM tris
),
ti AS (
  SELECT u AS id, count(*) AS tri FROM corners
  WHERE y % 4 = u % 4 AND z % 4 = u % 4 GROUP BY u
)
SELECT n.id,
       round(CASE WHEN coalesce(pn.deg, 0) > 0 THEN
         CAST(coalesce(pn.internal, 0) AS DOUBLE)
           / coalesce(pn.emax, 1) / pn.deg
         - (1.0 - CASE WHEN coalesce(pn.internal, 0) >= 2
              THEN coalesce(ti.tri, 0)
                   / (0.5 * pn.internal * (pn.internal - 1.0))
              ELSE 0.0 END)
       ELSE 0.0 END, 6) AS permanence
FROM nodes n
LEFT JOIN pn ON pn.id = n.id
LEFT JOIN ti ON ti.id = n.id
"""


def q_curveball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curveball randomization (2 round-parallel trade rounds) on the
    256-node graph, returning the DEGREE HISTOGRAM of the randomized
    graph. The histogram is curveball's invariant — the oracle computes
    the same histogram from the raw parquet, so a hash match PROVES the
    degree sequence survived the trades (the randomized edge set itself
    is seed-dependent engine state; simplicity/determinism are
    pytest-gated in tests/test_randomization.py)."""
    from networkit_spark.operators.randomization import Curveball

    g = undirected_graph(spark, sf_dir, 256)
    out = Curveball(g, number_of_rounds=2, seed=3).run().get_graph()
    return (
        out.symmetrized()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.col("d").alias("degree"), "n_nodes")
    )


def q_curveball_sql() -> str:
    return f"""
WITH {_sql_undirected(256)},
dg AS (SELECT src AS id, count(*) AS d FROM (SELECT DISTINCT src, dst FROM sym) GROUP BY src)
SELECT d AS degree, count(*) AS n_nodes FROM dg GROUP BY d
"""


_NIBBLE_ROUNDS = 48  # measured drain at sf0.01 is 22 rounds (seeds 0-2,
# α=0.1, ε=1e-5); rounds past drain are identity (empty active set), so
# the 2× margin is pure safety — the kcore-round-count lesson applied.


def q_pagerank_nibble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRankNibble seed-set expansion (3 seeds, α=0.1, ε=1e-5) on
    the 256-node graph. The batch ACL push is deterministic (every
    active node of every seed pushes each round), so the oracle unrolls
    ``_NIBBLE_ROUNDS`` push rounds plus the full sweep-cut in SQL; the
    ε-invariant, mass conservation, and planted-community recovery are
    additionally pytest-gated in tests/test_scd.py."""
    from networkit_spark.operators.scd import PageRankNibble

    g = undirected_graph(spark, sf_dir, 256)
    nib = PageRankNibble(
        g, seeds=[0, 1, 2], alpha=0.1, epsilon=1e-5
    ).run()
    return nib.get_communities().select("seed", "id")


def q_pagerank_nibble_sql() -> str:
    rounds = []
    for k in range(1, _NIBBLE_ROUNDS + 1):
        p, c = f"st{k - 1}", f"st{k}"
        rounds.append(
            f"""act{k} AS (SELECT * FROM {p} WHERE r >= 1e-05 * v AND v > 0),
mass{k} AS (
  SELECT a.seed, s.dst AS id, sum(0.9 * a.r * s.weight / (2.0 * a.v)) AS dr
  FROM act{k} a JOIN sym s ON s.src = a.id GROUP BY 1, 2
),
upd{k} AS (
  SELECT seed, id,
         CASE WHEN r >= 1e-05 * v AND v > 0 THEN p + 0.1 * r ELSE p END AS p,
         CASE WHEN r >= 1e-05 * v AND v > 0 THEN 0.9 * r / 2.0 ELSE r END AS r,
         v
  FROM {p}
),
{c} AS MATERIALIZED (
  SELECT coalesce(u.seed, m.seed) AS seed, coalesce(u.id, m.id) AS id,
         coalesce(u.p, 0.0) AS p,
         coalesce(u.r, 0.0) + coalesce(m.dr, 0.0) AS r,
         coalesce(u.v, vl.vol, 0.0) AS v
  FROM upd{k} u
  FULL OUTER JOIN mass{k} m ON u.seed = m.seed AND u.id = m.id
  LEFT JOIN vol vl ON coalesce(u.id, m.id) = vl.id
)"""
        )
    last = f"st{_NIBBLE_ROUNDS}"
    body = ",\n".join(rounds)
    return f"""
WITH {_sql_undirected(256)},
vol AS MATERIALIZED (SELECT src AS id, sum(weight) AS vol FROM sym GROUP BY src),
st0 AS MATERIALIZED (
  SELECT s.seed, s.seed AS id, 0.0 AS p, 1.0 AS r,
         coalesce(vl.vol, 0.0) AS v
  FROM (SELECT unnest([0, 1, 2]) AS seed) s
  LEFT JOIN vol vl ON vl.id = s.seed
),
{body},
support AS (
  SELECT seed, id, v,
         CASE WHEN v > 0 THEN p / v ELSE 'NaN'::DOUBLE END AS score
  FROM {last}
),
ranked AS MATERIALIZED (
  SELECT seed, id, v,
         row_number() OVER (PARTITION BY seed ORDER BY score DESC, id ASC) AS rk
  FROM support
),
deltas AS (
  SELECT r1.seed, r1.rk,
         sum(CASE WHEN r2.rk IS NOT NULL AND r2.rk < r1.rk
                  THEN -s.weight ELSE s.weight END) AS d
  FROM sym s
  JOIN ranked r1 ON r1.id = s.src
  LEFT JOIN ranked r2 ON r2.seed = r1.seed AND r2.id = s.dst
  GROUP BY 1, 2
),
sweep AS (
  SELECT r.seed, r.id, r.rk,
         sum(coalesce(d.d, 0.0)) OVER (PARTITION BY r.seed ORDER BY r.rk) AS cut,
         sum(r.v) OVER (PARTITION BY r.seed ORDER BY r.rk) AS volp
  FROM ranked r LEFT JOIN deltas d ON d.seed = r.seed AND d.rk = r.rk
),
swept AS (
  SELECT seed, rk,
         CASE WHEN least(volp, (SELECT sum(vol) FROM vol) - volp) > 0
              THEN cut / least(volp, (SELECT sum(vol) FROM vol) - volp)
              ELSE 'NaN'::DOUBLE END AS cond
  FROM sweep WHERE rk < (SELECT count(*) FROM nodes)
),
best AS (
  SELECT seed, rk AS best_rk FROM (
    SELECT seed, rk,
           row_number() OVER (PARTITION BY seed ORDER BY cond ASC, rk ASC) AS rn
    FROM swept WHERE NOT isnan(cond)
  ) WHERE rn = 1
)
SELECT r.seed, r.id
FROM ranked r JOIN best b ON r.seed = b.seed AND r.rk <= b.best_rk
"""


_KATZ_IDX_L = 4
_KATZ_IDX_BETA = 0.01


def q_katz_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz link-prediction index (L=4, β=0.01) over the deterministic
    edge-pair sample on the 256-node graph. Per-length WALK counts are
    integers — hash-exact cross-engine; the damped sum folds them in
    the same left-associative order in both engines."""
    from networkit_spark.operators.linkprediction import katz_index_scores

    g = undirected_graph(spark, sf_dir, 256)
    pairs = (
        g.canonical()
        .where((F.col("src") + F.col("dst")) % 7 == 0)
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )
    out = katz_index_scores(
        g, pairs, max_path_length=_KATZ_IDX_L, damping=_KATZ_IDX_BETA
    )
    cols = [
        F.col("walks")[i].alias(f"w{i + 1}") for i in range(_KATZ_IDX_L)
    ]
    return out.select("u", "v", *cols, F.round("score", 9).alias("katz"))


def q_katz_index_sql() -> str:
    steps = [
        """s0 AS MATERIALIZED (
  SELECT DISTINCT u AS s FROM prs
),
k0 AS MATERIALIZED (SELECT s, s AS x, CAST(1 AS BIGINT) AS c FROM s0)"""
    ]
    for l in range(1, _KATZ_IDX_L + 1):
        steps.append(
            f"""k{l} AS MATERIALIZED (
  SELECT st.s, a.dst AS x, CAST(sum(st.c) AS BIGINT) AS c
  FROM k{l - 1} st JOIN adj a ON a.src = st.x
  GROUP BY st.s, a.dst
)"""
        )
    hit_joins = "\n".join(
        f"LEFT JOIN k{l} h{l} ON h{l}.s = p.u AND h{l}.x = p.v"
        for l in range(1, _KATZ_IDX_L + 1)
    )
    wcols = ", ".join(
        f"coalesce(h{l}.c, 0) AS w{l}" for l in range(1, _KATZ_IDX_L + 1)
    )
    score = " + ".join(
        f"CAST(coalesce(h{l}.c, 0) AS DOUBLE) * {_KATZ_IDX_BETA ** l!r}"
        for l in range(1, _KATZ_IDX_L + 1)
    )
    return f"""
WITH {_sql_undirected(256)},
adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym),
prs AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM edges WHERE (src + dst) % 7 = 0
),
{",".join(steps)}
SELECT p.u, p.v, {wcols}, round({score}, 9) AS katz
FROM prs p
{hit_joins}
"""


_MATCHING_ROUNDS = 20


def q_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalMaxMatcher on the thin graph. Deterministic under the
    documented (weight, src, dst) tie order, so the rounds unroll to
    SQL exactly like kcore/group_degree: per-round per-node best edge
    (row_number over the lexicographic order), agreement join, matched
    -node removal. Measured drain at sf0.01 is 17 rounds; unroll
    carries margin (rounds past drain are identity on empty frames)."""
    from networkit_spark.operators.matching import LocalMaxMatcher

    g = _thin_undirected_graph(spark, sf_dir)
    m = LocalMaxMatcher(g).run()
    return m.get_matching().select(
        "src", "dst", F.round("weight", 6).alias("weight")
    )


def q_matching_sql() -> str:
    steps = ["rem0 AS MATERIALIZED (SELECT src, dst, 1.0 AS w FROM eu)"]
    for k in range(1, _MATCHING_ROUNDS + 1):
        steps.append(
            f"""best{k} AS MATERIALIZED (
  SELECT id, s, t, w FROM (
    SELECT id, s, t, w,
           row_number() OVER (PARTITION BY id
                              ORDER BY w DESC, s DESC, t DESC) AS rn
    FROM (SELECT src AS id, src AS s, dst AS t, w FROM rem{k - 1}
          UNION ALL
          SELECT dst AS id, src AS s, dst AS t, w FROM rem{k - 1})
  ) WHERE rn = 1
),
agree{k} AS MATERIALIZED (
  SELECT r.src, r.dst, r.w FROM rem{k - 1} r
  JOIN best{k} bs ON bs.id = r.src AND bs.s = r.src AND bs.t = r.dst
  JOIN best{k} bd ON bd.id = r.dst AND bd.s = r.src AND bd.t = r.dst
),
rem{k} AS MATERIALIZED (
  SELECT r.src, r.dst, r.w FROM rem{k - 1} r
  WHERE r.src NOT IN (SELECT src FROM agree{k} UNION SELECT dst FROM agree{k})
    AND r.dst NOT IN (SELECT src FROM agree{k} UNION SELECT dst FROM agree{k})
)"""
        )
    unions = " UNION ALL ".join(
        f"SELECT src, dst, w FROM agree{k}"
        for k in range(1, _MATCHING_ROUNDS + 1)
    )
    return f"""
WITH {_SQL_THIN_UNDIRECTED},
{",".join(steps)}
SELECT src, dst, round(w, 6) AS weight FROM ({unions})
"""


def q_maximal_cliques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaximalCliques (join-based k-clique expansion + drop-one
    maximality) on the thin graph — one row per maximal clique
    (ascending members, comma-joined so the value hash is
    representation-stable) with its size. Oracle: id-ordered recursive
    enumeration in DuckDB carrying the common-neighborhood, maximal ⇔
    no common neighbor remains; additionally golden-gated against
    in-test brute force (tests/test_matching_cliques.py)."""
    from networkit_spark.operators.cliques import MaximalCliques

    g = _thin_undirected_graph(spark, sf_dir)
    mc = MaximalCliques(g).run()
    return mc.get_cliques().select(
        F.array_join(
            F.transform(F.array_sort("c"), lambda x: x.cast("string")), ","
        ).alias("members"),
        F.size("c").alias("k"),
    )


def q_maximal_cliques_sql() -> str:
    return f"""
WITH RECURSIVE {_SQL_THIN_UNDIRECTED},
nl AS MATERIALIZED (SELECT src, list(dst ORDER BY dst) AS ns FROM e GROUP BY src),
cliq AS (
  -- members strictly ascending ⇒ every clique is generated exactly once;
  -- ext = common neighbors of all members (any id), cand = ext ∩ (> last)
  SELECT [n.id] AS members,
         coalesce(nl.ns, CAST([] AS BIGINT[])) AS ext,
         list_filter(coalesce(nl.ns, CAST([] AS BIGINT[])), x -> x > n.id) AS cand
  FROM nodes n LEFT JOIN nl ON nl.src = n.id
  UNION ALL
  SELECT list_append(s.members, s.x) AS members,
         list_intersect(s.ext, nlx.ns) AS ext,
         list_filter(list_intersect(s.cand, nlx.ns), y -> y > s.x) AS cand
  FROM (
    SELECT c.members, c.ext, c.cand, unnest(c.cand) AS x FROM cliq c
  ) s JOIN nl nlx ON nlx.src = s.x
)
SELECT array_to_string(list_sort(members), ',') AS members,
       len(members) AS k
FROM cliq WHERE len(ext) = 0
"""


def q_kadabra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KADABRA adaptive (ε, δ)-betweenness (err=0.1, δ=0.1) on the thin
    undirected graph — ε-contract gate. The sampler is stochastic (no
    closed SQL form for its scores), so the gate hashes the CONTRACT
    frame instead: ``(id, exact, within_eps)`` where ``exact`` is the
    engine's exact Brandes pair-fraction bc(v)/(n(n-1)) and
    ``within_eps = |kadabra − exact| ≤ err``. The DuckDB twin
    recomputes ``exact`` independently (unrolled-Brandes SQL, the same
    oracle family as q_betweenness) and asserts TRUE — so a hash match
    verifies BOTH the exact scores and that every vertex honors the
    (ε, δ) guarantee (seeded sampler ⇒ deterministic realized errors on
    a fixed input). Caveat, by design: the KADABRA guarantee is
    PROBABILISTIC (holds with prob 1−δ, δ=0.1) — the all-TRUE oracle is
    sound only for THIS pinned seed/fixture pair. If the testdata is
    ever regenerated at a new scale factor, re-measure the realized max
    error before reading a mismatch here as an engine bug.
    Reference contract:
    include/networkit/centrality/KadabraBetweenness.hpp:81."""
    from networkit_spark import Betweenness
    from networkit_spark.operators.kadabra import KadabraBetweenness

    err = 0.1
    g = _thin_undirected_graph(spark, sf_dir)
    kb = KadabraBetweenness(
        g, err=err, delta=0.1, seed=11, diameter_hint=8,
        base_iters_per_step=512,
    ).run()
    n = g.number_of_nodes()
    exact = (
        Betweenness(g)
        .run()
        .scores()
        .select("id", (F.col("score") / F.lit(float(n * (n - 1)))).alias("ex"))
    )
    return (
        kb.scores()
        .join(exact, "id")
        .select(
            "id",
            F.round("ex", 6).alias("exact"),
            (F.abs(F.col("score") - F.col("ex")) <= F.lit(err)).alias(
                "within_eps"
            ),
        )
    )


def q_kadabra_sql() -> str:
    return _brandes_sql(
        _SQL_THIN_UNDIRECTED,
        """SELECT n.id AS id,
       round(coalesce(t.sc, 0.0)
             / ((SELECT count(*) FROM nodes)
                * ((SELECT count(*) FROM nodes) - 1)), 6) AS exact,
       TRUE AS within_eps
FROM nodes n LEFT JOIN bc t USING (id)""",
        # the thin graph's diameter varies with sf (4 at sf0.01, 19 at
        # sf0.001); 20 covers both with empty near-free tail levels
        hops=20,
    )


def q_biconnected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Biconnected components (Tarjan–Vishkin over the BFS forest) on
    the thinned undirected graph — per-edge block labels, relabeled
    canonically (block = min canonical edge id ``u * V_TINY + v`` over
    the block's edges) so the label is independent of the engine's
    spanning-tree choice. Hash-gated against a DuckDB oracle built on
    the textbook characterization: edges {w,a} and {w,b} share a block
    iff a and b are connected in G − w (the cycle w-a-…-b-w); the
    transitive closure over shared vertices is the block partition
    (cpp/components/BiconnectedComponents.cpp:36-127 computes the same
    partition via DFS low-points). Additionally golden-gated: pytest
    compares partitions against a sequential Tarjan on fixed and
    random graphs (tests/test_biconnected.py)."""
    from networkit_spark.operators.biconnected import BiconnectedComponents

    g = _thin_undirected_graph(spark, sf_dir)
    bc = BiconnectedComponents(g).run()
    ec = bc.edge_components()
    canon = ec.groupBy("block").agg(
        F.min(F.col("u") * V_TINY + F.col("v")).alias("cblock")
    )
    return ec.join(canon, "block").select(
        "u", "v", F.col("cblock").alias("block")
    )


_BICON_W_ROUNDS = 20  # per-w hash-min rounds ≥ max diameter of G−w —
# pinned to the SAME 20-hop budget as the kadabra Brandes twin (whose
# sf0.001 thin-family graph measured diameter 19), not the empirical 14
# that convergence at sf0.001/sf0.01 happened to need: a slightly
# different fixture shape must not leave wlab unconverged (round 4
# advice). Labels converge well inside the budget on both gate SFs —
# a scripts-level prototype matched a sequential Tarjan exactly; a
# non-converged unroll shows as a visible hash MISMATCH, never a pass.
_BICON_E_ROUNDS = 16  # edge-graph hash-min rounds ≥ max block diameter
# (measured ≤ 12; +4 margin for the same fixture-drift reason)


def q_biconnected_sql() -> str:
    """DuckDB twin of the block partition: (1) hash-min CC of G − w for
    every vertex w simultaneously (state keyed by w), (2) base pairs —
    canonical edge ids {w,a},{w,b} with a,b co-labeled in G − w, (3)
    hash-min over the edge graph; min edge id per component IS the
    canonical block label. Bridges never pair and keep their own id."""
    C = V_TINY
    wsteps = [
        """wlab0 AS MATERIALIZED (
  SELECT n.id AS w, v.id AS id, v.id AS label
  FROM nodes n JOIN nodes v ON v.id <> n.id
)"""
    ]
    for k in range(1, _BICON_W_ROUNDS + 1):
        wsteps.append(
            f"""wlab{k} AS MATERIALIZED (
  SELECT l.w, l.id, least(l.label, coalesce(m.ml, l.label)) AS label
  FROM wlab{k - 1} l LEFT JOIN (
    SELECT l2.w, s.dst AS id, min(l2.label) AS ml
    FROM wlab{k - 1} l2 JOIN e s ON s.src = l2.id
    WHERE s.dst <> l2.w
    GROUP BY l2.w, s.dst
  ) m ON m.w = l.w AND m.id = l.id
)"""
        )
    WR = _BICON_W_ROUNDS
    esteps = ["elab0 AS (SELECT eid, eid AS label FROM eids)"]
    for k in range(1, _BICON_E_ROUNDS + 1):
        esteps.append(
            f"""elab{k} AS MATERIALIZED (
  SELECT l.eid, least(l.label, coalesce(m.ml, l.label)) AS label
  FROM elab{k - 1} l LEFT JOIN (
    SELECT s.b AS eid, min(l2.label) AS ml
    FROM esym s JOIN elab{k - 1} l2 ON l2.eid = s.a GROUP BY s.b
  ) m USING (eid)
)"""
        )
    return f"""
WITH {_SQL_THIN_UNDIRECTED},
{",".join(wsteps)},
inc AS MATERIALIZED (
  SELECT src AS w, dst AS other, src * {C} + dst AS eid FROM eu
  UNION ALL
  SELECT dst AS w, src AS other, src * {C} + dst AS eid FROM eu
),
epairs AS MATERIALIZED (
  SELECT i1.eid AS a, i2.eid AS b
  FROM inc i1
  JOIN wlab{WR} la ON la.w = i1.w AND la.id = i1.other
  JOIN inc i2 ON i2.w = i1.w AND i2.eid > i1.eid
  JOIN wlab{WR} lb ON lb.w = i1.w AND lb.id = i2.other
  WHERE la.label = lb.label
),
esym AS MATERIALIZED (
  SELECT a, b FROM epairs UNION ALL SELECT b AS a, a AS b FROM epairs
),
eids AS (SELECT DISTINCT src * {C} + dst AS eid FROM eu),
{",".join(esteps)}
SELECT eid // {C} AS u, eid % {C} AS v, label AS block
FROM elab{_BICON_E_ROUNDS}
"""


_N2V = dict(p=0.5, q=2.0, walk_length=6, walks_per_node=2, dim=8,
            window=3, seed=7)


def q_node2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node2Vec (p=0.5, q=2.0) — FULLY hash-gated in portable mode.
    Every random draw is an md5-prefix hash, the race keys
    ``−ln(u)/bias`` have dyadic biases (weights are integer
    multiplicities; p, q dyadic) and dyadic-rational u, co-occurrence
    counts and PPMI inputs are exact integers, and the Rademacher
    projection sums 1e-6-lattice integers (< 2^53 ⇒ exact in any
    order) — so the gate frame ``(id, d, lane)`` is ALL-INTEGER and
    DuckDB re-derives the entire pipeline (walk unroll → window
    co-occurrence → PPMI → signed lane sums) value-for-value. The only
    float comparisons left are strict inequalities between continuous
    race keys / log args, where a cross-engine ulp flip has measure
    ~1e-13 per comparison. Walk validity / determinism / finiteness
    are additionally pytest-gated (tests/test_node2vec.py). Reference
    contract: cpp/embedding/Node2Vec.cpp:36-62."""
    from networkit_spark.operators.node2vec import Node2Vec

    g = undirected_graph(spark, sf_dir)
    n2v = Node2Vec(g, portable=True, **_N2V).run()
    return n2v.projection_lanes().select("id", "d", "lane")


def q_node2vec_sql() -> str:
    p, q = _N2V["p"], _N2V["q"]
    L, wpn = _N2V["walk_length"], _N2V["walks_per_node"]
    dim, win, seed = _N2V["dim"], _N2V["window"], _N2V["seed"]

    def md5u(tag: str, parts: str) -> str:
        return (
            f"(CAST(('0x' || substr(md5('{tag}:' || {parts}), 1, 8)) "
            "AS BIGINT))"
        )

    steps = [
        f"""st0 AS MATERIALIZED (
  SELECT n.id * {wpn} + r.range AS walk_id,
         CAST(NULL AS BIGINT) AS prev, n.id AS cur
  FROM nodes n, range({wpn}) r
),
em0 AS (SELECT walk_id, 0 AS pos, cur AS node FROM st0)"""
    ]
    for k in range(1, L):
        if k == 1:
            bias = "1.0"
            nbjoin = ""
        else:
            bias = (
                f"CASE WHEN c.x = c.prev THEN c.weight / {p} "
                "WHEN nb.is_nbr THEN c.weight "
                f"ELSE c.weight / {q} END"
            )
            nbjoin = (
                "LEFT JOIN (SELECT src AS prev, dst AS x, TRUE AS is_nbr "
                "FROM sym) nb ON nb.prev = c.prev AND nb.x = c.x"
            )
        u = md5u(f"n2v{seed}", f"c.walk_id || ':' || {k} || ':' || c.x")
        steps.append(
            f"""st{k} AS MATERIALIZED (
  SELECT walk_id, cur AS prev, x AS cur FROM (
    SELECT c.walk_id, c.cur, c.x,
           row_number() OVER (
             PARTITION BY c.walk_id
             ORDER BY -ln(({u} + 1.0) / 4294967296.0) / ({bias}) ASC,
                      c.x ASC
           ) AS rn
    FROM (
      SELECT s.walk_id, s.prev, s.cur, e.dst AS x, e.weight
      FROM st{k - 1} s JOIN sym e ON e.src = s.cur
    ) c
    {nbjoin}
  ) WHERE rn = 1
),
em{k} AS (SELECT walk_id, {k} AS pos, cur AS node FROM st{k})"""
        )
    walk_union = "\n  UNION ALL\n".join(
        f"  SELECT * FROM em{k}" for k in range(L)
    )
    sign = md5u(f"n2vsign{seed}", "pp.w || ':' || dd.range")
    return f"""
WITH {_sql_undirected(V_SMALL)},
{",".join(steps)},
walks AS MATERIALIZED (
{walk_union}
),
co AS MATERIALIZED (
  SELECT a.node AS u, b.node AS w, CAST(count(*) AS DOUBLE) AS n_uw
  FROM walks a JOIN walks b ON b.walk_id = a.walk_id
  WHERE a.pos <> b.pos AND abs(a.pos - b.pos) <= {win}
  GROUP BY 1, 2
),
tot AS (SELECT sum(n_uw) AS t FROM co),
nu AS (SELECT u, sum(n_uw) AS n_u FROM co GROUP BY u),
nw AS (SELECT w, sum(n_uw) AS n_w FROM co GROUP BY w),
ppmi AS MATERIALIZED (
  SELECT co.u, co.w,
         greatest(0.0, ln(co.n_uw * tot.t / (nu.n_u * nw.n_w))) AS ppmi
  FROM co JOIN nu USING (u) JOIN nw USING (w), tot
  WHERE ln(co.n_uw * tot.t / (nu.n_u * nw.n_w)) > 0
),
lanes AS MATERIALIZED (
  SELECT pp.u AS id, CAST(dd.range AS INT) AS d,
         CAST(sum(floor(pp.ppmi * 1e6 + 0.5)
                  * (CASE WHEN {sign} % 2 = 0 THEN 1.0 ELSE -1.0 END))
              AS BIGINT) AS lane
  FROM ppmi pp, range({dim}) dd
  GROUP BY 1, 2
)
SELECT n.id AS id, CAST(dd.range AS INT) AS d,
       coalesce(l.lane, 0) AS lane
FROM nodes n
CROSS JOIN range({dim}) dd
LEFT JOIN lanes l ON l.id = n.id AND l.d = CAST(dd.range AS INT)
"""


_KPATH_K = 4
_KPATH_T = 8000
_KPATH_Z = 6.0  # realized max z measured 2.4-3.4 at sf0.001/sf0.01 for
# t∈{2000,8000}; 6 gives ~1.75× margin while |dev| > tol would still
# catch any sampling-measure bug many σ out


def q_kpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPathCentrality (seeded self-avoiding-walk sampler, k=4,
    t=8000) on the thin undirected graph — ε-contract gate, same
    pattern as q_kadabra. The estimator has no closed SQL form, but
    its EXPECTATION does: ``E[score(v)] = Σ_paths P(path)·(k−d+1)``
    over self-avoiding walks (``exact_kpath_expectation``, a
    distributed exhaustive enumeration). The gate frame is
    ``(id, exact, within_tol)`` with
    ``within_tol = |est − exact| ≤ Z·√((exact+1)·k·n/t)`` (the
    estimator's Poisson-scale std, Z=6). The DuckDB twin re-derives
    ``exact`` via an independent recursive-CTE path enumeration and
    asserts TRUE — a hash match verifies both the closed-form
    expectation and that the seeded sampler's realized error sits at
    its statistical scale. Reference measure:
    cpp/centrality/KPathCentrality.cpp:18-103."""
    from networkit_spark.operators.kpath import (
        KPathCentrality,
        exact_kpath_expectation,
    )

    g = _thin_undirected_graph(spark, sf_dir)
    n = g.number_of_nodes()
    kp = KPathCentrality(g, k=_KPATH_K, num_walks=_KPATH_T, seed=42).run()
    ex = exact_kpath_expectation(g, _KPATH_K)
    tol = F.lit(_KPATH_Z) * F.sqrt(
        (F.col("exact") + F.lit(1.0))
        * F.lit(float(_KPATH_K) * n / _KPATH_T)
    )
    return (
        kp.scores()
        .join(ex, "id")
        .select(
            "id",
            F.round("exact", 6).alias("exact"),
            (F.abs(F.col("score") - F.col("exact")) <= tol).alias(
                "within_tol"
            ),
        )
    )


def q_kpath_sql() -> str:
    K = _KPATH_K
    return f"""
WITH RECURSIVE {_SQL_THIN_UNDIRECTED},
nl AS MATERIALIZED (SELECT src, list(dst ORDER BY dst) AS ns FROM e GROUP BY src),
saw (s, cur, visited, depth, prob) AS (
  SELECT id AS s, id AS cur, [id] AS visited, 0 AS depth,
         CAST(1.0 AS DOUBLE) AS prob FROM nodes
  UNION ALL
  SELECT s, x AS cur, list_append(visited, x) AS visited,
         depth + 1 AS depth, prob / nc AS prob
  FROM (
    SELECT w.s, w.visited, w.depth, w.prob,
           len(list_filter(nl.ns, y -> NOT list_contains(w.visited, y))) AS nc,
           unnest(list_filter(nl.ns, y -> NOT list_contains(w.visited, y))) AS x
    FROM saw w JOIN nl ON nl.src = w.cur
    WHERE w.depth < {K}
  )
),
ex AS (
  SELECT cur AS id, sum(prob * ({K} - depth + 1)) AS exact
  FROM saw WHERE depth > 0 GROUP BY cur
)
SELECT n.id AS id, round(coalesce(ex.exact, 0.0), 6) AS exact,
       TRUE AS within_tol
FROM nodes n LEFT JOIN ex USING (id)
"""


_GROUP_DEGREE_K = 4


def q_group_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupDegree greedy selection (k=4). Oracle: the greedy argmax
    chain is deterministic (exact gains, ties to smallest id —
    operators/group.py docstring), so the k rounds unroll to SQL the
    same way kcore/katz do: each round is one pick CTE (argmax of
    nbr_gain − covered-penalty over the not-yet-picked candidates) plus
    one coverage CTE."""
    from networkit_spark.operators.group import GroupDegree

    g = undirected_graph(spark, sf_dir)
    gd = GroupDegree(g, k=_GROUP_DEGREE_K).run()
    rows = [(int(u), i) for i, u in enumerate(gd.group_max_degree())]
    return spark.createDataFrame(rows, "id long, pick_order int")


def q_group_degree_sql() -> str:
    steps = [
        """p1 AS MATERIALIZED (
  SELECT id FROM (
    SELECT n.id, coalesce(x.g, 0) AS gain
    FROM nodes n LEFT JOIN (
      SELECT src AS id, count(*) AS g FROM adj GROUP BY src) x USING (id)
  ) ORDER BY gain DESC, id ASC LIMIT 1
),
cov1 AS MATERIALIZED (
  SELECT dst AS id FROM adj WHERE src = (SELECT id FROM p1)
  UNION SELECT id FROM p1
)"""
    ]
    for i in range(2, _GROUP_DEGREE_K + 1):
        picked = " UNION ALL ".join(
            f"SELECT id FROM p{j}" for j in range(1, i)
        )
        steps.append(
            f"""p{i} AS MATERIALIZED (
  SELECT id FROM (
    SELECT n.id,
           coalesce(x.g, 0)
           - (CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END) AS gain
    FROM nodes n
    LEFT JOIN (
      SELECT a.src AS id, count(*) AS g
      FROM adj a LEFT JOIN cov{i - 1} cc ON cc.id = a.dst
      WHERE cc.id IS NULL GROUP BY a.src) x USING (id)
    LEFT JOIN cov{i - 1} c ON c.id = n.id
    WHERE n.id NOT IN ({picked})
  ) ORDER BY gain DESC, id ASC LIMIT 1
),
cov{i} AS MATERIALIZED (
  SELECT id FROM cov{i - 1}
  UNION SELECT dst AS id FROM adj WHERE src = (SELECT id FROM p{i})
  UNION SELECT id FROM p{i}
)"""
        )
    out = " UNION ALL ".join(
        f"SELECT id, CAST({j - 1} AS INTEGER) AS pick_order FROM p{j}"
        for j in range(1, _GROUP_DEGREE_K + 1)
    )
    return f"""
WITH {_sql_undirected(V_SMALL)},
adj AS MATERIALIZED (SELECT src, dst FROM sym),
{",".join(steps)}
{out}
"""


_GC_K = 4  # group-closeness greedy rounds in the merged group query


def q_group_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged group-centrality gate: GroupDegree (k=4, V_SMALL graph)
    and GroupCloseness (k=4, thin 256-node graph) as
    ``(method, id, pick_order)`` rows. Both greedy chains are
    deterministic (exact gains, ties to smallest id), so both unroll to
    SQL: GroupDegree as before; GroupCloseness from a full
    recursive-CTE APSP — pick 1 is the top (generalized) closeness
    node, then each round picks argmax of
    ``Σ_v max(0, d[v] − dist(u, v))`` over the reference-filtered
    candidates (``GroupCloseness.cpp:183-184``) and relaxes the
    distance field (sentinel n for unreached, matching the operator's
    documented divergence)."""
    from networkit_spark.operators.group import GroupCloseness, GroupDegree

    g = undirected_graph(spark, sf_dir)
    gd = GroupDegree(g, k=_GROUP_DEGREE_K).run()
    tg = _thin_undirected_graph(spark, sf_dir)
    gc = GroupCloseness(tg, k=_GC_K).run()
    rows = [
        ("degree", int(u), i) for i, u in enumerate(gd.group_max_degree())
    ] + [
        ("closeness", int(u), i)
        for i, u in enumerate(gc.group_max_closeness())
    ]
    return spark.createDataFrame(
        rows, "method string, id long, pick_order int"
    )


def _group_closeness_parts() -> tuple[str, str]:
    rounds = []
    for i in range(2, _GC_K + 1):
        picked = " UNION ALL ".join(
            f"SELECT id FROM gp{j}" for j in range(1, i)
        )
        rounds.append(
            f"""gc{i} AS (
  SELECT dd.id FROM gd{i - 1} dd JOIN cdeg USING (id)
  WHERE cdeg.dg > 1 AND dd.d > 0 AND NOT (dd.d = 1 AND cdeg.dg = 2)
    AND dd.id NOT IN ({picked})
),
gimp{i} AS (
  SELECT c.id AS u, sum(dd.d - t.d) AS imp
  FROM gc{i} c
  JOIN cdist t ON t.s = c.id
  JOIN gd{i - 1} dd ON dd.id = t.v
  WHERE t.d < dd.d
  GROUP BY c.id
),
gp{i} AS MATERIALIZED (
  SELECT u AS id FROM gimp{i} ORDER BY imp DESC, u ASC LIMIT 1
),
gd{i} AS MATERIALIZED (
  SELECT dd.id, least(dd.d, coalesce(t.d, dd.d)) AS d
  FROM gd{i - 1} dd
  LEFT JOIN cdist t
    ON t.s = (SELECT id FROM gp{i}) AND t.v = dd.id
)"""
        )
    out = " UNION ALL ".join(
        f"SELECT 'closeness' AS method, id, CAST({j - 1} AS INTEGER)"
        f" AS pick_order FROM gp{j}"
        for j in range(1, _GC_K + 1)
    )
    ctes = f"""{_SQL_THIN_UNDIRECTED},
cwalk (s, v, d) AS (
  SELECT id AS s, id AS v, 0 FROM nodes
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM cwalk w JOIN e ON e.src = w.v
  WHERE w.d < {_BC_HOPS + 2}
),
cdist AS MATERIALIZED (SELECT s, v, min(d) AS d FROM cwalk GROUP BY s, v),
cnn AS (SELECT count(*) AS n FROM nodes),
cdeg AS (SELECT src AS id, count(*) AS dg FROM e GROUP BY src),
cclo AS (
  SELECT s AS id,
         CASE WHEN sum(d) > 0
              THEN (count(*) - 1.0) / sum(d) / ((SELECT n FROM cnn) - 1.0)
              ELSE 0.0 END AS score
  FROM cdist GROUP BY s
),
gp1 AS MATERIALIZED (
  SELECT id FROM cclo ORDER BY score DESC, id ASC LIMIT 1
),
gd1 AS MATERIALIZED (
  SELECT nd.id, coalesce(t.d, (SELECT n FROM cnn)) AS d
  FROM nodes nd
  LEFT JOIN cdist t ON t.s = (SELECT id FROM gp1) AND t.v = nd.id
),
{",".join(rounds)}"""
    return ctes, out


def q_group_selection_sql() -> str:
    ctes, out = _group_closeness_parts()
    # the standalone group-degree SQL (its own nested WITH) becomes a
    # subquery emitting the method column
    # the inner query's top-level UNION ALL must be wrapped in a
    # subselect: under WITH RECURSIVE, DuckDB mis-binds a CTE body of
    # the form `WITH ... SELECT ... UNION ALL ...` (the nested CTEs
    # vanish from the union's scope)
    return f"""
WITH RECURSIVE gdq AS (
SELECT * FROM (
{q_group_degree_sql()}
)
),
{ctes.lstrip()}
SELECT 'degree' AS method, id, pick_order FROM gdq
UNION ALL
{out}
"""


def q_missing_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MissingLinksFinder.findAtDistance(2): non-adjacent pairs with at
    least one common neighbor (exact distance 2), u < v."""
    from networkit_spark.operators.linkprediction import missing_links_at_distance

    g = undirected_graph(spark, sf_dir, 256)
    return missing_links_at_distance(g, 2)


def q_missing_links_sql() -> str:
    return f"""
WITH {_sql_undirected(256)},
adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym),
two_hop AS (
  SELECT DISTINCT a1.src AS u, a2.dst AS v
  FROM adj a1 JOIN adj a2 ON a2.src = a1.dst
  WHERE a1.src < a2.dst
)
SELECT t.u, t.v FROM two_hop t
LEFT JOIN adj e ON e.src = t.u AND e.dst = t.v
WHERE e.src IS NULL
"""


V_TINY = 256  # node-space for the transitive-closure-oracle (SCC) query


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components (trim + FW-BW) on a 256-node
    directed graph; oracle = mutual transitive closure."""
    from networkit_spark.operators.scc import StronglyConnectedComponents

    g = directed_graph(spark, sf_dir, V_TINY)
    scc = StronglyConnectedComponents(g).run()
    return scc.get_partition().select("id", "label")


def q_scc_sql() -> str:
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT l_orderkey % {V_TINY} AS src, l_partkey % {V_TINY} AS dst
  FROM lineitem
),
nodes AS (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM e UNION SELECT dst AS id FROM e
  )
),
reach (a, b) AS (
  SELECT id AS a, id AS b FROM nodes
  UNION
  SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b
),
r2 AS MATERIALIZED (SELECT a, b FROM reach)
SELECT f.a AS id, min(f.b) AS label
FROM r2 f JOIN r2 g ON g.a = f.b AND g.b = f.a
GROUP BY f.a
"""


_BC_HOPS = 7  # ≥ diameter of the thinned 256-node graphs (measured 6/4)


def _thin_directed_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Sparse 256-node directed graph (~1.5k edges at sf0.01) for the
    cubic-ish distance-family oracles: lineitem thinned to
    ``l_linenumber = 1 AND l_quantity < 10``."""

    def build() -> Graph:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        edges = (
            li.where((F.col("l_linenumber") == 1) & (F.col("l_quantity") < 10))
            .select(
                (F.col("l_orderkey") % V_TINY).alias("src"),
                (F.col("l_partkey") % V_TINY).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .withColumn("weight", F.lit(1.0))
            .localCheckpoint()
        )
        return Graph(edges, directed=True, weighted=False)

    return _memo(spark, ("thin_dir", sf_dir), build)


def _thin_undirected_graph(spark: SparkSession, sf_dir: str) -> Graph:
    def build() -> Graph:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        edges = (
            li.where((F.col("l_linenumber") == 1) & (F.col("l_quantity") < 10))
            .select(
                (F.col("l_orderkey") % V_TINY).alias("a"),
                (F.col("l_partkey") % V_TINY).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
            .distinct()
            .withColumn("weight", F.lit(1.0))
            .localCheckpoint()
        )
        return Graph(edges, directed=False, weighted=False)

    return _memo(spark, ("thin_undir", sf_dir), build)


_SQL_THIN_DIRECTED = f"""
e AS (
  SELECT DISTINCT l_orderkey % {V_TINY} AS src, l_partkey % {V_TINY} AS dst
  FROM lineitem
  WHERE l_linenumber = 1 AND l_quantity < 10
    AND l_orderkey % {V_TINY} <> l_partkey % {V_TINY}
),
nodes AS (
  SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION SELECT dst FROM e)
)"""

_SQL_THIN_UNDIRECTED = f"""
eu AS (
  SELECT DISTINCT least(l_orderkey % {V_TINY}, l_partkey % {V_TINY}) AS src,
         greatest(l_orderkey % {V_TINY}, l_partkey % {V_TINY}) AS dst
  FROM lineitem
  WHERE l_linenumber = 1 AND l_quantity < 10
    AND l_orderkey % {V_TINY} <> l_partkey % {V_TINY}
),
e AS (SELECT src, dst FROM eu UNION ALL SELECT dst, src FROM eu),
nodes AS (
  SELECT DISTINCT id FROM (SELECT src AS id FROM eu UNION SELECT dst FROM eu)
)"""


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Brandes betweenness (directed, unnormalized) on the thinned
    256-node graph; reference scaling (no halving, Betweenness.cpp)."""
    from networkit_spark import Betweenness

    g = _thin_directed_graph(spark, sf_dir)
    bc = Betweenness(g).run()
    return bc.scores().select("id", F.round("score", 6).alias("score"))


def _brandes_sql(preamble: str, final_select: str, hops: int | None = None) -> str:
    """Brandes unrolled by BFS level over whichever ``e``/``nodes`` the
    ``preamble`` defines: dist via recursive CTE, per-level path counts
    sigma forward, dependency deltas backward — exactly the
    batched-layer construction the Spark operator uses.
    ``final_select`` consumes ``nodes`` and ``bc(id, sc)``. ``hops``
    overrides the unroll depth (must be ≥ the graph diameter; levels
    past the true depth are empty and near-free)."""
    H = hops if hops is not None else _BC_HOPS
    # MATERIALIZED: DuckDB inlines CTEs by default, so each unrolled
    # level would re-run the recursive dist walk — hint forces one pass
    lvls = []
    for k in range(1, H + 1):
        lvls.append(
            f"""lvl{k} AS MATERIALIZED (
  SELECT p.s AS s, e.dst AS v, CAST(sum(p.sig) AS DOUBLE) AS sig
  FROM lvl{k - 1} p
  JOIN e ON e.src = p.v
  JOIN dist dv ON dv.s = p.s AND dv.v = e.dst AND dv.d = {k}
  GROUP BY p.s, e.dst
)"""
        )
    dels = [
        f"del{H} AS (SELECT s, v, sig, CAST(0 AS DOUBLE) AS delta FROM lvl{H})"
    ]
    for k in range(H - 1, 0, -1):
        dels.append(
            f"""del{k} AS MATERIALIZED (
  SELECT l.s AS s, l.v AS v, any_value(l.sig) AS sig,
         coalesce(sum(l.sig / u.sig * (1.0 + u.delta)), 0.0) AS delta
  FROM lvl{k} l
  LEFT JOIN e ON e.src = l.v
  LEFT JOIN del{k + 1} u ON u.s = l.s AND u.v = e.dst
  GROUP BY l.s, l.v
)"""
        )
    union = "\n  UNION ALL\n".join(
        f"  SELECT s, v, delta FROM del{k}" for k in range(1, H + 1)
    )
    return f"""
WITH RECURSIVE {preamble},
walk (s, v, d) AS (
  SELECT id AS s, id AS v, 0 FROM nodes
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.v WHERE w.d < {H}
),
dist AS MATERIALIZED (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),
lvl0 AS (SELECT id AS s, id AS v, CAST(1 AS DOUBLE) AS sig FROM nodes),
{",".join(lvls)},
{",".join(dels)},
alldel AS (
{union}
),
bc AS (SELECT v AS id, sum(delta) AS sc FROM alldel GROUP BY v)
{final_select}
"""


def q_betweenness_sql() -> str:
    return _brandes_sql(
        _SQL_THIN_DIRECTED,
        """SELECT n.id AS id, round(coalesce(t.sc, 0.0), 6) AS score
FROM nodes n LEFT JOIN bc t USING (id)""",
    )


def q_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard closeness (1/Σd, Closeness.hpp:78-93) on the connected
    thinned undirected graph."""
    from networkit_spark import Closeness

    g = _thin_undirected_graph(spark, sf_dir)
    c = Closeness(g, variant="standard", check_connectedness=False).run()
    return c.scores().select("id", F.round("score", 8).alias("score"))


def q_closeness_sql() -> str:
    return f"""
WITH RECURSIVE {_SQL_THIN_UNDIRECTED},
walk (s, v, d) AS (
  SELECT id AS s, id AS v, 0 FROM nodes
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.v WHERE w.d < {_BC_HOPS}
),
dist AS MATERIALIZED (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),
sums AS (SELECT s, sum(d) AS sd FROM dist WHERE d > 0 GROUP BY s)
SELECT n.id AS id,
       round(CASE WHEN coalesce(m.sd, 0) > 0 THEN 1.0 / m.sd ELSE 0.0 END, 8)
         AS score
FROM nodes n LEFT JOIN sums m ON m.s = n.id
"""


def q_harmonic_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness Σ 1/d (HarmonicCloseness.cpp:36-44)."""
    from networkit_spark import HarmonicCloseness

    g = _thin_undirected_graph(spark, sf_dir)
    h = HarmonicCloseness(g).run()
    return h.scores().select("id", F.round("score", 6).alias("score"))


def q_harmonic_closeness_sql() -> str:
    return f"""
WITH RECURSIVE {_SQL_THIN_UNDIRECTED},
walk (s, v, d) AS (
  SELECT id AS s, id AS v, 0 FROM nodes
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.v WHERE w.d < {_BC_HOPS}
),
dist AS MATERIALIZED (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),
sums AS (SELECT s, sum(1.0 / d) AS h FROM dist WHERE d > 0 GROUP BY s)
SELECT n.id AS id, round(coalesce(m.h, 0.0), 6) AS score
FROM nodes n LEFT JOIN sums m ON m.s = n.id
"""


def q_estimate_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled Brandes (EstimateBetweenness.cpp semantics): explicit
    deterministic source set (ids ≡ 0 mod 5), scores extrapolated by
    2n/k — the oracle replicates the identical restricted accumulation
    and scale."""
    from networkit_spark import EstimateBetweenness

    g = _thin_directed_graph(spark, sf_dir)
    srcs = g.vertices.where(F.col("id") % 5 == 0)
    bc = EstimateBetweenness(g, sources=srcs).run()
    return bc.scores().select("id", F.round("score", 6).alias("score"))


def q_estimate_betweenness_sql() -> str:
    """Same unrolled layered Brandes as q_betweenness_sql but with lvl0
    restricted to the sampled sources and the 2n/k extrapolation."""
    H = _BC_HOPS
    lvls = []
    for k in range(1, H + 1):
        lvls.append(
            f"""lvl{k} AS MATERIALIZED (
  SELECT p.s AS s, e.dst AS v, CAST(sum(p.sig) AS DOUBLE) AS sig
  FROM lvl{k - 1} p
  JOIN e ON e.src = p.v
  JOIN dist dv ON dv.s = p.s AND dv.v = e.dst AND dv.d = {k}
  GROUP BY p.s, e.dst
)"""
        )
    dels = [
        f"del{H} AS (SELECT s, v, sig, CAST(0 AS DOUBLE) AS delta FROM lvl{H})"
    ]
    for k in range(H - 1, 0, -1):
        dels.append(
            f"""del{k} AS MATERIALIZED (
  SELECT l.s AS s, l.v AS v, any_value(l.sig) AS sig,
         coalesce(sum(l.sig / u.sig * (1.0 + u.delta)), 0.0) AS delta
  FROM lvl{k} l
  LEFT JOIN e ON e.src = l.v
  LEFT JOIN del{k + 1} u ON u.s = l.s AND u.v = e.dst
  GROUP BY l.s, l.v
)"""
        )
    union = "\n  UNION ALL\n".join(
        f"  SELECT s, v, delta FROM del{k}" for k in range(1, H + 1)
    )
    return f"""
WITH RECURSIVE {_SQL_THIN_DIRECTED},
srcs AS (SELECT id FROM nodes WHERE id % 5 = 0),
walk (s, v, d) AS (
  SELECT id AS s, id AS v, 0 FROM srcs
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.v WHERE w.d < {H}
),
dist AS MATERIALIZED (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),
lvl0 AS (SELECT id AS s, id AS v, CAST(1 AS DOUBLE) AS sig FROM srcs),
{",".join(lvls)},
{",".join(dels)},
alldel AS (
{union}
)
SELECT n.id AS id,
       round(coalesce(t.sc, 0.0)
             * 2.0 * (SELECT count(*) FROM nodes)
             / (SELECT count(*) FROM srcs), 6) AS score
FROM nodes n
LEFT JOIN (SELECT v AS id, sum(delta) AS sc FROM alldel GROUP BY v) t USING (id)
"""


def q_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact diameter (Diameter.cpp DiameterAlgo.EXACT contract) on the
    thinned undirected graph via batched all-source BFS."""
    from networkit_spark.operators.distance import Diameter

    g = _thin_undirected_graph(spark, sf_dir)
    lo, hi = Diameter(g, algo="exact").run().get_diameter()
    return spark.createDataFrame([(lo, hi)], "lower long, upper long")


def q_diameter_sql() -> str:
    return f"""
WITH RECURSIVE {_SQL_THIN_UNDIRECTED},
walk (s, v, d) AS (
  SELECT id AS s, id AS v, 0 FROM nodes
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.v WHERE w.d < {_BC_HOPS + 2}
),
dist AS MATERIALIZED (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v)
SELECT max(d) AS lower, max(d) AS upper FROM dist
"""


def q_top_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TopHarmonicCloseness top-10 with the (score desc, id asc) ranking
    tie rule (TopHarmonicCloseness.cpp / Centrality.cpp:33-38)."""
    from networkit_spark import TopHarmonicCloseness

    g = _thin_undirected_graph(spark, sf_dir)
    tc = TopHarmonicCloseness(g, k=10).run()
    return tc.topk().select("id", F.round("score", 6).alias("score"))


def q_top_closeness_sql() -> str:
    return f"""
WITH RECURSIVE {_SQL_THIN_UNDIRECTED},
walk (s, v, d) AS (
  SELECT id AS s, id AS v, 0 FROM nodes
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.v WHERE w.d < {_BC_HOPS}
),
dist AS MATERIALIZED (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),
sums AS (SELECT s, sum(1.0 / d) AS h FROM dist WHERE d > 0 GROUP BY s)
SELECT id, score FROM (
  SELECT n.id AS id, round(coalesce(m.h, 0.0), 6) AS score
  FROM nodes n LEFT JOIN sums m ON m.s = n.id
) ORDER BY score DESC, id ASC LIMIT 10
"""


# Interchange path for the PLM oracle: the produced partition is
# written here (parquet) so DuckDB can recompute its modularity
# independently. Lives inside the repo (gitignored) per sandbox rules.
_PLM_PART_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".interchange", "plm_partition"
)


def q_plm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PLM (parallel Louvain). The *partition* is oracle-hostile (a
    multi-level local-moving fixpoint has no closed SQL form), but its
    **modularity** is not: the query writes the produced partition to a
    parquet interchange file and returns the Spark-computed modularity
    scalar; the oracle re-reads that same partition in DuckDB and
    recomputes modularity from the raw lineitem parquet with
    independent arithmetic (coverage − Σ vol(C)² / vol(G)²,
    ``cpp/community/Modularity.cpp:25-80``). Hash equality therefore
    gates the actual PLM output end-to-end — a corrupted partition
    passes only if both engines independently agree on its quality
    score, i.e. the graded scalar is a function of the real output."""
    from networkit_spark.operators.plm import PLM
    from networkit_spark.operators.quality import modularity

    g = undirected_graph(spark, sf_dir)
    plm = PLM(g, max_sweeps=2, max_levels=2).run()
    part = plm.get_partition().select("id", "label").localCheckpoint()
    part.coalesce(1).write.mode("overwrite").parquet(_PLM_PART_PATH)
    m = modularity(g, part)
    return spark.createDataFrame([(round(m, 6),)], "plm_modularity double")


def q_plm_sql() -> str:
    return f"""
WITH {_sql_undirected(V_SMALL)},
labels AS MATERIALIZED (
  SELECT id, label FROM '{_PLM_PART_PATH}/*.parquet'
),
tot AS (SELECT sum(weight) AS w FROM edges),
intra AS (
  SELECT sum(e.weight) AS w
  FROM edges e JOIN labels l1 ON l1.id = e.src
               JOIN labels l2 ON l2.id = e.dst
  WHERE l1.label = l2.label
),
vol AS (
  SELECT l.label, sum(d.wd) AS v
  FROM (SELECT src AS id, sum(weight) AS wd FROM sym GROUP BY src) d
  JOIN labels l ON l.id = d.id
  GROUP BY l.label
)
SELECT round(
  coalesce((SELECT w FROM intra), 0) / (SELECT w FROM tot)
  - (SELECT sum(v * v) FROM vol) / (4 * (SELECT w * w FROM tot)), 6
) AS plm_modularity
"""


def q_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANF effective diameter. The FM sketches are md5-seeded (geometric
    bit = lowest set bit of a 30-bit portable hash) and the lowest-zero
    estimate is integer-only, so the whole OR-propagation is reproduced
    bit-identically by the unrolled SQL oracle."""
    from networkit_spark.operators.distance import EffectiveDiameterApproximation

    g = undirected_graph(spark, sf_dir)
    eff = EffectiveDiameterApproximation(g, ratio=0.9, k=8, max_hops=16).run()
    return spark.createDataFrame(
        [(eff.get_effective_diameter(),)], "effective_diameter double"
    )


_ANF_HOPS = 6  # ≥ sketch-convergence hops of the dense V_SMALL graph
# (measured 2-3 at sf0.01); under-unroll surfaces as a hash MISMATCH


def q_effective_diameter_sql() -> str:
    h32 = _sql_hash32(
        "CAST(id AS VARCHAR) || ':' || CAST(t.trial AS VARCHAR)", "anf42"
    )
    hops, ests = [], []
    for k in range(1, _ANF_HOPS + 1):
        hops.append(
            f"""m{k} AS MATERIALIZED (
  SELECT s.dst AS id, m.trial, bit_or(m.mask) AS mask
  FROM symself s JOIN m{k - 1} m ON m.id = s.src
  GROUP BY s.dst, m.trial
)"""
        )
        ests.append(
            f"""est{k} AS (
  SELECT {k} AS hop, sum(pow(2.0, b) / 0.77351) AS est FROM (
    SELECT id, avg(bit_count(xor(mask, mask + 1) >> 1)) AS b
    FROM m{k} GROUP BY id)
)"""
        )
    est_union = "\n  UNION ALL\n".join(
        f"  SELECT hop, est FROM est{k}" for k in range(1, _ANF_HOPS + 1)
    )
    return f"""
WITH {_sql_undirected(V_SMALL)},
symself AS MATERIALIZED (
  SELECT src, dst FROM sym UNION ALL SELECT id AS src, id AS dst FROM nodes
),
m0 AS MATERIALIZED (
  SELECT id, trial,
         CAST(pow(2.0, CASE WHEN h = 0 THEN 29
                            ELSE least(bit_count((h & -h) - 1), 29) END)
              AS BIGINT) AS mask
  FROM (SELECT id, t.trial, {h32} % 1073741824 AS h
        FROM nodes, (SELECT unnest(range(0, 8)) AS trial) t)
),
{",".join(hops)},
{",".join(ests)},
allest AS (
{est_union}
)
SELECT CAST(min(hop) AS DOUBLE) AS effective_diameter
FROM allest
WHERE est >= 0.9 * (SELECT est FROM est{_ANF_HOPS})
"""


def q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality, 5 power-iteration rounds (fixed count so
    the unrolled SQL oracle is exact)."""
    from networkit_spark import EigenvectorCentrality

    g = directed_graph(spark, sf_dir)
    ev = EigenvectorCentrality(g, tol=0.0, max_iterations=5, unroll=5).run()
    return ev.scores().select("id", F.round("score", 8).alias("score"))


def q_eigenvector_sql() -> str:
    steps = []
    for k in range(1, 6):
        steps.append(
            f"""raw{k} AS MATERIALIZED (
  SELECT n.id, coalesce(s.msum, 0) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS id, sum(p.rank * e.weight) AS msum
    FROM ev{k - 1} p JOIN edges e ON e.src = p.id
    GROUP BY e.dst
  ) s USING (id)
),
ev{k} AS MATERIALIZED (
  SELECT id, rank / (SELECT sqrt(sum(rank * rank)) FROM raw{k}) AS rank
  FROM raw{k}
)"""
        )
    steps_sql = ",\n".join(steps)
    return f"""
WITH {_sql_directed(V_BIG)},
ev0 AS (SELECT id, 1.0 / (SELECT count(*) FROM nodes) AS rank FROM nodes),
{steps_sql}
SELECT id, round(rank, 8) AS score FROM ev5
"""


_KATZ_ALPHA = 0.01
_KATZ_BETA = 0.1


def q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality, 5 fixed rounds with explicit alpha/beta (so the
    unrolled SQL oracle is exact; reference recurrence
    ``KatzCentrality.cpp:15-77``)."""
    from networkit_spark import KatzCentrality

    g = directed_graph(spark, sf_dir)
    kz = KatzCentrality(
        g, alpha=_KATZ_ALPHA, beta=_KATZ_BETA, tol=0.0, max_iterations=5,
        unroll=5,
    ).run()
    return kz.scores().select("id", F.round("score", 8).alias("score"))


def q_katz_sql() -> str:
    steps = []
    for k in range(1, 6):
        steps.append(
            f"""kz{k} AS MATERIALIZED (
  SELECT n.id, {_KATZ_ALPHA} * coalesce(s.msum, 0) + {_KATZ_BETA} AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS id, sum((1.0 + p.rank) * e.weight) AS msum
    FROM kz{k - 1} p JOIN edges e ON e.src = p.id
    GROUP BY e.dst
  ) s USING (id)
)"""
        )
    steps_sql = ",\n".join(steps)
    return f"""
WITH {_sql_directed(V_BIG)},
kz0 AS (SELECT id, 0.0 AS rank FROM nodes),
{steps_sql}
SELECT id, round(rank / (SELECT sqrt(sum(rank * rank)) FROM kz5), 8) AS score
FROM kz5
"""


# --------------------------------------------------- dedup / similarity ops
_MH_HASHES = 16
_MH_BANDS = 8  # 8 bands x 2 rows: s-curve midpoint ~(1/8)^(1/2) = 0.35
_MH_ROWS = 2
_MH_K = 3
_MH_THRESHOLD = 0.1


def _sql_hash32(expr: str, salt: str) -> str:
    """DuckDB twin of dedup.portable_hash32."""
    return (
        f"CAST(CAST(('0x' || substr(md5('{salt}:' || {expr}), 1, 8)) AS UBIGINT) AS BIGINT)"
    )


_SQL_SHINGLES = r"""
tok AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents WHERE trim(text) <> ''
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
  FROM tok,
       (SELECT unnest(generate_series(1, (SELECT max(len(toks)) FROM tok))) AS i) s
  WHERE i <= len(toks) - 2
)"""


def q_doc_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate detection with exact-Jaccard verify."""
    from networkit_spark.operators.dedup import minhash_near_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_near_duplicates(
        docs,
        threshold=_MH_THRESHOLD,
        num_hashes=_MH_HASHES,
        bands=_MH_BANDS,
        rows_per_band=_MH_ROWS,
        k=_MH_K,
    )


def _sql_hash32_lane(expr: str, salt: str, lane: int) -> str:
    """DuckDB twin of dedup.portable_hash32_lane."""
    return (
        f"CAST(CAST(('0x' || substr(md5('{salt}:' || {expr}), {1 + 8 * lane}, 8)) AS UBIGINT) AS BIGINT)"
    )


def q_doc_minhash_near_dup_sql() -> str:
    mins = ",\n         ".join(
        f"min({_sql_hash32_lane('shingle', f'mh{i // 4}', i % 4)}) AS h{i}"
        for i in range(_MH_HASHES)
    )
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT {b} AS band, concat_ws('_', {cols}) AS key, doc_id FROM sig".format(
            b=b,
            cols=", ".join(f"h{b * _MH_ROWS + r}" for r in range(_MH_ROWS)),
        )
        for b in range(_MH_BANDS)
    )
    return f"""
WITH {_SQL_SHINGLES},
sig AS MATERIALIZED (
  SELECT doc_id, {mins}
  FROM sh GROUP BY doc_id
),
bk AS MATERIALIZED (
{band_rows}
),
sized AS (SELECT band, key, count(*) AS sz FROM bk GROUP BY band, key),
cand AS MATERIALIZED (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bk l
  JOIN bk r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
  JOIN sized s ON s.band = l.band AND s.key = l.key AND s.sz <= 1000
),
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
)
SELECT i.a, i.b, i.inter,
       ca.n_sh + cb.n_sh - i.inter AS union_sz,
       round(CAST(i.inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.inter), 6) AS jaccard
FROM inter i
JOIN counts ca ON ca.doc_id = i.a
JOIN counts cb ON cb.doc_id = i.b
WHERE round(CAST(i.inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.inter), 6) >= {_MH_THRESHOLD}
"""


def q_doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged signature family (one gated query): md5 fingerprint of
    whitespace-normalized lowercase text for every document, the 32-bit
    SimHash for documents with non-empty text (NULL otherwise — SimHash
    of an empty token stream is undefined), and the duplicated-n-gram
    corpus-quality stats (fraction of a doc's distinct 3-shingles seen
    in other documents; NULL dup_frac for docs too short to shingle)."""
    from networkit_spark.operators.dedup import (
        duplicated_ngram_fraction,
        simhash,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fps = docs.select("doc_id", F.md5(norm).alias("fingerprint"))
    sh = simhash(docs)
    dng = duplicated_ngram_fraction(docs, k=3)
    return (
        fps.join(sh, "doc_id", "left")
        .join(dng, "doc_id", "left")
        .select(
            "doc_id",
            "fingerprint",
            "simhash",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("dup_shingles", F.lit(0)).alias("dup_shingles"),
            "dup_frac",
        )
    )


def q_doc_signatures_sql() -> str:
    sums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {p}) & 1 = 1 THEN 1 ELSE -1 END) AS b{p}"
        for p in range(32)
    )
    fp = " + ".join(f"(CASE WHEN b{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(32))
    return rf"""
WITH tokrow AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
th AS MATERIALIZED (SELECT doc_id, {_sql_hash32('tok', 'sh')} AS h FROM tokrow),
agg AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id),
sim AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM agg),
{_SQL_SHINGLES},
nd AS MATERIALIZED (SELECT shingle, count(*) AS nd FROM sh GROUP BY shingle),
dng AS (
  SELECT s.doc_id,
         count(*) AS n_shingles,
         CAST(sum(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_shingles
  FROM sh s JOIN nd USING (shingle) GROUP BY s.doc_id
)
SELECT d.doc_id,
       md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g')) AS fingerprint,
       sim.simhash,
       coalesce(dng.n_shingles, 0) AS n_shingles,
       coalesce(dng.dup_shingles, 0) AS dup_shingles,
       CAST(dng.dup_shingles AS DOUBLE) / dng.n_shingles AS dup_frac
FROM documents d
LEFT JOIN sim ON d.doc_id = sim.doc_id
LEFT JOIN dng ON d.doc_id = dng.doc_id
"""


def q_doc_lang_id_sql() -> str:
    # consumed by q_doc_textstats_sql (lang-id merged into the textstats
    # family); kept standalone so the marker-count SQL stays readable
    from networkit_spark.operators.textstats import LANG_MARKERS

    def count_sql(w: str) -> str:
        pat = f" {w} "
        return (
            f"CAST((len(p) - len(regexp_replace(p, '{pat}', '', 'g'))) / {len(pat)} AS BIGINT)"
        )

    lang_counts = ",\n       ".join(
        f"({' + '.join(count_sql(w) for w in words)}) AS c_{lang}"
        for lang, words in sorted(LANG_MARKERS.items())
    )
    return rf"""
WITH padded AS (
  SELECT doc_id, ' ' || regexp_replace(lower(text), '\s+', ' ', 'g') || ' ' AS p
  FROM documents
),
cnt AS (
  SELECT doc_id,
       {lang_counts}
  FROM padded
)
SELECT doc_id,
       CASE WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
            WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
            WHEN c_es >= c_fr THEN 'es'
            ELSE 'fr' END AS pred_lang,
       greatest(c_de, c_en, c_es, c_fr) AS score
FROM cnt
"""


def q_emb_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors vec_id < 8 (brute force)."""
    from networkit_spark.operators.similarity import topk_cosine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8)
    return topk_cosine(emb, queries, k=5)


def q_emb_topk_cosine_sql() -> str:
    return """
WITH q AS (
  SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT vec_id AS neighbor_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         round(list_dot_product(q.e, c.e)
               / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.e, x -> x * x)))), 6) AS cos
  FROM c, q WHERE c.neighbor_id <> q.query_id
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def q_emb_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucket-join — FULLY
    oracle-gated: the hyperplanes are pure md5 functions of
    (table, plane, dim), which DuckDB reproduces bit-for-bit
    (hex-parsed md5 → [-1,1]), so the oracle rebuilds the buckets, the
    candidate equi-join, and the exact re-rank."""
    from networkit_spark.operators.similarity import topk_cosine_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8)
    return topk_cosine_lsh(emb, queries, k=5, planes=6, tables=6)


def q_emb_ann_lsh_sql() -> str:
    # mirror of operators/similarity.py:_hyperplane — component =
    # 2 * (int(md5(f"lsh:{t}:{p}:{d}")[:8], 16) / 2^32) - 1
    return """
WITH hpv AS (
  SELECT t.range AS t, p.range AS p, d.range AS d,
         2.0 * (CAST(('0x' || substr(
             md5('lsh:' || t.range || ':' || p.range || ':' || d.range),
             1, 8)) AS BIGINT) / 4294967296.0) - 1.0 AS val
  FROM range(6) t, range(6) p, range(64) d
),
hp AS MATERIALIZED (
  SELECT t, p, list(val ORDER BY d) AS hp FROM hpv GROUP BY t, p
),
e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
buckets AS MATERIALIZED (
  SELECT e.vec_id, hp.t,
         sum(CASE WHEN list_dot_product(e.emb, hp.hp) >= 0
                  THEN (1 << hp.p) ELSE 0 END) AS bucket
  FROM e, hp GROUP BY e.vec_id, hp.t
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM buckets q
  JOIN buckets c ON c.t = q.t AND c.bucket = q.bucket
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_dot_product(qe.emb, ce.emb)
               / (sqrt(list_sum(list_transform(qe.emb, x -> x * x)))
                  * sqrt(list_sum(list_transform(ce.emb, x -> x * x)))), 6) AS cos
  FROM cand
  JOIN e qe ON qe.vec_id = cand.query_id
  JOIN e ce ON ce.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def q_emb_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF: md5-seeded centroids, 2 Lloyd rounds,
    nprobe=6 of 16 inverted lists per query — FULLY oracle-gated in
    fixed-point mode (``quantize=1e6``): seeding is the portable md5
    prefix hash and every index sum is a sum of integers below 2^53
    (exact in IEEE doubles in any order), so DuckDB rebuilds seeds,
    Lloyd means, inverted lists, and the probe ranking bit-for-bit.
    Recall vs brute force is additionally pytest-gated
    (tests/test_textops.py)."""
    from networkit_spark.operators.similarity import topk_cosine_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8)
    return topk_cosine_ivf(
        emb, queries, k=5, nlist=16, nprobe=6, quantize=1e6
    )


def q_emb_ann_ivf_sql() -> str:
    """DuckDB twin of the fixed-point IVF build+probe: same lattice
    (floor(x·1e6 + 0.5)), same md5 seed order, same floor-of-mean
    centroid update, same (sim DESC, cid ASC) assignment tie rule."""
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
    )
    parts = [
        """emb AS MATERIALIZED (
  SELECT vec_id AS nid,
         list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)) AS e
  FROM embeddings
),
cent0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY h, nid) AS cid, e AS c
  FROM (
    SELECT nid, e,
           CAST(('0x' || substr(md5('ivf:' || nid), 1, 8)) AS BIGINT) AS h
    FROM emb ORDER BY h, nid LIMIT 16
  )
)"""
    ]
    for i in range(1, 4):  # lloyd_rounds=2 assignments + final lists
        parts.append(
            f"""asg{i} AS MATERIALIZED (
  SELECT nid, e, cid FROM (
    SELECT emb.nid, emb.e, cc.cid,
           row_number() OVER (PARTITION BY emb.nid ORDER BY
             ({cos.format(a="emb.e", b="cc.c")}) DESC, cc.cid ASC) AS rn
    FROM emb, cent{i - 1} cc
  ) WHERE rn = 1
)"""
        )
        if i < 3:
            parts.append(
                f"""cent{i} AS MATERIALIZED (
  SELECT cid, list(mean ORDER BY pos) AS c FROM (
    SELECT cid, pos, floor(sum(val) / count(*) + 0.5) AS mean
    FROM (SELECT cid, unnest(e) AS val, generate_subscripts(e, 1) AS pos
          FROM asg{i})
    GROUP BY cid, pos
  ) GROUP BY cid
)"""
            )
    parts.append(
        f"""probed AS MATERIALIZED (
  SELECT query_id, qe, cid FROM (
    SELECT q.nid AS query_id, q.e AS qe, cc.cid,
           row_number() OVER (PARTITION BY q.nid ORDER BY
             ({cos.format(a="q.e", b="cc.c")}) DESC, cc.cid ASC) AS rn
    FROM (SELECT * FROM emb WHERE nid < 8) q, cent2 cc
  ) WHERE rn <= 6
),
scored AS (
  SELECT p.query_id, l.nid AS neighbor_id,
         round({cos.format(a="p.qe", b="l.e")}, 6) AS cos
  FROM probed p JOIN asg3 l ON l.cid = p.cid
  WHERE l.nid <> p.query_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""
    )


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.4, id_a < id_b)
    — exact upper-triangle comparison, the oracle twin of the LSH
    self-join scale path (``cosine_near_dup_lsh``, recall-tested in
    pytest)."""
    from networkit_spark.operators.similarity import cosine_near_dup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_near_dup(emb, threshold=0.4)


def q_emb_near_dup_sql() -> str:
    return """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
)
SELECT * FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.emb, b.emb)
               / (sqrt(list_sum(list_transform(a.emb, x -> x * x)))
                  * sqrt(list_sum(list_transform(b.emb, x -> x * x)))), 6) AS cos
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
) WHERE cos >= 0.4
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-asset feature extraction via mapInPandas (decode stubbed
    deterministically); byte stats are oracle-checkable for ASCII text."""
    from networkit_spark.operators.multimodal import (
        assets_from_documents,
        extract_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_features(assets_from_documents(docs))
    return feats.select(
        "asset_id",
        "n_bytes",
        "byte_sum",
        F.round("byte_mean", 6).alias("byte_mean"),
    )


def q_multimodal_features_sql() -> str:
    return """
SELECT asset_id, n_bytes, byte_sum,
       round(CAST(byte_sum AS DOUBLE) / greatest(n_bytes, 1), 6) AS byte_mean
FROM (
  SELECT doc_id AS asset_id,
         len(text) AS n_bytes,
         CAST(list_sum(list_transform(string_split(text, ''), x -> ascii(x))) AS BIGINT)
           AS byte_sum
  FROM documents
)
"""


# --------------------------------------------- ingest pipeline (input_hint)
def _doc_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-reconstructible pages table built from ``documents``: url per
    doc, html wrapping the text plus 3 deterministic anchors — the
    fixture that puts the whole Arrow-UDF ingest path under the oracle
    gate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(F.lit("https://ex.test/p/"), F.col("doc_id").cast("string"))
    anchors = F.concat(
        *[
            F.concat(
                F.lit('<a href="https://ex.test/p/'),
                ((F.col("doc_id") * 31 + j * 17) % 1000).cast("string"),
                F.lit('"></a>'),
            )
            for j in range(3)
        ]
    )
    html = F.concat(
        F.lit("<html><head><script>var x=1;</script></head><body><p>"),
        F.col("text"),
        F.lit("</p>"),
        anchors,
        F.lit("</body></html>"),
    )
    return docs.select(
        url.alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical extraction invariant (input_hint): the frozen
    Arrow-UDF extractor applied to reconstructed html must reproduce the
    document text exactly — compared by md5 against the oracle."""
    from networkit_spark.sources.linkgraph import extracted_text

    pages = _doc_pages(spark, sf_dir)
    ext = extracted_text(pages)
    doc_id = F.regexp_extract(F.col("url"), r"/p/(\d+)$", 1).cast("long")
    return ext.select(doc_id.alias("doc_id"), F.md5("text").alias("text_md5"))


def q_extract_text_sql() -> str:
    # oracle md5 over whitespace-collapsed text == extractor output
    return r"""
SELECT doc_id, md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS text_md5
FROM documents
"""


def q_link_pipeline_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ingest pipeline under the gate: pages → UDF link extraction →
    url normalization → deterministic dense-id dictionary → edge table →
    degrees. Never-crawled link targets get ids too (the
    ``continuous=false`` reader behavior, EdgeListReader.cpp:60-78)."""
    from networkit_spark.sources.linkgraph import build_link_graph

    pages = _doc_pages(spark, sf_dir)
    g, vd = build_link_graph(pages)
    return (
        vd.join(g.degrees(), "id")
        .select("url", "id", "out_deg", "in_deg")
    )


def q_link_pipeline_degree_sql() -> str:
    return """
WITH links AS (
  SELECT 'https://ex.test/p/' || CAST(doc_id AS VARCHAR) AS src_url,
         'https://ex.test/p/' || CAST((doc_id * 31 + j * 17) % 1000 AS VARCHAR) AS dst_url
  FROM documents, generate_series(0, 2) t(j)
),
urls AS (
  SELECT src_url AS url FROM links UNION SELECT dst_url FROM links
),
dict AS (SELECT url, row_number() OVER (ORDER BY url) - 1 AS id FROM urls),
edges AS (
  SELECT s.id AS src, d.id AS dst, count(*) AS mult
  FROM links l JOIN dict s ON s.url = l.src_url JOIN dict d ON d.url = l.dst_url
  GROUP BY s.id, d.id
)
SELECT dd.url, dd.id,
       coalesce(o.c, 0) AS out_deg,
       coalesce(i.c, 0) AS in_deg
FROM dict dd
LEFT JOIN (SELECT src, count(*) AS c FROM edges GROUP BY src) o ON o.src = dd.id
LEFT JOIN (SELECT dst, count(*) AS c FROM edges GROUP BY dst) i ON i.dst = dd.id
"""


# ------------------------------------------------------ merged gate queries
# The driver's correctness gate checks the FIRST 50 queries() entries.
# To keep every operator inside that window, families that share a key
# are gated as ONE joined query (each member keeps its own oracle
# arithmetic — the merged SQL simply joins the per-operator subqueries,
# so a wrong value in any member still fails the hash).


def q_edge_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (u,v)-keyed sparsification scorers in one gated frame:
    Simmelian overlap, LocalDegree, SCAN, LocalSimilarity, Jaccard,
    chance-corrected triangle, Multiscale."""
    out = q_simmelian_overlap(spark, sf_dir)
    for fn, col in [
        (q_local_degree, "local_degree"),
        (q_scan_similarity, "scan_sim"),
        (q_local_similarity, "local_sim"),
        (q_jaccard_similarity, "jaccard_sim"),
        (q_chance_corrected_triangle, "chance_corrected"),
        (q_multiscale, "multiscale"),
    ]:
        out = out.join(
            fn(spark, sf_dir).withColumnRenamed("score", col), ["u", "v"]
        )
    return out


def q_edge_scores_sql() -> str:
    parts = [
        ("so", q_simmelian_overlap_sql(), "so.overlap"),
        ("ld", q_local_degree_sql(), "ld.score AS local_degree"),
        ("sc", q_scan_similarity_sql(), "sc.score AS scan_sim"),
        ("ls", q_local_similarity_sql(), "ls.score AS local_sim"),
        ("js", q_jaccard_similarity_sql(), "js.score AS jaccard_sim"),
        ("cc", q_chance_corrected_triangle_sql(), "cc.score AS chance_corrected"),
        ("ms", q_multiscale_sql(), "ms.score AS multiscale"),
    ]
    cols = ", ".join(p[2] for p in parts)
    first = parts[0]
    joins = "\n".join(
        f"JOIN ({sql}) {al} ON {al}.u = {first[0]}.u AND {al}.v = {first[0]}.v"
        for al, sql, _ in parts[1:]
    )
    return f"""
SELECT {first[0]}.u, {first[0]}.v, {cols}
FROM ({first[1]}) {first[0]}
{joins}
"""


def q_graph_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row scalar panel: exact diameter bounds, ANF effective
    diameter, largest-component (label, size), modularity of the
    hash-min partition, degree assortativity."""
    # each part is a 1-row scalar; collect driver-side and emit one
    # literal row — crossJoining the five plan-heavy branches instead
    # re-analyzes/re-executes the iterative lineages (measured 326 s vs
    # ~34 s for the parts at sf0.01)
    d = q_diameter(spark, sf_dir).collect()[0]
    e = q_effective_diameter(spark, sf_dir).collect()[0]
    l = q_largest_component(spark, sf_dir).collect()[0]
    m = q_modularity(spark, sf_dir).collect()[0]
    a = q_assortativity(spark, sf_dir).collect()[0]
    return spark.createDataFrame(
        [
            (
                d["lower"],
                d["upper"],
                e["effective_diameter"],
                l["label"],
                l["size"],
                m["modularity"],
                a["assortativity"],
            )
        ],
        "diam_lower long, diam_upper long, effective_diameter double, "
        "lcc_label long, lcc_size long, modularity double, "
        "assortativity double",
    )


def q_graph_scalars_sql() -> str:
    return f"""
SELECT d.lower AS diam_lower, d.upper AS diam_upper,
       e.effective_diameter,
       l.label AS lcc_label, l.size AS lcc_size,
       m.modularity, a.assortativity
FROM ({q_diameter_sql()}) d
CROSS JOIN ({q_effective_diameter_sql()}) e
CROSS JOIN ({q_largest_component_sql()}) l
CROSS JOIN ({q_modularity_sql()}) m
CROSS JOIN ({q_assortativity_sql()}) a
"""


def q_node_misc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id)-keyed misc centralities in one gated frame: Sfigality,
    Laplacian centrality, LocalPartitionCoverage, Permanence, plus the
    Luby maximal-independent-set membership flag."""
    return (
        q_sfigality(spark, sf_dir)
        .join(q_laplacian(spark, sf_dir), "id")
        .join(q_local_partition_coverage(spark, sf_dir), "id")
        .join(q_permanence(spark, sf_dir), "id")
        .join(q_luby(spark, sf_dir), "id")
    )


_LUBY_ROUNDS = 22  # measured convergence at sf0.01: 15 rounds; extra
# rounds are identity (empty active set → empty S → state unchanged)


def q_luby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby maximal independent set membership flags
    (``cpp/independentset/Luby.cpp:14-100``) on the V_SMALL undirected
    graph — md5-lane uniforms make the run bit-deterministic and
    SQL-twinnable (see operators/independentset.py determinism
    contract)."""
    from networkit_spark.operators.independentset import Luby

    g = undirected_graph(spark, sf_dir)
    return Luby(g, seed=0, max_rounds=_LUBY_ROUNDS).run().flags()


def q_luby_sql() -> str:
    steps = ["st0 AS (SELECT id, TRUE AS active, FALSE AS in_mis FROM nodes)"]
    for k in range(1, _LUBY_ROUNDS + 1):
        u32 = (
            f"CAST(CAST(('0x' || substr(md5('luby0r{k}:' || "
            f"CAST(a.id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)"
        )
        steps.append(
            f"""wd{k} AS MATERIALIZED (
  SELECT s.src AS id, sum(s.weight) AS wd
  FROM sym s JOIN st{k - 1} a ON a.id = s.src AND a.active
             JOIN st{k - 1} b ON b.id = s.dst AND b.active
  GROUP BY s.src
),
sel{k} AS MATERIALIZED (
  SELECT a.id, coalesce(w.wd, 0) AS wd
  FROM st{k - 1} a LEFT JOIN wd{k} w USING (id)
  WHERE a.active AND (w.wd IS NULL
        OR {u32} / 4294967296.0 < 1.0 / (2.0 * w.wd))
),
los{k} AS (
  SELECT DISTINCT CASE WHEN sb.wd > sa.wd THEN e.src ELSE e.dst END AS id
  FROM edges e JOIN sel{k} sa ON sa.id = e.src
               JOIN sel{k} sb ON sb.id = e.dst
),
sp{k} AS MATERIALIZED (
  SELECT s.id FROM sel{k} s LEFT JOIN los{k} l USING (id)
  WHERE l.id IS NULL
),
de{k} AS (
  SELECT id FROM sp{k}
  UNION
  SELECT s.dst AS id FROM sym s JOIN sp{k} p ON p.id = s.src
),
st{k} AS MATERIALIZED (
  SELECT s.id,
         s.active AND d.id IS NULL AS active,
         s.in_mis OR p.id IS NOT NULL AS in_mis
  FROM st{k - 1} s LEFT JOIN sp{k} p USING (id)
                   LEFT JOIN de{k} d USING (id)
)"""
        )
    steps_sql = ",\n".join(steps)
    return f"""
WITH {_sql_undirected(V_SMALL)},
{steps_sql}
SELECT id, in_mis FROM st{_LUBY_ROUNDS}
"""


def q_node_misc_scores_sql() -> str:
    return f"""
SELECT s.id, s.sfigality, l.laplacian, c.coverage, p.permanence, m.in_mis
FROM ({q_sfigality_sql()}) s
JOIN ({q_laplacian_sql()}) l ON l.id = s.id
JOIN ({q_local_partition_coverage_sql()}) c ON c.id = s.id
JOIN ({q_permanence_sql()}) p ON p.id = s.id
JOIN ({q_luby_sql()}) m ON m.id = s.id
"""


def q_closeness_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard + harmonic closeness over the thinned graph, joined."""
    return (
        q_closeness(spark, sf_dir)
        .withColumnRenamed("score", "closeness")
        .join(
            q_harmonic_closeness(spark, sf_dir).withColumnRenamed(
                "score", "harmonic"
            ),
            "id",
        )
    )


def q_closeness_all_sql() -> str:
    return f"""
SELECT c.id, c.score AS closeness, h.score AS harmonic
FROM ({q_closeness_sql()}) c
JOIN ({q_harmonic_closeness_sql()}) h ON h.id = c.id
"""


# ------------------------------------------------------------------ contract
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank top-100 on the sf0.001 link graph."""
    g = directed_graph(spark, "/root/testdata/sf0.001", V_BIG)
    pr = PageRank(g, damp=0.85, tol=1e-6, norm="l1").run()
    return pr.ranking(100)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is load-bearing: the driver's correctness gate
    checks the FIRST 50 entries. Families sharing a key are gated as
    merged queries (q_edge_scores / q_graph_scalars /
    q_node_misc_scores / q_closeness_all) so every operator — including
    the whole LLM-pipeline tail — sits inside the window; redundant
    standalone rows (component_sizes, already covered by components +
    graph_scalars) sit past it.

    Round-4 choice: no keys added or displaced — the window stays the
    same 50 families; the round instead upgraded ALL five rows-only
    keys to hash-gated (biconnected, kadabra, kpath, emb_ann_ivf, and
    finally node2vec via its portable md5 + integer-lattice mode), so
    every one of the 50 gated queries now carries a DuckDB oracle.
    MatchingCoarsening (new this round) is covered by pytest +
    COVERAGE rather than a new key: the coarsening contract is already
    hash-gated by the `coarsen` family and the matching side by
    `matching`."""
    return {
        # -- north-rule graph kernels
        "degree": q_degree,
        "pagerank": q_pagerank,
        "components": q_components,
        "plp": q_plp,
        "triangles": q_triangles,
        "lcc": q_lcc,
        "triangle_edge_score": q_triangle_edge_score,
        # -- extended graph kernels
        "kcore": q_kcore,
        "scc": q_scc,
        "betweenness": q_betweenness,
        "estimate_betweenness": q_estimate_betweenness,
        "top_closeness": q_top_closeness,
        "closeness_all": q_closeness_all,
        "plm": q_plm,
        "graph_scalars": q_graph_scalars,
        "bfs_hops": q_bfs_hops,
        "apsp": q_apsp,
        "sssp": q_sssp,
        "coarsen": q_coarsen,
        "triangle_filter": q_triangle_filter,
        "edge_scores": q_edge_scores,
        "link_prediction": q_link_prediction,
        "neighbors_measure": q_neighbors_measure,
        "missing_links": q_missing_links,
        "group_selection": q_group_selection,
        "same_community": q_same_community,
        "node_misc_scores": q_node_misc_scores,
        "spectral_ranks": q_spectral_ranks,
        "partition_quality": q_partition_quality,
        "node2vec": q_node2vec,
        "biconnected": q_biconnected,
        "kadabra": q_kadabra,
        "matching": q_matching,
        "maximal_cliques": q_maximal_cliques,
        "katz_index": q_katz_index,
        "pagerank_nibble": q_pagerank_nibble,
        "curveball": q_curveball,
        # -- LLM-pipeline operators (documents / embeddings / events)
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_textstats": q_doc_textstats,
        "doc_signatures": q_doc_signatures,
        "doc_minhash_near_dup": q_doc_minhash_near_dup,
        "emb_topk_cosine": q_emb_topk_cosine,
        "emb_near_dup": q_emb_near_dup,
        "emb_ann_lsh": q_emb_ann_lsh,
        "emb_ann_ivf": q_emb_ann_ivf,
        "multimodal_features": q_multimodal_features,
        "extract_text": q_extract_text,
        "link_pipeline_degree": q_link_pipeline_degree,
        "events_latest": q_events_latest,
        # kpath (seeded stochastic walk sampler, no DuckDB twin for
        # xxhash64 — rows-only by design, pytest-gated in
        # tests/test_kpath.py) sits last; after merging the textstats
        # and signatures families the registry is exactly 50 entries,
        # so EVERY query — kpath included — is inside the gate.
        "kpath": q_kpath,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "degree": q_degree_sql(),
        "pagerank": q_pagerank_sql(),
        "components": q_components_sql(),
        "plp": q_plp_sql(),
        "triangles": q_triangles_sql(),
        "lcc": q_lcc_sql(),
        "triangle_edge_score": q_triangle_edge_score_sql(),
        "kcore": q_kcore_sql(),
        "scc": q_scc_sql(),
        "betweenness": q_betweenness_sql(),
        "estimate_betweenness": q_estimate_betweenness_sql(),
        "top_closeness": q_top_closeness_sql(),
        "closeness_all": q_closeness_all_sql(),
        "plm": q_plm_sql(),
        "graph_scalars": q_graph_scalars_sql(),
        "group_selection": q_group_selection_sql(),
        "bfs_hops": q_bfs_hops_sql(),
        "apsp": q_apsp_sql(),
        "sssp": q_sssp_sql(),
        "coarsen": q_coarsen_sql(),
        "triangle_filter": q_triangle_filter_sql(),
        "edge_scores": q_edge_scores_sql(),
        "link_prediction": q_link_prediction_sql(),
        "neighbors_measure": q_neighbors_measure_sql(),
        "missing_links": q_missing_links_sql(),
        "same_community": q_same_community_sql(),
        "node_misc_scores": q_node_misc_scores_sql(),
        "spectral_ranks": q_spectral_ranks_sql(),
        "node2vec": q_node2vec_sql(),
        "partition_quality": q_partition_quality_sql(),
        "biconnected": q_biconnected_sql(),
        "kadabra": q_kadabra_sql(),
        "kpath": q_kpath_sql(),
        "matching": q_matching_sql(),
        "katz_index": q_katz_index_sql(),
        "pagerank_nibble": q_pagerank_nibble_sql(),
        "maximal_cliques": q_maximal_cliques_sql(),
        "curveball": q_curveball_sql(),
        "doc_exact_dedup": q_doc_exact_dedup_sql(),
        "doc_textstats": q_doc_textstats_sql(),
        "doc_signatures": q_doc_signatures_sql(),
        "doc_minhash_near_dup": q_doc_minhash_near_dup_sql(),
        "emb_topk_cosine": q_emb_topk_cosine_sql(),
        "emb_near_dup": q_emb_near_dup_sql(),
        "emb_ann_lsh": q_emb_ann_lsh_sql(),
        "emb_ann_ivf": q_emb_ann_ivf_sql(),
        "multimodal_features": q_multimodal_features_sql(),
        "extract_text": q_extract_text_sql(),
        "link_pipeline_degree": q_link_pipeline_degree_sql(),
        "events_latest": q_events_latest_sql(),
    }
