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


# --------------------------------------------------------------------- helpers
def _raw_edges(spark: SparkSession, sf_dir: str, v: int) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        (F.col("l_orderkey") % v).alias("src"),
        (F.col("l_partkey") % v).alias("dst"),
    )


def directed_graph(spark: SparkSession, sf_dir: str, v: int = V_BIG) -> Graph:
    """Directed weighted link graph; weight = link multiplicity."""
    edges = (
        _raw_edges(spark, sf_dir, v)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    return Graph(edges, directed=True, weighted=True)


def undirected_graph(spark: SparkSession, sf_dir: str, v: int = V_SMALL) -> Graph:
    """Undirected simple graph: canonicalized, self-loops removed,
    weight = multiplicity of the canonical pair."""
    raw = _raw_edges(spark, sf_dir, v)
    edges = (
        raw.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    return Graph(edges, directed=False, weighted=True)


# SQL fragments mirroring the same derivations for DuckDB
def _sql_directed(v: int) -> str:
    return f"""
edges AS (
  SELECT l_orderkey % {v} AS src, l_partkey % {v} AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM lineitem GROUP BY 1, 2
),
nodes AS (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges
  )
)"""


def _sql_undirected(v: int) -> str:
    return f"""
edges AS (
  SELECT least(l_orderkey % {v}, l_partkey % {v}) AS src,
         greatest(l_orderkey % {v}, l_partkey % {v}) AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM lineitem
  WHERE l_orderkey % {v} <> l_partkey % {v}
  GROUP BY 1, 2
),
sym AS (
  SELECT src, dst, weight FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst, weight FROM edges
),
nodes AS (
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
    pr = PageRank(g, damp=0.85, tol=0.0, norm="l1", max_iterations=PR_ITERS).run()
    return pr.scores().select("id", F.round("score", 8).alias("score"))


def q_pagerank_sql() -> str:
    # unrolled power iteration: pr0 .. pr{PR_ITERS}, then final
    # normalization by the sum (PageRank.cpp:74-78 semantics)
    steps = []
    for k in range(1, PR_ITERS + 1):
        steps.append(
            f"""pr{k} AS (
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
    g = undirected_graph(spark, sf_dir)
    cc = ConnectedComponents(g).run()
    return cc.get_partition().select("id", "label")


def q_components_sql() -> str:
    # min reachable id == hash-min fixpoint label
    return f"""
WITH RECURSIVE {_sql_undirected(V_SMALL)},
reach (id, label) AS (
  SELECT id, id AS label FROM nodes
  UNION
  SELECT s.dst AS id, r.label AS label
  FROM reach r JOIN sym s ON s.src = r.id
)
SELECT id, min(label) AS label FROM reach GROUP BY id
"""


def q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = undirected_graph(spark, sf_dir)
    cc = ConnectedComponents(g).run()
    return cc.get_component_sizes().select("label", "size")


def q_component_sizes_sql() -> str:
    return f"""
WITH RECURSIVE {_sql_undirected(V_SMALL)},
reach (id, label) AS (
  SELECT id, id AS label FROM nodes
  UNION
  SELECT s.dst AS id, r.label AS label
  FROM reach r JOIN sym s ON s.src = r.id
),
labels AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
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
            f"""lab{k} AS (
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
deg AS (
  SELECT id, count(*) AS d FROM (
    SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges
  ) GROUP BY id
),
oriented AS (
  SELECT CASE WHEN (ds.d, e.src) < (dd.d, e.dst) THEN e.src ELSE e.dst END AS a,
         CASE WHEN (ds.d, e.src) < (dd.d, e.dst) THEN e.dst ELSE e.src END AS b,
         CASE WHEN (ds.d, e.src) < (dd.d, e.dst) THEN dd.d ELSE ds.d END AS d_b
  FROM edges e
  JOIN deg ds ON ds.id = e.src
  JOIN deg dd ON dd.id = e.dst
),
tris AS (
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


def q_largest_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = undirected_graph(spark, sf_dir)
    cc = ConnectedComponents(g).run()
    return (
        cc.get_component_sizes()
        .orderBy(F.desc("size"), F.asc("label"))
        .limit(1)
        .select("label", "size")
    )


def q_largest_component_sql() -> str:
    return f"""
WITH RECURSIVE {_sql_undirected(V_SMALL)},
reach (id, label) AS (
  SELECT id, id AS label FROM nodes
  UNION
  SELECT s.dst AS id, r.label AS label
  FROM reach r JOIN sym s ON s.src = r.id
),
labels AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
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
    cc = ConnectedComponents(g).run()
    m = modularity(g, cc.get_partition())
    return spark.createDataFrame([(round(m, 6),)], "modularity double")


def q_modularity_sql() -> str:
    return f"""
WITH RECURSIVE {_sql_undirected(V_SMALL)},
reach (id, label) AS (
  SELECT id, id AS label FROM nodes
  UNION
  SELECT s.dst AS id, r.label AS label
  FROM reach r JOIN sym s ON s.src = r.id
),
labels AS (SELECT id, min(label) AS label FROM reach GROUP BY id),
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


def q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting over documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.when(F.trim(F.col("text")) == "", 0)
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .alias("n_tokens"),
    )


def q_doc_tokens_sql() -> str:
    return r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
FROM documents
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword hits."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text = F.col("text")
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    the_hits = F.size(F.split(F.concat(F.lit(" "), text, F.lit(" ")), r"\bthe\b")) - 1
    return docs.select(
        "doc_id",
        n.alias("n_chars_computed"),
        F.round(punct.cast("double") / F.greatest(n, F.lit(1)), 6).alias("punct_ratio"),
        the_hits.alias("the_count"),
    )


def q_doc_quality_sql() -> str:
    return r"""
SELECT doc_id,
       len(text) AS n_chars_computed,
       round(CAST(len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
             / greatest(len(text), 1), 6) AS punct_ratio,
       len(regexp_split_to_array(' ' || text || ' ', '\bthe\b')) - 1 AS the_count
FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def q_doc_fingerprint_sql() -> str:
    return r"""
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents
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


# ------------------------------------------------------------------ contract
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank top-100 on the sf0.001 link graph."""
    g = directed_graph(spark, "/root/testdata/sf0.001", V_BIG)
    pr = PageRank(g, damp=0.85, tol=1e-6, norm="l1").run()
    return pr.ranking(100)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "degree": q_degree,
        "pagerank": q_pagerank,
        "components": q_components,
        "component_sizes": q_component_sizes,
        "plp": q_plp,
        "triangles": q_triangles,
        "lcc": q_lcc,
        "triangle_edge_score": q_triangle_edge_score,
        "largest_component": q_largest_component,
        "modularity": q_modularity,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_tokens": q_doc_tokens,
        "doc_quality": q_doc_quality,
        "doc_fingerprint": q_doc_fingerprint,
        "events_latest": q_events_latest,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "degree": q_degree_sql(),
        "pagerank": q_pagerank_sql(),
        "components": q_components_sql(),
        "component_sizes": q_component_sizes_sql(),
        "plp": q_plp_sql(),
        "triangles": q_triangles_sql(),
        "lcc": q_lcc_sql(),
        "triangle_edge_score": q_triangle_edge_score_sql(),
        "largest_component": q_largest_component_sql(),
        "modularity": q_modularity_sql(),
        "doc_exact_dedup": q_doc_exact_dedup_sql(),
        "doc_tokens": q_doc_tokens_sql(),
        "doc_quality": q_doc_quality_sql(),
        "doc_fingerprint": q_doc_fingerprint_sql(),
        "events_latest": q_events_latest_sql(),
    }
