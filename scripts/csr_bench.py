"""Bucketed vs range CSR layout — the warm-path / per-round evidence
(PLANS round-1 open item, closed round 5).

Both layouts hold the same 64-replica sf0.1 link graph (~38M edges).
For each, PageRank runs at fixed 4 and fixed 8 rounds (3 runs each,
median); ``per_round = (t8 - t4) / 4`` isolates the steady per-round
cost, ``warm = t4 - 4*per_round`` isolates the one-time path (scan +
degree agg + contrib build + repartition + persist). Expectation from
the plans: the bucketed scan's catalog-recorded hash(src) partitioning
makes the degree aggregation and the contrib-build join exchange-free,
so the WARM path drops; the per-round cost is unchanged — the round
loop reads the persisted contrib frame either way (that exchange was
already amortized to once-per-run in round 1).

Usage: python scripts/csr_bench.py [sf_dir] [workdir]
Writes one JSON line; paste the table into PLANS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from networkit_spark import Graph, PageRank  # noqa: E402
from networkit_spark.session import get_spark  # noqa: E402

REPLICAS = 64
RUNS = 3


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def _timed_run(g, iters):
    t0 = time.time()
    pr = PageRank(g, damp=0.85, tol=0.0, norm="l1", max_iterations=iters).run()
    pr.scores().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def measure(spark, path, layout):
    g = Graph.load_csr(spark, path, directed=True, weighted=True)
    _timed_run(g, 2)  # JIT/code-cache warm, excluded
    t4 = [_timed_run(g, 4) for _ in range(RUNS)]
    t8 = [_timed_run(g, 8) for _ in range(RUNS)]
    m4, m8 = _median(t4), _median(t8)
    per_round = (m8 - m4) / 4.0
    return {
        "layout": layout,
        "t4_runs": [round(t, 2) for t in t4],
        "t8_runs": [round(t, 2) for t in t8],
        "per_round_s": round(per_round, 3),
        "warm_path_s": round(m4 - 4 * per_round, 3),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/csr_bench"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        "csr-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import V_BIG, directed_graph

    base = directed_graph(spark, sf_dir).edges
    edges = base
    for k in range(1, REPLICAS):
        edges = edges.unionAll(
            base.select(
                (F.col("src") + k * V_BIG).alias("src"),
                (F.col("dst") + k * V_BIG).alias("dst"),
                "weight",
            )
        )
    g = Graph(edges, directed=True, weighted=True)
    m = g.number_of_edges()

    shutil.rmtree(workdir, ignore_errors=True)
    g.persist_csr(f"{workdir}/range", num_partitions=cpus)
    g.persist_csr(f"{workdir}/bucketed", buckets=cpus)

    res_range = measure(spark, f"{workdir}/range", "range")
    res_bucketed = measure(spark, f"{workdir}/bucketed", "bucketed")

    print(
        json.dumps(
            {
                "edges": m,
                "cpus": cpus,
                "replicas": REPLICAS,
                "range": res_range,
                "bucketed": res_bucketed,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
