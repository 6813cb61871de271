"""spark-submit entry point (north_rule: "runs via spark-submit
--py-files on multi-executor clusters").

Package and submit:

    cd /root/repo && zip -r /tmp/networkit_spark.zip networkit_spark
    spark-submit --py-files /tmp/networkit_spark.zip \
        scripts/submit_job.py pagerank \
        --edges hdfs://.../edges.parquet --out hdfs://.../scores \
        --checkpoint-dir hdfs://.../checkpoints --damp 0.85 --tol 1e-6

or end-to-end from a pages table:

    spark-submit --py-files /tmp/networkit_spark.zip \
        scripts/submit_job.py ingest --pages iceberg_cat.db.pages \
        --out hdfs://.../graph

No ``master``/``shuffle_partitions`` are forced here — on a cluster the
submitter decides (``--conf spark.sql.shuffle.partitions=...`` at 2-3×
total cores); ``get_spark`` only fills local-mode defaults when nothing
is configured.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="submit_job.py")
    sub = p.add_subparsers(dest="job", required=True)

    ing = sub.add_parser("ingest", help="pages table -> CSR edge tables + dictionary")
    ing.add_argument("--pages", required=True, help="parquet path or table of pages")
    ing.add_argument("--out", required=True, help="output dir (edges/, edges_rev/, dict/)")
    ing.add_argument("--partitions", type=int, default=None)

    pr = sub.add_parser("pagerank", help="PageRank over an edges parquet")
    pr.add_argument("--edges", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--damp", type=float, default=0.85)
    pr.add_argument("--tol", type=float, default=1e-6)
    pr.add_argument("--norm", choices=["l1", "l2"], default="l1")
    pr.add_argument("--max-iterations", type=int, default=None)
    pr.add_argument("--checkpoint-dir", default=None)
    pr.add_argument("--run-id", default=None, help="resume this run id")

    cc = sub.add_parser("components", help="connected components over an edges parquet")
    cc.add_argument("--edges", required=True)
    cc.add_argument("--out", required=True)
    cc.add_argument("--directed", action="store_true", help="weakly-connected mode")
    cc.add_argument("--checkpoint-dir", default=None)
    cc.add_argument("--run-id", default=None)

    plp = sub.add_parser("plp", help="label propagation communities")
    plp.add_argument("--edges", required=True)
    plp.add_argument("--out", required=True)
    plp.add_argument("--max-iterations", type=int, default=100)

    tri = sub.add_parser("triangles", help="per-vertex triangle counts + LCC")
    tri.add_argument("--edges", required=True)
    tri.add_argument("--out", required=True)
    return p


def main(argv: list[str]) -> None:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from networkit_spark import (
        ConnectedComponents,
        Graph,
        LocalClusteringCoefficient,
        PLP,
        PageRank,
        WeaklyConnectedComponents,
    )
    from networkit_spark.plans.iterate import CheckpointStore

    spark = SparkSession.builder.appName(f"networkit-spark-{args.job}").getOrCreate()
    t0 = time.time()

    def load_graph(path: str, directed: bool) -> Graph:
        return Graph(spark.read.parquet(path), directed=directed, weighted=True)

    if args.job == "ingest":
        from networkit_spark.sources.linkgraph import build_link_graph

        pages = (
            spark.read.parquet(args.pages)
            if "/" in args.pages
            else spark.read.table(args.pages)
        )
        g, vd = build_link_graph(pages)
        g.persist_csr(f"{args.out}/graph", num_partitions=args.partitions)
        vd.write.mode("overwrite").parquet(f"{args.out}/dict")
        stats = {"nodes": g.number_of_nodes(), "edges": g.number_of_edges()}
    elif args.job == "pagerank":
        g = load_graph(args.edges, directed=True)
        store = (
            CheckpointStore(args.checkpoint_dir, run_id=args.run_id)
            if args.checkpoint_dir
            else None
        )
        pr = PageRank(
            g,
            damp=args.damp,
            tol=args.tol,
            norm=args.norm,
            max_iterations=args.max_iterations,
            store=store,
        ).run()
        pr.scores().write.mode("overwrite").parquet(args.out)
        stats = {"iterations": pr.number_of_iterations(), "edges": g.number_of_edges()}
    elif args.job == "components":
        g = load_graph(args.edges, directed=args.directed)
        store = (
            CheckpointStore(args.checkpoint_dir, run_id=args.run_id)
            if args.checkpoint_dir
            else None
        )
        algo = WeaklyConnectedComponents if args.directed else ConnectedComponents
        cc = algo(g, store=store).run()
        cc.get_partition().write.mode("overwrite").parquet(args.out)
        stats = {"components": cc.number_of_components()}
    elif args.job == "plp":
        g = load_graph(args.edges, directed=False)
        plp = PLP(g, max_iterations=args.max_iterations).run()
        plp.get_partition().write.mode("overwrite").parquet(args.out)
        stats = {"iterations": plp.number_of_iterations()}
    else:  # triangles
        g = load_graph(args.edges, directed=False)
        lcc = LocalClusteringCoefficient(g).run()
        lcc.triangles().write.mode("overwrite").parquet(f"{args.out}/triangles")
        lcc.scores().write.mode("overwrite").parquet(f"{args.out}/lcc")
        stats = {}

    stats.update({"job": args.job, "wall_s": round(time.time() - t0, 2)})
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
