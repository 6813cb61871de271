"""Two-parallelism scaling evidence (north_rule / BASELINE.md protocol).

No multi-node cluster exists in this sandbox, so the N → 4N executor
criterion is evidenced by running the SAME PageRank job on the SAME
input at two local parallelism levels (default local[8] vs local[32])
in separate subprocesses (fresh JVM each, no warm-cache bleed), and
reporting edges/sec per iteration at both plus

    scaling efficiency = (throughput_4N / throughput_N) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [sf_dir] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: disjoint shifted copies of the sf link graph — scales the per-round
#: compute so parallelism, not fixed scheduling overhead, dominates (the
#: protocol's "where the input is large enough" clause). Deterministic,
#: derived only from the driver-provided parquet.
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "128"))
ITERS = 8

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from networkit_spark.session import get_spark
from networkit_spark import Graph, PageRank
from __spark_entry__ import directed_graph, V_BIG

cpus = {cpus}
sf_dir = {sf_dir!r}
replicas = {replicas}
iters = {iters}
spark = get_spark("scaling-bench", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
base = directed_graph(spark, sf_dir).edges
copies = [
    base.select((F.col("src") + k * V_BIG).alias("src"),
                (F.col("dst") + k * V_BIG).alias("dst"),
                "weight")
    for k in range(replicas)
]
edges = copies[0]
for c in copies[1:]:
    edges = edges.unionAll(c)
g = Graph(edges.repartition(cpus, "src").persist(), directed=True, weighted=True)
m = g.number_of_edges()
# warm-up: one FULL-length pass, excluded from timing. A 1-iteration
# warm pass is not enough on the JVM — measured run-1 wall up to 2.4x
# run-3 within a process (C2 JIT compilation of the join/agg codegen,
# shuffle-path allocation, GC sizing). The steady state is what a
# long-running cluster job sees; the warm pass also materializes the
# persisted edge cache and degree frame.
pw = PageRank(g, damp=0.85, tol=0.0, norm="l1", max_iterations=iters).run()
pw.scores().write.format("noop").mode("overwrite").save()
walls = []
for _ in range(3):
    t0 = time.time()
    pr = PageRank(g, damp=0.85, tol=0.0, norm="l1", max_iterations=iters).run()
    pr.scores().write.format("noop").mode("overwrite").save()
    walls.append(time.time() - t0)
# aggregation basis: MEDIAN of 3 (matches the committed round-2
# artifacts and the headline 0.927 figure); the best-of-3 minimum is
# reported alongside — wall-clock noise is additive so min is a
# defensible steady-state estimate too, but the basis must be labeled
# and consistent, not silently switched between regenerations.
wall = sorted(walls)[1]
print(json.dumps({{
    "cpus": cpus, "edges": m, "iterations": pr.number_of_iterations(),
    "wall_s": round(wall, 3), "wall_s_runs": [round(w, 3) for w in walls],
    "wall_basis": "median-of-3",
    "edges_per_sec_per_iter": round(m * pr.number_of_iterations() / wall, 1),
    "edges_per_sec_per_iter_best": round(
        m * pr.number_of_iterations() / min(walls), 1),
}}))
spark.stop()
"""


def run_level(
    cpus: int,
    sf_dir: str,
    cpuset: str | None = None,
    driver_mem: str | None = None,
    replicas: int | None = None,
) -> dict:
    """One pinned child JVM at ``cpus`` parallelism. ``cpuset`` overrides
    the default ``0..cpus-1`` host-CPU pin (used by the bandwidth-fair
    concurrent protocol, where 4 children pin to disjoint core pairs);
    ``driver_mem`` overrides the 48g default (concurrent children must
    split the box's RAM)."""
    code = CHILD.format(
        repo=REPO,
        cpus=cpus,
        sf_dir=sf_dir,
        replicas=replicas if replicas is not None else REPLICAS,
        iters=ITERS,
    )
    env = dict(os.environ)
    # the replicated graph is GBs cached + shuffled; size the local JVM
    # accordingly (a real cluster sizes executors instead)
    if driver_mem is not None:
        env["SPARK_GRAFT_DRIVER_MEM"] = driver_mem
    else:
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    # Pin the whole process tree to exactly `cpus` host CPUs. Without
    # pinning, the "local[1]" leg silently borrows the other 31 host
    # cores for JVM GC, JIT-compiler, and shuffle/netty daemon threads,
    # overstating single-core throughput — a real 1-core executor gets
    # none of that. cpuset pinning is the honest emulation of an N-core
    # executor on a shared box.
    argv = [sys.executable, "-c", code]
    if os.path.exists("/usr/bin/taskset"):
        pin = cpuset or (f"0-{cpus - 1}" if cpus > 1 else "0")
        argv = ["/usr/bin/taskset", "-c", pin] + argv
    out = subprocess.run(
        argv,
        capture_output=True,
        text=True,
        timeout=3600,
        env=env,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        tag = (cpuset or "default").replace(",", "_").replace("-", "_")
        log = os.path.join("/tmp", f"scaling_child_{cpus}_{tag}.log")
        with open(log, "w") as f:
            f.write(f"rc={out.returncode}\nSTDOUT:\n{out.stdout}\nSTDERR:\n")
            f.write(
                "\n".join(
                    l for l in out.stderr.splitlines() if "Stage" not in l
                )
            )
        raise RuntimeError(
            f"scaling child (cpus={cpus}) produced no result; rc="
            f"{out.returncode}, log at {log}"
        )
    return json.loads(lines[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    low = run_level(n_low, sf_dir)
    high = run_level(n_high, sf_dir)
    ratio = n_high / n_low
    eff = (high["edges_per_sec_per_iter"] / low["edges_per_sec_per_iter"]) / ratio
    eff_best = (
        high.get("edges_per_sec_per_iter_best", high["edges_per_sec_per_iter"])
        / low.get("edges_per_sec_per_iter_best", low["edges_per_sec_per_iter"])
    ) / ratio
    result = {
        "sf_dir": sf_dir,
        "low": low,
        "high": high,
        "parallelism_ratio": ratio,
        "wall_basis": "median-of-3",
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_best_of_3": round(eff_best, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # append raw runs; BENCH/BASELINE.md is the curated summary
    with open(os.path.join(REPO, "BENCH", "scaling_runs.jsonl"), "a") as f:
        f.write(json.dumps(result) + "\n")
    with open(os.path.join(REPO, "BENCH", "scaling_last.md"), "w") as f:
        f.write(
            f"""# Last scaling run ({n_low}→{n_high} cores) — raw record

This file is overwritten by every `scripts/scaling_bench.py` run and
holds the LAST run only. The curated north-rule evidence (headline
pair, all pairs, saturation analysis) is `BENCH/BASELINE.md`.

Same job (PageRank power iteration, damping 0.85, {ITERS} fixed
rounds), same input (`{sf_dir}` link graph × {REPLICAS} disjoint
shifted copies = {low['edges']:,} weighted edges), two local parallelism
levels, fresh JVM per level, each process tree cpuset-pinned (taskset)
to exactly its core budget so GC/JIT/shuffle daemon threads cannot
borrow unaccounted host cores, caches warmed by one full-length
throwaway run before timing. Wall aggregation basis: **median of 3
timed runs** (best-of-3 shown in the JSON alongside; all raw walls in
`scaling_runs.jsonl`).

| parallelism | iterations | wall s | edges/s per iteration |
|---|---|---|---|
| local[{n_low}] (N) | {low['iterations']} | {low['wall_s']} | {low['edges_per_sec_per_iter']:,.0f} |
| local[{n_high}] (4N) | {high['iterations']} | {high['wall_s']} | {high['edges_per_sec_per_iter']:,.0f} |

**Scaling efficiency (throughput_4N / throughput_N) / {ratio:.0f} =
{eff:.3f}** (target ≥ 0.8 where input size dominates fixed overhead —
see BASELINE.md §Sandbox scaling protocol; at sf0.1 the per-iteration
fixed driver/scheduling overhead of ~10⁵-edge rounds is a large share
of wall time, so the local-mode efficiency here is a conservative lower
bound on multi-executor scaling of the shuffle-bound inner join-agg).
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
