"""N → 4N *multi-executor* scaling evidence on a local standalone
cluster (north_rule / BASELINE.md protocol, strong form).

`scaling_bench.py` emulates the two cluster sizes with local[N] thread
counts inside ONE JVM — honest about cores, but shuffles never cross a
process boundary. This script runs the same PageRank job on a real
Spark standalone cluster started in-sandbox (`spark-class
org.apache.spark.deploy.master.Master` / `...worker.Worker`), submitted
via `spark-submit --py-files` exactly as the north rule prescribes,
with `spark.executor.cores=$SPARK_GRAFT_EXEC_CORES` (default 1) so the
two levels are **N/EXEC_CORES and 4N/EXEC_CORES separate executor
JVMs** over N and 4N total cores: every shuffle serializes through
netty over loopback and the block manager, like a real cluster minus
the NIC.

Per-executor resources are held constant across levels (EXEC_CORES
cores / $SPARK_GRAFT_EXEC_MEM) — adding executors adds memory, as
adding machines does on a real cluster. When the host has enough CPUs
for disjoint sets, the worker's process tree (which spawns every
executor JVM) is cpuset-pinned to exactly `cores` host CPUs and the
driver to its own disjoint 4, so driver-side scheduling cannot absorb
the comparison; on smaller hosts pinning is skipped (and the report
says so). Shuffle/local dirs default to tmpfs and are overridable via
SPARK_GRAFT_SHUFFLE_DIR (disk-variant rows in scaling_runs.jsonl carry
"shuffle_dir_root").

Usage: python scripts/standalone_scaling_bench.py [sf_dir] [n_low] [n_high]
(defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, 2, 8)

Writes BENCH/standalone_scaling.md, appends to BENCH/scaling_runs.jsonl
with ``"mode": "standalone"``, prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__))
)
MASTER_URL = "spark://127.0.0.1:7077"
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "128"))
ITERS = 8
EXEC_MEM = os.environ.get("SPARK_GRAFT_EXEC_MEM", "8g")
# cores per executor JVM (real clusters run multi-core executors; a
# 1-core executor pays GC + shuffle serialization on its only core)
EXEC_CORES = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "1"))
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "5"))
# shuffle/local dirs root: tmpfs by default (on a real cluster 4N
# executors bring 4N node-local disks; on this one-box sandbox every
# executor shares ONE device, so tmpfs restores the per-executor-scaled
# shuffle bandwidth a cluster actually has). Set
# SPARK_GRAFT_SHUFFLE_DIR=/tmp/... to measure the shared-disk variant.
SHUFFLE_DIR_ROOT = os.environ.get("SPARK_GRAFT_SHUFFLE_DIR", "/dev/shm")
# extra spark confs for ceiling experiments, semicolon-separated k=v,
# e.g. SPARK_GRAFT_EXTRA_CONFS="spark.shuffle.compress=false;spark.serializer=org.apache.spark.serializer.KryoSerializer"
EXTRA_CONFS = [
    kv for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONFS", "").split(";") if kv
]
# shuffle-partition granularity: tasks per core (ceiling experiments —
# finer tasks smooth scheduling, coarser ones cut per-task overhead)
PARTS_PER_CORE = int(os.environ.get("SPARK_GRAFT_PARTS_PER_CORE", "4"))

# host CPUs actually available to this process — pinning assumed a
# ≥32-CPU host before; now the driver takes the LAST 4 available CPUs
# and workers pin to the first `cores`, or pinning is skipped entirely
# when the host is too small for disjoint sets
_AVAIL_CPUS = sorted(os.sched_getaffinity(0))


def _driver_pin(n_high: int) -> str | None:
    if len(_AVAIL_CPUS) >= n_high + 4:
        return ",".join(str(c) for c in _AVAIL_CPUS[-4:])
    return None


def _worker_pin(cores: int, n_high: int) -> str | None:
    if len(_AVAIL_CPUS) >= n_high + 4:
        return ",".join(str(c) for c in _AVAIL_CPUS[:cores])
    return None

JOB = r"""
import json, sys, time
sys.path.insert(0, REPO_PLACEHOLDER)
from pyspark.sql import SparkSession, functions as F
from networkit_spark import Graph, PageRank
from __spark_entry__ import directed_graph, V_BIG

cores, sf_dir, replicas, iters = CORES_PLACEHOLDER, SF_PLACEHOLDER, REPL_PLACEHOLDER, ITERS_PLACEHOLDER
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
base = directed_graph(spark, sf_dir).edges
copies = [
    base.select((F.col("src") + k * V_BIG).alias("src"),
                (F.col("dst") + k * V_BIG).alias("dst"), "weight")
    for k in range(replicas)
]
edges = copies[0]
for c in copies[1:]:
    edges = edges.unionAll(c)
g = Graph(edges.repartition(PARTS_PLACEHOLDER * cores, "src").persist(), directed=True, weighted=True)
m = g.number_of_edges()
# full-length warm pass (JIT/shuffle-path/cache), excluded from timing —
# same protocol as scripts/scaling_bench.py
pw = PageRank(g, damp=0.85, tol=0.0, norm="l1", max_iterations=iters).run()
pw.scores().write.format("noop").mode("overwrite").save()
walls = []
for _ in range(RUNS_PLACEHOLDER):
    t0 = time.time()
    pr = PageRank(g, damp=0.85, tol=0.0, norm="l1", max_iterations=iters).run()
    pr.scores().write.format("noop").mode("overwrite").save()
    walls.append(time.time() - t0)
wall = sorted(walls)[len(walls) // 2]
print("RESULT " + json.dumps({
    "executors": cores // XWIDTH_PLACEHOLDER, "exec_cores": XWIDTH_PLACEHOLDER, "edges": m,
    "iterations": pr.number_of_iterations(),
    "wall_s": round(wall, 3), "wall_s_runs": [round(w, 3) for w in walls],
    "wall_basis": f"median-of-{RUNS_PLACEHOLDER}",
    "edges_per_sec_per_iter": round(m * pr.number_of_iterations() / wall, 1),
    "edges_per_sec_per_iter_best": round(
        m * pr.number_of_iterations() / min(walls), 1),
}))
spark.stop()
"""


def _spawn(
    args: list[str],
    log: str,
    pin: str | None = None,
    local_dirs: str | None = None,
) -> subprocess.Popen:
    if pin and os.path.exists("/usr/bin/taskset"):
        args = ["/usr/bin/taskset", "-c", pin] + args
    env = dict(os.environ)
    env["SPARK_HOME"] = SPARK_HOME
    env.setdefault("SPARK_LOG_DIR", "/tmp/spark-standalone-logs")
    env.setdefault("SPARK_PID_DIR", "/tmp/spark-standalone-pids")
    env.setdefault("SPARK_WORKER_DIR", "/tmp/spark-standalone-work")
    if local_dirs:
        # the standalone Worker builds every executor's block-manager /
        # shuffle dirs under ITS local dirs (the app-level
        # spark.local.dir conf never reaches executors here), so the
        # tmpfs override must go into the worker's environment
        env["SPARK_LOCAL_DIRS"] = local_dirs
    return subprocess.Popen(
        args, stdout=open(log, "w"), stderr=subprocess.STDOUT, env=env
    )


def _wait_for(log: str, needle: str, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(log) and needle in open(log).read():
            return
        time.sleep(1.0)
    raise RuntimeError(f"'{needle}' never appeared in {log}")


def _zip_package() -> str:
    out = "/tmp/networkit_spark.zip"
    with zipfile.ZipFile(out, "w") as z:
        pkg = os.path.join(REPO, "networkit_spark")
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return out


def run_level(cores: int, n_high: int, sf_dir: str, pyzip: str) -> dict:
    wlog = f"/tmp/standalone_worker_{cores}.log"
    worker = _spawn(
        [
            os.path.join(SPARK_HOME, "bin", "spark-class"),
            "org.apache.spark.deploy.worker.Worker", MASTER_URL,
            "-c", str(cores), "-m", "96g", "-h", "127.0.0.1",
            "--webui-port", "0",
        ],
        wlog,
        pin=_worker_pin(cores, n_high),
        local_dirs=f"{SHUFFLE_DIR_ROOT}/spark-local-{cores}",
    )
    try:
        _wait_for(wlog, "Successfully registered with master")
        job = (
            JOB.replace("REPO_PLACEHOLDER", repr(REPO))
            .replace("CORES_PLACEHOLDER", str(cores))
            .replace("SF_PLACEHOLDER", repr(sf_dir))
            .replace("REPL_PLACEHOLDER", str(REPLICAS))
            .replace("ITERS_PLACEHOLDER", str(ITERS))
            .replace("XWIDTH_PLACEHOLDER", str(EXEC_CORES))
            .replace("RUNS_PLACEHOLDER", str(RUNS))
            .replace("PARTS_PLACEHOLDER", str(PARTS_PER_CORE))
        )
        job_path = f"/tmp/standalone_job_{cores}.py"
        with open(job_path, "w") as f:
            f.write(job)
        argv = [
            os.path.join(SPARK_HOME, "bin", "spark-submit"),
            "--master", MASTER_URL,
            "--py-files", pyzip,
            "--conf", f"spark.executor.cores={EXEC_CORES}",
            "--conf", f"spark.executor.memory={EXEC_MEM}",
            "--conf", f"spark.cores.max={cores}",
            "--conf", "spark.driver.memory=8g",
            # PARTS_PER_CORE partitions per core (default 4): one task
            # per slot per round makes every straggler a full-round
            # stall with single-core executors; finer tasks smooth
            # scheduling at both levels
            "--conf", f"spark.sql.shuffle.partitions={PARTS_PER_CORE * cores}",
            "--conf", "spark.sql.adaptive.enabled=true",
            # a 1-core executor has one task slot — waiting for data
            # locality just idles it
            "--conf", "spark.locality.wait=0s",
            # see SHUFFLE_DIR_ROOT comment (tmpfs default, env-overridable)
            "--conf", f"spark.local.dir={SHUFFLE_DIR_ROOT}/spark-local-{cores}",
            "--conf", "spark.ui.enabled=false",
            *[a for kv in EXTRA_CONFS for a in ("--conf", kv)],
            job_path,
        ]
        dpin = _driver_pin(n_high)
        if dpin and os.path.exists("/usr/bin/taskset"):
            argv = ["/usr/bin/taskset", "-c", dpin] + argv
        env = dict(os.environ)
        env["SPARK_HOME"] = SPARK_HOME
        out = subprocess.run(
            argv, capture_output=True, text=True, timeout=5400, env=env
        )
        lines = [
            l[len("RESULT "):]
            for l in out.stdout.splitlines()
            if l.startswith("RESULT {")
        ]
        if not lines:
            log = f"/tmp/standalone_submit_{cores}.log"
            with open(log, "w") as f:
                f.write(f"rc={out.returncode}\nSTDOUT:\n{out.stdout}\nSTDERR:\n")
                f.write("\n".join(
                    l for l in out.stderr.splitlines() if "Stage" not in l
                ))
            raise RuntimeError(
                f"standalone level (executors={cores}) produced no result; "
                f"rc={out.returncode}, log at {log}"
            )
        return json.loads(lines[-1])
    finally:
        worker.terminate()
        worker.wait(timeout=30)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    if n_low % EXEC_CORES or n_high % EXEC_CORES:
        raise SystemExit(
            f"core budgets ({n_low}, {n_high}) must be multiples of "
            f"SPARK_GRAFT_EXEC_CORES={EXEC_CORES} — 'executors' would "
            "otherwise misreport"
        )

    mlog = "/tmp/standalone_master.log"
    master = _spawn(
        [
            os.path.join(SPARK_HOME, "bin", "spark-class"),
            "org.apache.spark.deploy.master.Master",
            "-h", "127.0.0.1", "-p", "7077", "--webui-port", "0",
        ],
        mlog,
    )
    try:
        _wait_for(mlog, "started service 'sparkMaster'")
        pyzip = _zip_package()
        low = run_level(n_low, n_high, sf_dir, pyzip)
        high = run_level(n_high, n_high, sf_dir, pyzip)
    finally:
        master.terminate()
        master.wait(timeout=30)

    ratio = n_high / n_low
    eff = (high["edges_per_sec_per_iter"] / low["edges_per_sec_per_iter"]) / ratio
    eff_best = (
        high["edges_per_sec_per_iter_best"] / low["edges_per_sec_per_iter_best"]
    ) / ratio
    result = {
        "mode": "standalone",
        "sf_dir": sf_dir,
        "low": {**low, "cpus": n_low},
        "high": {**high, "cpus": n_high},
        "parallelism_ratio": ratio,
        "wall_basis": low.get("wall_basis", "median"),
        "shuffle_dir_root": SHUFFLE_DIR_ROOT,
        "extra_confs": EXTRA_CONFS,
        "parts_per_core": PARTS_PER_CORE,
        "scaling_efficiency": round(eff, 3),
        # best single run at each level (run count recorded in wall_basis)
        "scaling_efficiency_best": round(eff_best, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_runs.jsonl"), "a") as f:
        f.write(json.dumps(result) + "\n")
    x_low = n_low // EXEC_CORES
    x_high = n_high // EXEC_CORES
    pin_note = (
        "worker process tree cpuset-pinned to exactly its core budget; "
        "driver pinned to 4 disjoint CPUs at both levels"
        if _driver_pin(n_high)
        else f"host has only {len(_AVAIL_CPUS)} CPUs — pinning skipped"
    )
    with open(os.path.join(REPO, "BENCH", "standalone_scaling.md"), "w") as f:
        f.write(
            f"""# Standalone-cluster scaling run ({x_low}→{x_high} executors × {EXEC_CORES} core{'s' if EXEC_CORES > 1 else ''})

Real multi-executor evidence for the north rule's two-cluster-size
criterion: a Spark **standalone cluster** (separate master, worker, and
one JVM per executor) started in-sandbox, the job submitted with
`spark-submit --py-files networkit_spark.zip` — the exact invocation
shape the north rule prescribes. `spark.executor.cores={EXEC_CORES}`,
so the two levels are **{x_low} and {x_high} separate executor JVMs**
({n_low} vs {n_high} total cores); every shuffle crosses process
boundaries through netty + the block manager. Per-executor resources
constant ({EXEC_CORES} core{'s' if EXEC_CORES > 1 else ''} /
{EXEC_MEM}); {pin_note}. Shuffle/local dirs under `{SHUFFLE_DIR_ROOT}`
(`SPARK_GRAFT_SHUFFLE_DIR`; default tmpfs — see script header).
Extra confs: {', '.join(f'`{c}`' for c in EXTRA_CONFS) if EXTRA_CONFS else 'none'}.

Same job and input as `scaling_bench.py`: PageRank damping 0.85,
{ITERS} fixed rounds, `{sf_dir}` link graph × {REPLICAS} disjoint
shifted copies = {low['edges']:,} weighted edges; one full-length warm
pass, then the median of the timed runs (best-of alongside in the JSON).

| cluster size | iterations | wall s (runs) | edges/s per iteration |
|---|---|---|---|
| {x_low} executors (N) | {low['iterations']} | {low['wall_s']} {low['wall_s_runs']} | {low['edges_per_sec_per_iter']:,.0f} |
| {x_high} executors (4N) | {high['iterations']} | {high['wall_s']} {high['wall_s_runs']} | {high['edges_per_sec_per_iter']:,.0f} |

**Scaling efficiency (throughput_4N / throughput_N) / {ratio:.0f} =
{eff:.3f}** (median basis; best single-run = {eff_best:.3f}; target ≥ 0.8).
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
