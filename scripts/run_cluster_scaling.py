#!/usr/bin/env python
"""N -> 4N *executor* scaling on a real spark:// standalone cluster.

Every throughput number so far compares local[N] thread counts; the
round-5 cluster smoke (run_cluster_smoke.py) proved multi-executor
correctness but measured no scaling.  This harness runs the north-rule
criterion as literally as one host allows: the SAME flagship job
(spatial join + tile binning, BASELINE.json metric) submitted to a real
standalone master at TWO cluster sizes —

  N  = 1 executor  x 4 cores   (one  worker JVM, taskset cores 0-3)
  4N = 4 executors x 4 cores   (four worker JVMs, taskset cores 0-3 /
                                4-7 / 8-11 / 12-15)

Each worker JVM is pinned to its own disjoint 4-core slice, so "adding
an executor" genuinely adds silicon the small cluster never touches —
the single-host analog of a node bringing its own cores.  The driver
process (this script's level subprocess, and the JVM + Arrow workers it
spawns) is pinned to cores 16-31, OFF the executor slices, because on a
real cluster the driver does not share a socket with the workers.
Executors exchange shuffle blocks and broadcasts over real sockets via
each worker's shuffle server — coordination costs local[N] never pays.

Protocol per batch (alternated, contemporaneous, resumable like
run_scaling_batched.py): ALU-ceiling calibration at 4 vs 16 pinned
procs, then the 1-executor level, then the 4-executor level; each level
is a fresh driver subprocess against freshly started workers, warmed to
JIT convergence, best-sustained (min) of RUNS timed runs on the
pre-materialized 28.8M-doc parquet cache (same input as the local[4] vs
local[16] series in BENCH/scaling_batched_n4x16.json, so the two
protocols are directly comparable).

  raw_eff[b]    = (T_1exec / T_4exec) / 4
  engine_eff[b] = raw_eff[b] / alu_eff[b]

Weak mode (--weak): the input grows with the executor count (7.2M docs
at 1 executor vs 28.8M at 4 — per-core-exact, same protocol as
scaling_batched_n4x16_weak.json), so raw efficiency is the plain time
ratio T_small / T_big and the cross-level digest check is skipped (the
inputs differ by construction).

Usage:
  python scripts/run_cluster_scaling.py [n_batches] [--weak]  # orchestrate
  python scripts/run_cluster_scaling.py level <master> <n_exec>  # internal
Writes BENCH/cluster_scaling[_weak].json (+ per-phase cache files
BENCH/cluster_batch_<b>_*.json / cluster_batch_w<b>_*.json).
"""

from __future__ import annotations

import json
import os
import socket
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
OUT_DIR = os.path.join(REPO, "BENCH")

CORES_PER_EXEC = 4
N_EXEC_SMALL = 1
N_EXEC_BIG = 4
REPL = os.environ.get("SPARK_GRAFT_REPL", "5760")  # 28.8M docs at sf0.1
RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
MASTER_PORT = 7077
DRIVER_CORES = "16-31"  # off the executor slices


# ---------------------------------------------------------------------------
# Level runner (subprocess): one driver app against a running cluster.
# ---------------------------------------------------------------------------

def run_level_app(master: str, n_exec: int) -> None:
    """Run the flagship at n_exec executors; print one JSON line."""
    try:  # driver + its JVM/Arrow children stay off the worker slices
        os.sched_setaffinity(0, set(range(16, 32)))
    except (AttributeError, OSError):
        pass

    from pyspark.sql import SparkSession, functions as F

    import bench
    from fast_carpenter_spark import grid, synth
    from fast_carpenter_spark.operators.binned import BinnedDataframeStage
    from fast_carpenter_spark.spatial.join import SpatialJoinStage
    from fast_carpenter_spark.queries import REGION_RES

    total_cores = n_exec * CORES_PER_EXEC
    spark = (
        SparkSession.builder.master(master)
        .appName(f"fcs_cluster_scaling_{n_exec}x{CORES_PER_EXEC}")
        .config("spark.sql.shuffle.partitions", str(total_cores))
        .config("spark.default.parallelism", str(total_cores))
        .config("spark.executor.cores", str(CORES_PER_EXEC))
        .config("spark.executor.memory", "6g")
        .config("spark.cores.max", str(total_cores))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for _ in range(240):  # executor registration is async; wait for all
            infos = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
            if len(infos) - 1 >= n_exec:  # minus driver
                break
            time.sleep(0.5)
        else:
            raise RuntimeError(f"only {len(infos) - 1}/{n_exec} executors registered")

        saved = bench.REPL
        bench.REPL = int(REPL)
        docs = bench.replicated_documents(spark)  # pre-materialized cache
        bench.REPL = saved
        n_docs = docs.count()
        polys = synth.polygons()

        def flagship():
            docs.createOrReplaceTempView("documents")
            spans = spark.sql(synth.flat_spans_sql("spark"))
            joined = (
                SpatialJoinStage(name="sj", polygons=polys).apply(spans)
                .withColumn(
                    "cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark"))
                )
                .withColumn("pw", F.col("w") * F.col("weight"))
            )
            return BinnedDataframeStage(
                name="tiles",
                binning=[{"in": "region"}, {"in": "cell"}],
                weights={"pw": "pw"},
            ).apply(joined)

        # identical-plan warmup on a small replica, then full-size untimed
        # runs until JIT-converged (same protocol as scaling_worker.py)
        bench.REPL = 480
        small = bench.replicated_documents(spark)
        bench.REPL = saved
        small.createOrReplaceTempView("documents")
        for _ in range(2):
            spans = spark.sql(synth.flat_spans_sql("spark"))
            j = (
                SpatialJoinStage(name="sj", polygons=polys).apply(spans)
                .withColumn(
                    "cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark"))
                )
                .withColumn("pw", F.col("w") * F.col("weight"))
            )
            bench.sink(
                BinnedDataframeStage(
                    name="tiles",
                    binning=[{"in": "region"}, {"in": "cell"}],
                    weights={"pw": "pw"},
                ).apply(j)
            )
        prev = None
        for _ in range(5):
            t0 = time.time()
            bench.sink(flagship())
            dt = time.time() - t0
            if prev is not None and dt < prev * 1.15:
                break
            prev = dt

        times = []
        for _ in range(RUNS):
            df = flagship()
            t0 = time.time()
            bench.sink(df)
            times.append(round(time.time() - t0, 3))

        best = min(times)
        rows = flagship().orderBy("region", "cell").collect()
        # stable across processes (levels run in separate subprocesses, so
        # Python's randomized str hash would spuriously mismatch)
        import hashlib

        digest = repr(
            [(r["region"], r["cell"], r["n"], round(r["pw_sumw"], 6)) for r in rows]
        ).encode()
        print(
            json.dumps(
                {
                    "n_exec": n_exec,
                    "cores_per_exec": CORES_PER_EXEC,
                    "n_docs": n_docs,
                    "times": times,
                    "min_sec": best,
                    "median_sec": round(statistics.median(times), 3),
                    "docs_per_sec": round(n_docs / best, 1),
                    "n_rows": len(rows),
                    "digest_hash": hashlib.sha256(digest).hexdigest()[:16],
                }
            )
        )
    finally:
        spark.stop()


# ---------------------------------------------------------------------------
# Orchestrator: master/worker lifecycle + batched measurement.
# ---------------------------------------------------------------------------

def _wait_port(port: int, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.5)
    raise RuntimeError(f"port {port} never opened")


def _spark_env() -> dict:
    import pyspark

    spark_home = os.path.dirname(pyspark.__file__)
    return dict(
        os.environ,
        SPARK_HOME=spark_home,
        SPARK_LOG_DIR="/tmp/fcs_cluster_logs",
        SPARK_WORKER_DIR="/tmp/fcs_cluster_work",
        SPARK_NO_DAEMONIZE="1",
    ), os.path.join(spark_home, "bin", "spark-class")


def _start_workers(master: str, n_workers: int) -> list:
    env, spark_class = _spark_env()
    procs = []
    for i in range(n_workers):
        lo, hi = i * CORES_PER_EXEC, (i + 1) * CORES_PER_EXEC - 1
        cmd = [
            "/usr/bin/taskset", "-c", f"{lo}-{hi}",
            spark_class, "org.apache.spark.deploy.worker.Worker",
            master, "--cores", str(CORES_PER_EXEC), "--memory", "8g",
            "--webui-port", "0",
        ]
        if not os.path.exists("/usr/bin/taskset"):
            cmd = cmd[3:]
        procs.append(
            subprocess.Popen(
                cmd, env=env,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        )
    return procs


def _stop(procs: list) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=15)
        except subprocess.TimeoutExpired:
            p.kill()


def run_level(master: str, n_exec: int, repl: str = REPL) -> dict:
    workers = _start_workers(master, n_exec)
    try:
        time.sleep(4)
        cmd = [sys.executable, os.path.abspath(__file__), "level", master, str(n_exec)]
        out = subprocess.run(
            cmd,
            env=dict(os.environ, SPARK_GRAFT_REPL=repl),
            capture_output=True, text=True, timeout=3600,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        raise RuntimeError(f"level failed:\n{out.stdout}\n{out.stderr}")
    finally:
        _stop(workers)


def _cached(tag: str, fn):
    path = os.path.join(OUT_DIR, f"cluster_batch_{tag}.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    out = fn()
    with open(path, "w") as f:
        json.dump(out, f)
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "level":
        run_level_app(sys.argv[2], int(sys.argv[3]))
        return

    import run_scaling as rs

    os.makedirs(OUT_DIR, exist_ok=True)
    weak = "--weak" in sys.argv
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_batches = int(pos[0]) if pos else 3
    n_small_cores = N_EXEC_SMALL * CORES_PER_EXEC
    n_big_cores = N_EXEC_BIG * CORES_PER_EXEC
    ratio = n_big_cores / n_small_cores

    env, spark_class = _spark_env()
    os.makedirs("/tmp/fcs_cluster_logs", exist_ok=True)
    master_proc = subprocess.Popen(
        [
            spark_class, "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", str(MASTER_PORT),
            "--webui-port", "0",
        ],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    master = f"spark://127.0.0.1:{MASTER_PORT}"
    batches = []
    try:
        _wait_port(MASTER_PORT)
        rs.N_SMALL, rs.N_BIG = n_small_cores, n_big_cores
        small_repl = str(int(int(REPL) / ratio)) if weak else REPL
        for b in range(n_batches):
            tag = f"w{b}" if weak else str(b)
            print(f"[cluster-scaling] === batch {tag} ===", file=sys.stderr, flush=True)
            alu = _cached(f"{tag}_alu", lambda: rs.hw_ceiling(rs._burn_alu))
            small = _cached(
                f"{tag}_small", lambda: run_level(master, N_EXEC_SMALL, small_repl)
            )
            big = _cached(f"{tag}_big", lambda: run_level(master, N_EXEC_BIG))
            if not weak and small["digest_hash"] != big["digest_hash"]:
                raise SystemExit(
                    f"batch {b}: 1-exec vs 4-exec result digests DIFFER"
                )
            # weak mode: the input already grew with the executor count, so
            # efficiency is the plain time ratio
            raw = (
                small["min_sec"] / big["min_sec"]
                if weak
                else (small["min_sec"] / big["min_sec"]) / ratio
            )
            batches.append(
                {
                    "batch": b,
                    "alu_eff": alu["throughput_eff"],
                    "runs_small": small["times"],
                    "runs_big": big["times"],
                    "min_small_sec": small["min_sec"],
                    "min_big_sec": big["min_sec"],
                    "raw_eff": round(raw, 3),
                    "engine_eff": round(raw / alu["throughput_eff"], 3),
                    "docs_per_sec_small": small["docs_per_sec"],
                    "docs_per_sec_big": big["docs_per_sec"],
                    "n_docs_small": small["n_docs"],
                    "n_docs_big": big["n_docs"],
                    "digest_hash": small["digest_hash"],
                }
            )
            print(f"[cluster-scaling] batch {tag}: {batches[-1]}",
                  file=sys.stderr, flush=True)
    finally:
        _stop([master_proc])

    def band(key):
        vals = sorted(x[key] for x in batches)
        return {
            "min": vals[0],
            "median": round(statistics.median(vals), 3),
            "max": vals[-1],
        }

    all_small = min(t for x in batches for t in x["runs_small"])
    all_big = min(t for x in batches for t in x["runs_big"])
    mode = (
        "weak (input grows with executors; raw = plain time ratio)"
        if weak
        else "strong (same input both levels; raw = time ratio / core ratio)"
    )
    result = {
        "protocol": (
            f"real spark:// standalone cluster, {mode}; {n_batches} alternated "
            f"batches of (ALU ceiling, {N_EXEC_SMALL} executor x {CORES_PER_EXEC} "
            f"cores, {N_EXEC_BIG} executors x {CORES_PER_EXEC} cores); each "
            f"worker JVM taskset-pinned to its own disjoint {CORES_PER_EXEC}-core "
            f"slice, driver pinned to cores {DRIVER_CORES}; fresh worker JVMs + "
            f"fresh driver app per level, JIT-converged warmup, min of {RUNS} runs"
            + (
                ""
                if weak
                else "; same 28.8M-doc input as scaling_batched_n4x16.json; "
                "result digests compared across levels every batch"
            )
        ),
        "n_exec_small": N_EXEC_SMALL,
        "n_exec_big": N_EXEC_BIG,
        "cores_per_exec": CORES_PER_EXEC,
        "repl": int(REPL),
        "n_docs_small": batches[0]["n_docs_small"],
        "n_docs_big": batches[0]["n_docs_big"],
        "batches": batches,
        "band_raw_eff": band("raw_eff"),
        "band_alu_eff": band("alu_eff"),
        "band_engine_eff": band("engine_eff"),
        "best_sustained_raw_eff": round(
            (all_small / all_big) if weak else (all_small / all_big) / ratio, 3
        ),
        "results_identical_across_levels": None if weak else True,
    }
    name = "cluster_scaling_weak.json" if weak else "cluster_scaling.json"
    with open(os.path.join(OUT_DIR, name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
