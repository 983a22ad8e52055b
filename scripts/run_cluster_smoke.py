#!/usr/bin/env python
"""Standalone-cluster smoke (round-5; VERDICT r4 item 3b).

Every scaling number so far comes from local[N] — one JVM whose N task
threads share a heap, a shuffle service, and a Python-worker pool.  A
real N -> 4N scale-out adds EXECUTORS: separate JVMs with their own
heaps, shuffle files served over the wire, and broadcast variables that
must actually cross process boundaries.  This script evidences that
executor model with what the sandbox has: a real `spark://` standalone
master on localhost plus TWO separate worker JVMs (each N cores), and the
flagship job submitted against it with 2 executors.

What it proves (and what it can't): the engine's plan — broadcast
polygon side, partial agg before the one data-sized exchange, no
driver-side loops — runs UNCHANGED and CORRECT under multi-executor
shuffle/broadcast (results identical to local mode), and the 2-executor
wall time is reported next to a same-input local[2N] run for context.
It can NOT say anything new about the hypervisor's core-scaling ceiling
— both executors still share this one socket, so the banded local[N]
protocol in run_scaling_batched.py remains the throughput evidence.

Usage:  python scripts/run_cluster_smoke.py [cores_per_worker] [repl]
Writes BENCH/cluster_smoke.json.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark

SPARK_HOME = os.path.dirname(pyspark.__file__)
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPL = sys.argv[2] if len(sys.argv) > 2 else "480"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MASTER_PORT = 7077


def _wait_port(port: int, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.5)
    raise RuntimeError(f"port {port} never opened")


def _spawn(args: list[str], env: dict) -> subprocess.Popen:
    return subprocess.Popen(
        [SPARK_CLASS] + args,
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def run_flagship(master: str, n_exec: int, cores: int) -> dict:
    """Run the flagship pipeline against ``master``; return rows + timing."""
    from pyspark.sql import SparkSession, functions as F

    from fast_carpenter_spark import grid, synth
    from fast_carpenter_spark.operators.binned import BinnedDataframeStage
    from fast_carpenter_spark.spatial.join import SpatialJoinStage
    from fast_carpenter_spark.queries import REGION_RES

    total_cores = n_exec * cores
    b = (
        SparkSession.builder.master(master)
        .appName("fcs_cluster_smoke")
        .config("spark.sql.shuffle.partitions", str(total_cores))
        .config("spark.default.parallelism", str(total_cores))
        .config("spark.executor.cores", str(cores))
        .config("spark.executor.memory", "8g")
        .config("spark.cores.max", str(total_cores))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        n_execs_seen = None
        if master.startswith("spark://"):
            # executor registration is async; wait for both
            for _ in range(120):
                infos = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
                n_execs_seen = len(infos) - 1  # minus driver
                if n_execs_seen >= n_exec:
                    break
                time.sleep(0.5)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        docs = (
            docs.crossJoin(spark.range(int(REPL)).select(F.col("id").alias("_rep")))
            .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * F.lit(10_000_019))
            .drop("_rep")
        )
        docs.createOrReplaceTempView("documents")

        def flagship():
            spans = spark.sql(synth.flat_spans_sql("spark"))
            joined = (
                SpatialJoinStage(name="sj", polygons=synth.polygons()).apply(spans)
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

        flagship().write.format("noop").mode("overwrite").save()  # warmup
        t0 = time.time()
        flagship().write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        rows = flagship().orderBy("region", "cell").collect()
        digest = [
            (r["region"], r["cell"], r["n"], round(r["pw_sumw"], 6)) for r in rows
        ]
        return {
            "master": master,
            "executors_seen": n_execs_seen,
            "wall_sec": round(wall, 3),
            "n_rows": len(rows),
            "digest_hash": hash(tuple(digest)) & 0xFFFFFFFFFFFF,
            "digest_head": digest[:3],
        }
    finally:
        spark.stop()


def main() -> None:
    env = dict(
        os.environ,
        SPARK_HOME=SPARK_HOME,
        SPARK_LOG_DIR="/tmp/fcs_cluster_logs",
        SPARK_WORKER_DIR="/tmp/fcs_cluster_work",
        SPARK_NO_DAEMONIZE="1",
    )
    procs = []
    try:
        print("[smoke] starting standalone master ...", file=sys.stderr, flush=True)
        procs.append(
            _spawn(
                [
                    "org.apache.spark.deploy.master.Master",
                    "--host", "127.0.0.1", "--port", str(MASTER_PORT),
                    "--webui-port", "0",
                ],
                env,
            )
        )
        _wait_port(MASTER_PORT)
        master = f"spark://127.0.0.1:{MASTER_PORT}"
        for i in range(2):
            print(f"[smoke] starting worker {i} ({CORES} cores) ...",
                  file=sys.stderr, flush=True)
            procs.append(
                _spawn(
                    [
                        "org.apache.spark.deploy.worker.Worker",
                        master, "--cores", str(CORES), "--memory", "12g",
                        "--webui-port", "0",
                    ],
                    env,
                )
            )
        time.sleep(5)

        cluster = run_flagship(master, n_exec=2, cores=CORES)
        print(f"[smoke] cluster run: {cluster}", file=sys.stderr, flush=True)
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()

    local = run_flagship(f"local[{2 * CORES}]", n_exec=1, cores=2 * CORES)
    print(f"[smoke] local control: {local}", file=sys.stderr, flush=True)

    ok = (
        cluster["n_rows"] == local["n_rows"]
        and cluster["digest_hash"] == local["digest_hash"]
    )
    out = {
        "protocol": (
            f"standalone master + 2 worker JVMs x {CORES} cores on localhost; "
            f"flagship at REPL={REPL} submitted with 2 executors; result digest "
            f"compared against a local[{2 * CORES}] control run on the same input"
        ),
        "cluster": cluster,
        "local_control": local,
        "results_identical": ok,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "cluster_smoke.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    if not ok:
        raise SystemExit("cluster vs local results DIFFER")


if __name__ == "__main__":
    main()
