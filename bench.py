#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "docs_per_sec": ...}

Scale-up: documents are replicated SPARK_GRAFT_REPL times (default 24)
with distinct doc_ids, so the flagship pipeline processes ~N*repl docs —
the deterministic stand-in for larger SF inputs.  Results are consumed by
scripts/run_scaling.py to evidence N -> 4N core scaling efficiency
(BASELINE.json north_rule; local[8] vs local[32] on this host).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

from fast_carpenter_spark import grid, synth
from fast_carpenter_spark.operators.binned import BinnedDataframeStage
from fast_carpenter_spark.operators.selection import CutFlowStage
from fast_carpenter_spark.spatial.join import SpatialJoinStage
from fast_carpenter_spark.spatial.knn import knn_bounded
from fast_carpenter_spark.queries import (
    CUTFLOW_SELECTION,
    CUTFLOW_WEIGHTS,
    REGION_RES,
    TILE_RES,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("SPARK_GRAFT_REPL", "24"))


def build_session() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("fast_carpenter_spark_bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.default.parallelism", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def replicated_documents(spark: SparkSession):
    """documents x REPL with distinct doc_ids (deterministic scale-up).

    Materialized once to a local parquet cache with a realistic partition
    layout (a 100 TB input arrives as many files); the timed queries read
    from that cache so the replication cross-join is not measured.
    """
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if REPL <= 1:
        return docs
    tag = f"{os.path.basename(os.path.normpath(SF_DIR))}_x{REPL}"
    path = os.path.join(CACHE_DIR, f"documents_{tag}.parquet")
    if not os.path.exists(path):
        (
            docs.crossJoin(spark.range(REPL).select(F.col("id").alias("_rep")))
            .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * F.lit(10_000_019))
            .drop("_rep")
            .repartition(128, "doc_id")
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def sink(df) -> int:
    """Force full execution without driver materialization."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    docs = replicated_documents(spark)
    docs.createOrReplaceTempView("documents")
    n_docs = docs.count()

    spans = spark.sql(synth.flat_spans_sql("spark"))
    polys = synth.polygons()

    timings: dict[str, float] = {}
    n_runs = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))

    def run(name: str, df) -> None:
        best = float("inf")
        for _ in range(n_runs):  # min-of-N damps codegen/GC/page-cache noise
            t0 = time.time()
            sink(df)
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # Each query DataFrame is constructed ONCE (a production pipeline plans
    # once and executes over many partitions; re-planning per run would just
    # re-measure codegen compilation).

    # q1 FLAGSHIP: cell encode -> spatial join (cover + PIP refine) -> tile agg
    joined = (
        SpatialJoinStage(name="sj", polygons=polys).apply(spans)
        .withColumn("cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")))
        .withColumn("pw", F.col("w") * F.col("weight"))
    )
    q1 = BinnedDataframeStage(
        name="tiles", binning=[{"in": "region"}, {"in": "cell"}], weights={"pw": "pw"}
    ).apply(joined)

    # q2: dense tile aggregation at res 8 over all spans
    q2 = BinnedDataframeStage(
        name="t", binning=[{"in": "cell"}], weights={"w": "w"}
    ).apply(spans.withColumn("cell", F.expr(grid.cell_sql("lon", "lat", TILE_RES, "spark"))))

    # q3: cutflow counters (single-pass aggregation over the whole table)
    q3 = CutFlowStage(
        name="cf", selection=CUTFLOW_SELECTION, weights=CUTFLOW_WEIGHTS
    ).counters(spans)

    # q4: kNN neighbor lists over doc representative points.
    # Scale path: density-adaptive resolution + per-cell local search
    # (hot-cell skew stays node-local; see spatial/knn.py knn_local).
    from fast_carpenter_spark.spatial.knn import auto_res, knn_local

    q4 = knn_local(
        spans.filter("span_idx = 0").select("doc_id", "lon", "lat"),
        res=auto_res(n_docs), ring=1, k=3,
    )

    # q5: salted-shuffle spatial join variant (hot-tile path)
    q5 = SpatialJoinStage(
        name="sj", polygons=polys, strategy="salted", nsalt=CPUS
    ).apply(spans).groupBy("region").count()

    # warmup: JIT/codegen compile + parquet footer reads (not timed as a query)
    sink(spans.limit(10_000).select("doc_id", "lon", "lat"))

    t_all0 = time.time()
    run("q1_pip_tile_agg", q1)
    run("q2_tile_agg", q2)
    run("q3_cutflow", q3)
    run("q4_knn", q4)
    run("q5_salted_join", q5)
    total = round(time.time() - t_all0, 3)

    flagship_docs_per_sec = round(n_docs / timings["q1_pip_tile_agg"], 1)
    print(
        json.dumps(
            {
                "metric": "spatial-join+tile-binning headline suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cpus": CPUS,
                "repl": REPL,
                "n_docs": n_docs,
                "docs_per_sec": flagship_docs_per_sec,
            }
        )
    )


if __name__ == "__main__":
    main()
