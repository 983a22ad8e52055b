#!/usr/bin/env python
"""Diagnose flagship-query scaling: time q1 alone at $SPARK_GRAFT_CPUS."""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F

from fast_carpenter_spark import grid, synth
from fast_carpenter_spark.operators.binned import BinnedDataframeStage
from fast_carpenter_spark.spatial.join import SpatialJoinStage
from fast_carpenter_spark.queries import REGION_RES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("SPARK_GRAFT_REPL", "24"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("diag")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.default.parallelism", str(CPUS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import bench  # reuse replication cache

docs = bench.replicated_documents(spark)
docs.createOrReplaceTempView("documents")
t0 = time.time(); n = docs.count(); print(f"count {n} in {time.time()-t0:.2f}s")

spans = spark.sql(synth.flat_spans_sql("spark"))
polys = synth.polygons()

joined = (
    SpatialJoinStage(name="sj", polygons=polys).apply(spans)
    .withColumn("cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")))
    .withColumn("pw", F.col("w") * F.col("weight"))
)
q1 = BinnedDataframeStage(
    name="tiles", binning=[{"in": "region"}, {"in": "cell"}], weights={"pw": "pw"}
).apply(joined)

for i in range(3):
    t0 = time.time()
    q1.write.format("noop").mode("overwrite").save()
    print(f"run{i}: {time.time()-t0:.3f}s")
