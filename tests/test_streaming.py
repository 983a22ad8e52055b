"""Streaming tile aggregation: incremental micro-batch partials must equal
the batch aggregation exactly (the reference's associative-merge algebra,
ref: fast_carpenter/summary/binned_dataframe.py:225-238, applied to an
unbounded source)."""

import os

from pyspark.sql import functions as F

from fast_carpenter_spark import grid, synth
from fast_carpenter_spark.streaming.tile_stream import StreamingTileAgg

from conftest import SF_DIR

RES = 6


def batch_expected(spark, docs_dir):
    spark.read.parquet(docs_dir).createOrReplaceTempView("batch_docs")
    spans = spark.sql(synth.flat_spans_sql("spark", docs="batch_docs"))
    return (
        spans.withColumn("cell", F.expr(grid.cell_sql("lon", "lat", RES, "spark")))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("w").alias("w_sumw"),
            F.sum(F.col("w") * F.col("w")).alias("w_sumw2"),
        )
    )


def rows_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_equals_batch_and_is_incremental(spark, docs, tmp_path):
    input_dir = str(tmp_path / "in")
    # batch 1: first half of the documents
    docs.filter("doc_id % 2 = 0").repartition(2).write.mode("overwrite").parquet(
        input_dir
    )

    stage = StreamingTileAgg(
        name="ts",
        res=RES,
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = stage.start(spark, input_dir, available_now=True)
    q.awaitTermination(120)
    got1 = rows_sorted(stage.result(spark))
    assert got1 == rows_sorted(batch_expected(spark, input_dir))

    # batch 2: append the other half; restart drains ONLY the new files
    # (exactly-once via the stream checkpoint), totals = full table
    docs.filter("doc_id % 2 = 1").repartition(2).write.mode("append").parquet(
        input_dir
    )
    q = stage.start(spark, input_dir, available_now=True)
    q.awaitTermination(120)
    got2 = rows_sorted(stage.result(spark))

    full = str(tmp_path / "full")
    docs.write.mode("overwrite").parquet(full)
    assert got2 == rows_sorted(batch_expected(spark, full))

    # incrementality evidence: second drain added delta dirs, not rewrites
    batches = sorted(os.listdir(stage.deltas_dir))
    assert len(batches) >= 2
