"""Structured-Streaming STREAM-STREAM interval join — the one SS operator
family the delta-partials modules don't touch, exercised natively.

Two unbounded streams (views, clicks — both carved from the events
stream) joined on user_id with a bounded time predicate
``view_ts < click_ts <= view_ts + window``.  Unlike the foreachBatch
modules, state here lives in Spark's streaming state store: each side
buffers rows until the OTHER side's watermark passes the join window, at
which point the row can never match again and is evicted — the watermark
is what makes an unbounded-stream join finite-state.  That eviction bound
is the 100 TB property: state size ~ (event rate x join window), NOT the
stream length.

Correctness gate: drained with availableNow the inner join emits exactly
the batch join's rows (no row can be dropped by the watermark when every
row is present before termination), so the DuckDB batch oracle applies
bit-exactly — same standard as every other streaming query here.

ref note: the reference has no streaming at all (chunk iteration is
synchronous, ref: fast_carpenter/backends/_alphatwirl.py:81-86); this
extends the engine's streaming surface beyond it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class StreamingIntervalJoin:
    """views ⋈ clicks per user within ``window_minutes`` — append sink."""

    name: str
    out_dir: str = "/tmp/fcs_ssj_out"
    checkpoint_dir: str = "/tmp/fcs_ssj_ckpt"
    watermark: str = "2 hours"
    window_minutes: int = 60

    @property
    def sink_dir(self) -> str:
        return os.path.join(self.out_dir, "joined")

    def start(self, spark: SparkSession, input_dir: str, *, available_now: bool = True):
        schema = spark.read.parquet(input_dir).schema
        # ts is TIMESTAMP_NTZ but watermarks require TIMESTAMP (LTZ):
        # rebuild the instant from exact epoch micros (timestamp_micros),
        # which is session-timezone-independent — the NTZ wall time is
        # treated as UTC, consistently on both sides of the join
        event_time = (
            "timestamp_micros(CAST(timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS BIGINT))"
        )
        # two independent file-source streams over the same directory —
        # genuinely two streaming relations, not a self-join of one
        views = (
            spark.readStream.schema(schema).parquet(input_dir)
            .filter("event_type = 'view'")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id"),
                F.expr(event_time).alias("view_ts"),
            )
            .withWatermark("view_ts", self.watermark)
        )
        clicks = (
            spark.readStream.schema(schema).parquet(input_dir)
            .filter("event_type = 'click'")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("click_user"),
                F.expr(event_time).alias("click_ts"),
            )
            .withWatermark("click_ts", self.watermark)
        )
        joined = views.join(
            clicks,
            F.expr(
                f"user_id = click_user AND click_ts > view_ts "
                f"AND click_ts <= view_ts + interval {self.window_minutes} minutes"
            ),
        ).select(
            "user_id",
            "view_id",
            "click_id",
            # exact integer gap (hash-identical across engines)
            F.expr("timestampdiff(MICROSECOND, view_ts, click_ts)")
            .cast("long")
            .alias("gap_us"),
        )
        writer = (
            joined.writeStream.format("parquet")
            .option("path", self.sink_dir)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def result(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.sink_dir)


def interval_join_oracle_sql(*, window_minutes: int = 60) -> str:
    return f"""
SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
FROM events v
JOIN events c
  ON c.user_id = v.user_id
 AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL {window_minutes} MINUTE
WHERE v.event_type = 'view' AND c.event_type = 'click'
"""
