"""Structured-Streaming gap sessionization over an unbounded event log.

Spark ships ``session_window`` for streaming sessionization, but its output
carries only the window bounds — not the per-user running session index the
batch operator emits (queries.q_events_sessionize), and its state lives in
the executor state store.  This stage instead extends the engine's
delta-partials algebra (streaming/tile_stream.py, dedup_stream.py) to a
NON-commutative aggregation: sessions don't merge by key equality, they
merge by *temporal adjacency*.

    per micro-batch:  sessionize within the batch -> session FRAGMENTS
                      (user_id, n_events, start_us, end_us, value_sum)
    read-time merge:  sort each user's fragments by start; fuse neighbours
                      with gap <= threshold; renumber -> session_id

The merge is exact — equal to batch sessionization of the full log —
PROVIDED each micro-batch is a contiguous time slice (per user, no event
interleaving across batches).  The file source guarantees that when the
input files are themselves time-range slices and ``maxFilesPerTrigger=1``:
each batch is one slice, and slice PROCESSING ORDER does not matter because
the read-time merge sorts fragments by start time (out-of-order backfill
is safe — the same property object-store event-log compaction needs).

State never lives in executor memory: the delta store IS the state,
bounded by (users x slices), idempotent per batch id, exactly-once
downstream — at 10^12 events the fragments table is the compacted form a
production pipeline would keep anyway.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _with_us(ev: DataFrame) -> DataFrame:
    # timestampdiff from a pinned origin: epoch on TIMESTAMP_NTZ without
    # session-timezone dependence (unix_micros rejects NTZ inputs).
    return ev.withColumn(
        "us",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"),
    )


def session_fragments(ev: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Sessionize WITHIN one slice: (user_id, n_events, start_us, end_us,
    value_sum) per maximal run of events with inter-event gap <= gap_us."""
    order = W.partitionBy("user_id").orderBy("us", "event_id")
    new_sess = F.when(F.col("us") - F.lag("us").over(order) > gap_us, 1).otherwise(
        F.when(F.lag("us").over(order).isNull(), 1).otherwise(0)
    )
    runsum = order.rowsBetween(W.unboundedPreceding, 0)
    sess = _with_us(ev).withColumn("frag", F.sum(new_sess).over(runsum))
    return sess.groupBy("user_id", "frag").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        F.sum("value").alias("value_sum"),
    ).drop("frag")


def merge_fragments(frags: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Fuse temporally-adjacent fragments per user and renumber sessions.
    Associative over contiguous slices; fragment arrival order irrelevant."""
    order = W.partitionBy("user_id").orderBy("start_us", "end_us")
    new_sess = F.when(
        F.col("start_us") - F.lag("end_us").over(order) > gap_us, 1
    ).otherwise(F.when(F.lag("end_us").over(order).isNull(), 1).otherwise(0))
    runsum = order.rowsBetween(W.unboundedPreceding, 0)
    fused = frags.withColumn("session_id", F.sum(new_sess).over(runsum))
    return fused.groupBy("user_id", "session_id").agg(
        F.sum("n_events").alias("n_events"),
        F.min("start_us").alias("sess_start_us"),
        F.max("end_us").alias("sess_end_us"),
        F.sum("value_sum").alias("value_sum"),
    )


@dataclass
class StreamingSessionize:
    """Streaming session table over a time-sliced events directory."""

    name: str
    out_dir: str = "/tmp/fcs_sess_stream_out"
    checkpoint_dir: str = "/tmp/fcs_sess_stream_ckpt"
    gap_us: int = SESSION_GAP_US

    @property
    def deltas_dir(self) -> str:
        return os.path.join(self.out_dir, "deltas")

    def start(self, spark: SparkSession, input_dir: str, *, available_now: bool = True):
        schema = spark.read.parquet(input_dir).schema
        stream = (
            spark.readStream.schema(schema)
            # one slice per micro-batch: the contiguity precondition
            .option("maxFilesPerTrigger", 1)
            .parquet(input_dir)
        )

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                session_fragments(batch_df, self.gap_us)
                .withColumn("_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .parquet(os.path.join(self.deltas_dir, f"batch={batch_id}"))
            )

        writer = stream.writeStream.foreachBatch(write_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def result(self, spark: SparkSession) -> DataFrame:
        frags = spark.read.option("recursiveFileLookup", "true").parquet(
            self.deltas_dir
        )
        return merge_fragments(frags.drop("_batch"), self.gap_us)
