"""Structured-Streaming exact deduplication over an unbounded corpus.

The training-data dedup pipeline's streaming half: new documents arrive
continuously and the dedup table (fingerprint -> canonical id, multiplicity)
must stay current.  Spark's built-in ``dropDuplicates`` keeps every key in
the state store forever; ``dropDuplicatesWithinWatermark`` bounds state but
forgets old keys — neither matches the dedup-table semantics.  What does is
the engine's delta-partials algebra (streaming/tile_stream.py): exact dedup
is a hash aggregation, and hash aggregations have associative partials:

    per micro-batch:  (fingerprint, min doc_id, count)     -- map-side small
    read-time merge:  min of mins, sum of counts           -- associative

* micro-batch partials are appended as parquet deltas keyed by batch id,
  overwritten on replay — idempotent, exactly-once downstream;
* state never lives in executor memory: the "state" IS the delta store,
  object-store friendly at 10^12 docs;
* the fingerprint is the same Arrow rolling-hash kernel as the batch path
  (functions/dedup.py exact_dedup), so batch and stream cannot drift: a
  drained stream must equal the batch dedup table bit-for-bit (same
  DuckDB oracle).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.dedup import exact_dedup


@dataclass
class StreamingExactDedup:
    """Streaming duplicate-group table over a documents directory."""

    name: str
    out_dir: str = "/tmp/fcs_dedup_stream_out"
    checkpoint_dir: str = "/tmp/fcs_dedup_stream_ckpt"
    text_col: str = "text"

    @property
    def deltas_dir(self) -> str:
        return os.path.join(self.out_dir, "deltas")

    def start(self, spark: SparkSession, input_dir: str, *, available_now: bool = True):
        """Start the stream.  ``available_now=True`` drains what exists and
        stops (test/backfill mode); False runs continuously."""
        schema = spark.read.parquet(input_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(input_dir)
        )

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                exact_dedup(batch_df, text_col=self.text_col)
                .withColumn("_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .parquet(os.path.join(self.deltas_dir, f"batch={batch_id}"))
            )

        writer = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def result(self, spark: SparkSession) -> DataFrame:
        """Read-time associative merge: the current dedup table."""
        deltas = spark.read.option("recursiveFileLookup", "true").parquet(
            self.deltas_dir
        )
        return deltas.groupBy("fingerprint").agg(
            F.min("canonical_doc_id").alias("canonical_doc_id"),
            F.sum("n_dups").alias("n_dups"),
        )
