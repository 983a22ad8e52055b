"""Structured-Streaming tile aggregation — the BinnedDataframe re-expressed
over an unbounded documents stream.

The reference is batch-only (chunk iteration is synchronous,
ref: fast_carpenter/backends/_alphatwirl.py:81-86), but its merge algebra —
associative partial histograms (ref:
fast_carpenter/summary/binned_dataframe.py:225-238) — is exactly what a
streaming sink needs: each micro-batch produces a per-(cell) partial that is
merged into the running state.

Spark-first shape:

* ``readStream`` on the snapshot/table directory (file source here; a Kafka
  or Iceberg-CDC source is a ``format()`` swap);
* the same codegen'd span derivation + cell encode as the batch engine
  (one code path, no drift);
* ``foreachBatch`` writes each micro-batch's *partial* aggregate as an
  append-only parquet delta keyed by batch id — idempotent under replays
  (overwrite by batch-id partition), exactly the checkpoint ledger algebra
  of checkpoint.py;
* the queryable result is a tiny read-time merge: ``groupBy(cell).sum(...)``
  over the deltas — the associative final merge.

This "delta partials + read-time merge" pattern scales: state never lives
in executor memory (no unbounded streaming-state store), hot cells cost one
extra sum at read, and the sink stays append-only — object-store friendly
at 10^12-doc scale.  For bounded-lateness use cases, add
``withWatermark("event_time", ...)`` + update-mode aggregation instead.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import grid, synth


@dataclass
class StreamingTileAgg:
    """Streaming per-cell tile aggregation over a documents directory."""

    name: str
    res: int = 8
    out_dir: str = "/tmp/fcs_stream_out"
    checkpoint_dir: str = "/tmp/fcs_stream_ckpt"

    @property
    def deltas_dir(self) -> str:
        return os.path.join(self.out_dir, "deltas")

    def _tile_partial(self, docs: DataFrame) -> DataFrame:
        """documents (micro-batch or batch) -> per-cell partial aggregate.
        Identical derivation to the batch engine's q2 (queries.py
        q_tile_agg): span explode + geometry + cell encode + agg."""
        docs.createOrReplaceTempView("stream_batch_docs")
        spans = docs.sparkSession.sql(
            synth.flat_spans_sql("spark", docs="stream_batch_docs")
        )
        cell = F.expr(grid.cell_sql("lon", "lat", self.res, "spark"))
        return (
            spans.withColumn("cell", cell)
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("w").alias("w_sumw"),
                F.sum(F.col("w") * F.col("w")).alias("w_sumw2"),
            )
        )

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
            # partial per micro-batch; overwrite-by-batch-id = idempotent
            # under micro-batch replay after failure
            (
                self._tile_partial(batch_df)
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
        """Read-time associative merge of all micro-batch deltas."""
        deltas = spark.read.option("recursiveFileLookup", "true").parquet(
            self.deltas_dir
        )
        return (
            deltas.groupBy("cell")
            .agg(
                F.sum("n").alias("n"),
                F.sum("w_sumw").alias("w_sumw"),
                F.sum("w_sumw2").alias("w_sumw2"),
            )
        )
