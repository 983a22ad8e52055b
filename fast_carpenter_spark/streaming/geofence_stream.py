"""Structured-Streaming geofence transitions over span-trajectory slices.

Third instance of the engine's delta-partials algebra (tile_stream:
commutative counter merge; session_stream: temporal-adjacency merge): here
the state is a per-(doc, slice) boundary FRAGMENT and the merge stitches
trajectory seams.  See spatial/geofence.py for the algebra and its
exactness precondition (contiguous span_idx slices per micro-batch).

State never lives in executor memory: the deltas directory IS the state,
idempotent per batch id (overwrite into ``batch=N``), exactly-once at
read time, and out-of-order slice processing is safe because the seam
merge sorts fragments by first_idx.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..spatial.geofence import (
    boundary_fragments,
    boundary_transitions,
    span_labels,
    transitions_within,
)


@dataclass
class StreamingGeofence:
    name: str
    polygons: list = field(default_factory=list)
    out_dir: str = "/tmp/fcs_gf_stream_out"
    checkpoint_dir: str = "/tmp/fcs_gf_stream_ckpt"

    @property
    def trans_dir(self) -> str:
        return os.path.join(self.out_dir, "trans")

    @property
    def frags_dir(self) -> str:
        return os.path.join(self.out_dir, "frags")

    def start(self, spark: SparkSession, input_dir: str, *, available_now: bool = True):
        schema = spark.read.parquet(input_dir).schema
        stream = (
            spark.readStream.schema(schema)
            # one contiguous span_idx slice per micro-batch: the
            # exactness precondition of the fragment algebra
            .option("maxFilesPerTrigger", 1)
            .parquet(input_dir)
        )

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            labels = span_labels(batch_df, self.polygons).localCheckpoint()
            (
                transitions_within(labels)
                .withColumn("_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .parquet(os.path.join(self.trans_dir, f"batch={batch_id}"))
            )
            (
                boundary_fragments(labels)
                .withColumn("_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .parquet(os.path.join(self.frags_dir, f"batch={batch_id}"))
            )

        writer = stream.writeStream.foreachBatch(write_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def result(self, spark: SparkSession) -> DataFrame:
        opts = {"recursiveFileLookup": "true"}
        trans = spark.read.options(**opts).parquet(self.trans_dir).drop("_batch")
        frags = spark.read.options(**opts).parquet(self.frags_dir).drop("_batch")
        return trans.unionByName(boundary_transitions(frags))
