"""Bucketed layout — shuffle-free co-located joins on the cell key.

At 10^12 docs the dominant recurring cost of cell-keyed joins (doc-to-doc
matching, incremental tile updates, kNN candidate joins) is the shuffle of
the big side.  Writing both tables bucketed by the SAME cell key into the
warehouse removes it: Spark's scan exposes the bucketing as an output
partitioning, so a join on the bucket key needs NO Exchange on either side
(verified in tests by asserting the plan is exchange-free).

This is the persistent-layout complement to `plans.pipeline
HilbertLayoutStage` (in-job range partitioning): Hilbert ordering gives
range-pruning locality on disk, bucketing gives hash co-location for
repeated equi-joins.  The reference has no analog (it never joins —
SURVEY.md §2.4); this is pure Spark-first design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str = "cell",
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.
    ``n_buckets`` should be chosen so one bucket of the LARGEST table fits
    an executor's memory at the target scale (e.g. 2^15 buckets at
    10^12 docs)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str = "cell"
) -> DataFrame:
    """Equi-join two same-bucketed tables on the bucket key — planner
    produces a SortMergeJoin with ZERO Exchange when both sides are
    bucketed identically."""
    return spark.table(left_table).join(spark.table(right_table), on)
