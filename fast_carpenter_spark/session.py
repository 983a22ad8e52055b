"""Session factory with the engine's cluster-scale configuration.

One place for the knobs that matter at 10^12 docs, with the reasoning
recorded next to each.  ``build_session()`` is used by the bench/scaling
harnesses; on a real cluster the same settings go through
``spark-submit --conf`` (see scripts/submit_job.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Defaults tuned for the engine's plan shapes.  Values are strings, as
#: spark-submit would pass them.
SCALE_CONF: dict[str, str] = {
    # AQE re-plans at runtime: coalesces small shuffle partitions and
    # splits skewed ones — the backstop behind our explicit salting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # 128 MB scan splits: large enough to amortize task overhead, small
    # enough that a 1000-executor cluster keeps every core busy on a
    # 100 TB input (~800k tasks).
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Arrow for every pandas_udf / mapInPandas hop (PIP parity kernel,
    # local kNN, media decode); batch size bounds executor-side pandas
    # memory per task.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # The polygon/cover dimension tables are small; let Catalyst choose
    # broadcast up to 64 MB (covers ~1M polygons of metadata).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def build_session(
    *,
    master: str | None = None,
    app_name: str = "fast_carpenter_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """SparkSession with SCALE_CONF applied.

    ``shuffle_partitions`` should be ~2-3x the total cores on a real
    cluster (set explicitly; AQE coalesces the excess).  In local mode it
    defaults to the local core count.
    """
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    for k, v in SCALE_CONF.items():
        b = b.config(k, v)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
