"""Bucketed co-located join: the cell-keyed equi-join between two
same-bucketed tables must plan WITHOUT a hash-partitioning shuffle on
either side (broadcast disabled to force the sort-merge path — at real
scale neither side fits a broadcast)."""

import pytest

from pyspark.sql import functions as F

from fast_carpenter_spark import grid, synth
from fast_carpenter_spark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, docs):
    spans = spark.sql(synth.flat_spans_sql("spark")).withColumn(
        "cell", F.expr(grid.cell_sql("lon", "lat", 6, "spark"))
    )
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("spans_a", "cells_b", "spans_flatcopy"):
        # DROP also removes the location, but a stale dir can survive from a
        # previous test session whose metastore is gone — clear both
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    write_bucketed(
        spans.select("doc_id", "span_idx", "cell", "w"),
        "spans_a", bucket_col="cell", n_buckets=8,
    )
    write_bucketed(
        spans.groupBy("cell").agg(F.count(F.lit(1)).alias("n_cell")),
        "cells_b", bucket_col="cell", n_buckets=8,
    )
    return "spans_a", "cells_b"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_has_no_shuffle(spark, bucketed_tables, no_broadcast):
    a, b = bucketed_tables
    joined = colocated_join(spark, a, b, on="cell")
    plan = plan_of(joined)
    assert "SortMergeJoin" in plan, plan
    # bucketing IS the partitioning: no hash-repartition of either side
    assert "Exchange hashpartitioning" not in plan, plan
    # sanity vs the plain (shuffled) equivalent
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    plain = spark.table(a).join(spark.table(b).withColumnRenamed("n_cell", "m"), "cell")
    assert joined.count() == plain.count()


def test_unbucketed_join_does_shuffle(spark, bucketed_tables, no_broadcast):
    a, _ = bucketed_tables
    spark.table(a).limit(10_000).write.mode("overwrite").saveAsTable("spans_flatcopy")
    joined = spark.table(a).join(
        spark.table("spans_flatcopy").select("cell").distinct(), "cell"
    )
    assert "Exchange hashpartitioning" in plan_of(joined)
