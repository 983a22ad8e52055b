"""Unit tests for the two-pass distributed prefix scan (functions/pack.py):
value parity with a driver-side cumsum, empty input, and — the point of the
module — a physical plan with NO single-partition exchange."""

from pyspark.sql import functions as F

from fast_carpenter_spark.functions.pack import global_prefix_sum


def _expected(rows):
    out, acc = {}, 0
    for k, v in sorted(rows):
        out[k] = acc
        acc += v
    return out


def test_matches_sequential_cumsum(spark):
    rows = [(i * 7 % 101, (i * 13) % 9 + 1) for i in range(101)]  # shuffled keys
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    got = {
        r["k"]: r["prefix"]
        for r in global_prefix_sum(df, "k", "v", num_partitions=8).collect()
    }
    assert got == _expected(rows)


def test_more_partitions_than_rows(spark):
    rows = [(1, 10), (2, 20), (3, 30)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    got = {
        r["k"]: r["prefix"]
        for r in global_prefix_sum(df, "k", "v", num_partitions=16).collect()
    }
    assert got == {1: 0, 2: 10, 3: 30}


def test_empty_input(spark):
    df = spark.createDataFrame([], "k bigint, v bigint")
    assert global_prefix_sum(df, "k", "v").count() == 0


def test_no_single_partition_exchange(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 5 + 1).alias("v")
    )
    out = global_prefix_sum(df, "k", "v", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_media_context_flanking_semantics(spark):
    """Consecutive media spans share their flanking text; document edges
    yield NULL context — checked on a handcrafted interleaved doc."""
    from fast_carpenter_spark.queries import _media_context_sql

    # build a fake flat-spans view by swapping the generated FROM-subquery
    # for a literal table with the same columns the window pass needs
    rows = [
        (1, 0, "image", "m0", ""),
        (1, 1, "text", "", "hello"),
        (1, 2, "image", "m1", ""),
        (1, 3, "image", "m2", ""),
        (1, 4, "text", "", "world"),
        (1, 5, "audio", "m3", ""),
    ]
    spark.createDataFrame(
        rows, "doc_id long, span_idx int, kind string, media_ref string, span_text string"
    ).createOrReplaceTempView("media_ctx_fixture")
    sql = _media_context_sql("spark", spans_from="SELECT * FROM media_ctx_fixture")
    got = {
        r["media_ref"]: (r["prev_text"], r["next_text"])
        for r in spark.sql(sql).collect()
    }
    assert got == {
        "m0": (None, "hello"),
        "m1": ("hello", "world"),
        "m2": ("hello", "world"),  # consecutive media share flanks
        "m3": ("world", None),
    }
