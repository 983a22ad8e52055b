"""Unit tests for the union-merge as-of join (functions/asof.py): backward
semantics, equality inclusion, no-match nulls, group isolation, and a plan
assertion that no nested-loop join sneaks in."""

from pyspark.sql import functions as F

from fast_carpenter_spark.functions.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k bigint, t bigint, lv string")
    right = spark.createDataFrame(right_rows, "k bigint, t bigint, rv string")
    out = asof_join(left, right, by="k", on="t", right_cols=["rv"])
    return {(r["k"], r["t"]): r["rv_r"] for r in out.collect()}


def test_backward_match_and_nulls(spark):
    got = _run(
        spark,
        [(1, 10, "a"), (1, 5, "b"), (1, 1, "c")],
        [(1, 2, "r2"), (1, 7, "r7"), (1, 20, "r20")],
    )
    # t=10 -> r7 (most recent <= 10), t=5 -> r2, t=1 -> no match
    assert got == {(1, 10): "r7", (1, 5): "r2", (1, 1): None}


def test_equal_on_value_matches(spark):
    got = _run(spark, [(1, 7, "a")], [(1, 7, "r7"), (1, 3, "r3")])
    assert got == {(1, 7): "r7"}


def test_groups_do_not_leak(spark):
    got = _run(spark, [(1, 10, "a"), (2, 10, "b")], [(1, 5, "r1")])
    assert got == {(1, 10): "r1", (2, 10): None}


def test_left_rows_all_kept_and_plan_has_no_nlj(spark):
    left = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("t"), F.lit("x").alias("lv")
    )
    right = spark.range(30).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 3).alias("t"),
        F.lit("y").alias("rv"),
    )
    out = asof_join(left, right, by="k", on="t", right_cols=["rv", "t"])
    assert out.count() == 100
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_helper_column_collision_rejected(spark):
    left = spark.createDataFrame([(1, 10, "x")], ["k", "t", "_side"])
    right = spark.createDataFrame([(1, 5, 2.0)], ["k", "t", "v"])
    import pytest

    with pytest.raises(ValueError, match="_side"):
        asof_join(left, right, by="k", on="t", right_cols=["v"])
