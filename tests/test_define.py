"""Define stage + jagged reductions on the reference's literal micro-fixtures
(ref: /root/reference/tests/define/test_reductions.py:7-9 jagged lists)."""

import math

import pytest
from pyspark.sql import functions as F

from fast_carpenter_spark.operators.define import (
    DefineStage,
    Variable,
    compile_variable,
    reduction_sql,
)

JAGGED = [[0.0, 1.1, 2.2], [3.3, 4.4], [5.5], [6.6, 7.7, 8.8], [9.9, 10.0, 11.0], []]


@pytest.fixture(scope="module")
def jagged_df(spark):
    rows = [(i, v, float(i)) for i, v in enumerate(JAGGED)]
    return spark.createDataFrame(rows, "id int, a array<double>, s double")


def _col(df, sql, name="v"):
    return [r.v for r in df.selectExpr("id", f"{sql} AS v").orderBy("id").collect()]


def test_reduce_nth(jagged_df):
    got = _col(jagged_df, reduction_sql(1, "a"))
    assert got == [1.1, 4.4, None, 7.7, 10.0, None]
    got = _col(jagged_df, reduction_sql(-1, "a"))
    assert got == [2.2, 4.4, 5.5, 8.8, 11.0, None]
    got = _col(jagged_df, reduction_sql(1, "a", fill_missing=-1.0))
    assert got == [1.1, 4.4, -1.0, 7.7, 10.0, -1.0]


def test_reduce_sum_prod(jagged_df):
    got = _col(jagged_df, reduction_sql("sum", "a"))
    assert got == pytest.approx([3.3, 7.7, 5.5, 23.1, 30.9, 0.0])
    got = _col(jagged_df, reduction_sql("prod", "a"))
    assert got == pytest.approx([0.0, 14.52, 5.5, 447.216, 1089.0, 1.0])


def test_reduce_minmax_counts(jagged_df):
    assert _col(jagged_df, reduction_sql("max", "a")) == [2.2, 4.4, 5.5, 8.8, 11.0, None]
    assert _col(jagged_df, reduction_sql("min", "a")) == [0.0, 3.3, 5.5, 6.6, 9.9, None]
    assert _col(jagged_df, reduction_sql("counts", "a")) == [3, 2, 1, 3, 3, 0]
    assert _col(jagged_df, reduction_sql("count_nonzero", "a")) == [2, 2, 1, 3, 3, 0]


def test_reduce_argmax(jagged_df):
    # empty arrays -> NULL (awkward argmax of [] is None)
    assert _col(jagged_df, reduction_sql("argmax", "a")) == [2, 1, 0, 2, 2, None]
    assert _col(jagged_df, reduction_sql("argmin", "a")) == [0, 0, 0, 0, 0, None]


def test_reduce_any_all(spark):
    df = spark.createDataFrame(
        [(0, [True, False]), (1, [True, True]), (2, []), (3, [False])],
        "id int, a array<boolean>",
    )
    got = [r.v for r in df.selectExpr("id", reduction_sql("any", "a") + " AS v").orderBy("id").collect()]
    assert got == [True, True, False, False]
    got = [r.v for r in df.selectExpr("id", reduction_sql("all", "a") + " AS v").orderBy("id").collect()]
    assert got == [False, True, True, False]


def test_define_scalar(jagged_df):
    stage = DefineStage.from_config("d", [{"s2": "s ** 2 + 1"}])
    out = stage.apply(jagged_df).orderBy("id").collect()
    assert [r.s2 for r in out] == pytest.approx([1.0, 2.0, 5.0, 10.0, 17.0, 26.0])


def test_define_jagged_elementwise(jagged_df):
    stage = DefineStage.from_config("d", [{"a2": "a * 2 + s"}])
    out = stage.apply(jagged_df).orderBy("id").collect()
    assert list(out[1].a2) == pytest.approx([7.6, 9.8])  # [3.3*2+1, 4.4*2+1]
    assert list(out[5].a2) == []


def test_define_jagged_reduce_with_mask(jagged_df):
    stage = DefineStage.from_config(
        "d", [{"big_sum": {"formula": "a * 1.0", "mask": "a > 5.0", "reduce": "sum"}}]
    )
    out = stage.apply(jagged_df).orderBy("id").collect()
    assert [r.big_sum for r in out] == pytest.approx([0.0, 0.0, 5.5, 23.1, 30.9, 0.0])


def test_define_reduce_nth(jagged_df):
    stage = DefineStage.from_config(
        "d", [{"first": {"formula": "a + 0.0", "reduce": 0, "fill_missing": -99.0}}]
    )
    out = stage.apply(jagged_df).orderBy("id").collect()
    assert [r.first for r in out] == pytest.approx([0.0, 3.3, 5.5, 6.6, 9.9, -99.0])


def test_define_overwrite_forbidden(jagged_df):
    stage = DefineStage.from_config("d", [{"s": "s + 1"}])
    with pytest.raises(ValueError, match="overwrite forbidden"):
        stage.apply(jagged_df)


def test_define_sees_earlier_variables(jagged_df):
    stage = DefineStage.from_config("d", [{"t": "s + 1"}, {"u": "t * 2"}])
    out = stage.apply(jagged_df).orderBy("id").collect()
    assert [r.u for r in out] == pytest.approx([2.0, 4.0, 6.0, 8.0, 10.0, 12.0])


def test_define_two_jagged_inputs(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0], [10.0, 20.0]), (1, [3.0], [30.0])],
        "id int, a array<double>, b array<double>",
    )
    stage = DefineStage.from_config("d", [{"ab": "a + b"}])
    out = stage.apply(df).orderBy("id").collect()
    assert list(out[0].ab) == pytest.approx([11.0, 22.0])
    assert list(out[1].ab) == pytest.approx([33.0])


def test_nested_jagged_two_levels(spark):
    """Multi-level jaggedness (ref: tests/test_expressions.py:63-97 3D
    arrays): reductions compose one nesting level at a time —
    inner reduce via transform(outer, xs -> <reduction over xs>), outer
    reduce over the resulting 1-level array (SURVEY.md §1.2)."""
    from fast_carpenter_spark.operators.define import reduction_sql

    df = spark.createDataFrame(
        [(1, [[1.0, 2.0], [3.0]]), (2, [[], [4.0, 5.0]]), (3, [])],
        "id INT, a ARRAY<ARRAY<DOUBLE>>",
    )
    inner_sum = reduction_sql("sum", "xs")
    out = df.selectExpr(
        "id",
        f"transform(a, xs -> {inner_sum}) AS per_inner",
        f"{reduction_sql('sum', f'transform(a, xs -> {inner_sum})')} AS total",
        f"{reduction_sql('counts', 'a')} AS n_outer",
        "flatten(a) AS flat",
    ).orderBy("id").collect()
    assert out[0].per_inner == [3.0, 3.0] and out[0].total == 6.0
    assert out[1].per_inner == [0.0, 9.0] and out[1].total == 9.0
    assert out[1].flat == [4.0, 5.0]
    assert out[2].total == 0.0 and out[2].n_outer == 0


def test_3d_jagged_define_stage(spark):
    """DefineStage on array<array<double>> columns directly (ref:
    tests/test_expressions.py:63-97 test_3D_jagged): elementwise formulas
    broadcast to the innermost level, reduce collapses one innermost
    level, masks filter innermost elements, and mismatched nested arrays
    refuse to broadcast."""
    from fast_carpenter_spark.expressions import ExpressionError
    from fast_carpenter_spark.operators.define import compile_variable, Variable

    df = spark.createDataFrame(
        [
            (0, [], [[9.0]]),
            (1, [[1.0]], [[8.0], [7.0]]),
            (2, [[2.0], [2.0, 3.0]], [[]]),
        ],
        "j INT, fake3d ARRAY<ARRAY<DOUBLE>>, other3d ARRAY<ARRAY<DOUBLE>>",
    )
    stage = DefineStage.from_config(
        "n",
        [
            {"doubled": "fake3d * 2"},
            {"counts2d": {"formula": "fake3d", "reduce": "counts"}},
            {"odd": {"formula": "fake3d", "mask": "fake3d % 2 == 1"}},
        ],
    )
    out = {r.j: r for r in stage.apply(df).collect()}
    # ref asserts: doubled[1,0,:]==[2]; doubled[2,0,:]==[4]; doubled[2,1,:]==[4,6]
    assert out[0].doubled == []
    assert out[1].doubled == [[2.0]]
    assert out[2].doubled == [[4.0], [4.0, 6.0]]
    # ref: fake_3d.count() is a JaggedArray (per-outer counts)
    assert out[2].counts2d == [1, 2]
    assert out[2].odd == [[], [3.0]]
    # ref: "SecondFake3D + Fake3D" -> "cannot broadcast"
    with pytest.raises(ExpressionError, match="cannot broadcast"):
        compile_variable(df, Variable(name="bad", formula="fake3d + other3d"))
