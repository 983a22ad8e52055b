"""numexpr -> Spark SQL transpiler tests.

Mirrors /root/reference/tests/test_expressions.py: constants, where(),
mask combination with & |, dotted names, branch extraction.
"""

import math

import pytest

from fast_carpenter_spark.expressions import (
    ExpressionError,
    compile_expression,
    get_branches,
    preprocess_name,
)


def _eval(spark, sql, row="SELECT 1"):
    return spark.sql(f"SELECT {sql} AS v").collect()[0].v


def test_arithmetic(spark):
    sql = compile_expression("2 ** 3 + 4 * 5 - 6 / 3")
    assert _eval(spark, sql) == pytest.approx(26.0)


def test_sqrt_and_hypot(spark):
    sql = compile_expression("sqrt(3.0**2 + 4.0**2)")
    assert _eval(spark, sql) == pytest.approx(5.0)
    sql = compile_expression("hypot(3.0, 4.0)")
    assert _eval(spark, sql) == pytest.approx(5.0)


def test_where(spark):
    sql = compile_expression("where(1 > 2, 10, 20)")
    assert _eval(spark, sql) == 20


def test_arctan2_and_expm1(spark):
    import math

    sql = compile_expression("arctan2(1.0, 1.0)")
    assert _eval(spark, sql) == pytest.approx(math.pi / 4)
    sql = compile_expression("expm1(0.0)")
    assert _eval(spark, sql) == pytest.approx(0.0)


def test_mask_combination(spark):
    sql = compile_expression("(1 < 2) & (3 > 4) | (5 < 6)")
    assert _eval(spark, sql) is True


def test_constants(spark):
    assert math.isnan(_eval(spark, compile_expression("nan")))
    assert _eval(spark, compile_expression("inf")) == float("inf")
    assert _eval(spark, compile_expression("pi")) == pytest.approx(math.pi)
    assert _eval(spark, compile_expression("e")) == pytest.approx(math.e)


def test_columns_and_subs():
    sql = compile_expression("a + b", subs={"a": "_x"})
    assert "_x" in sql and "b" in sql


def test_dotted_names():
    assert preprocess_name("a.b.c") == "a__DOT__b__DOT__c"
    sql = compile_expression("tree.muon_px * 2")
    assert "tree__DOT__muon_px" in sql


def test_unknown_column_raises():
    with pytest.raises(ExpressionError):
        compile_expression("nope + 1", valid={"a", "b"})


def test_unsupported_function_raises():
    with pytest.raises(ExpressionError):
        compile_expression("frobnicate(a)")


def test_get_branches():
    assert get_branches("a + sqrt(b) * where(c > 0, d, 1)") == ["a", "b", "c", "d"]
    assert get_branches("a + b", valid={"a"}) == ["a"]
    assert get_branches("nan + pi") == []


def test_chained_comparison(spark):
    sql = compile_expression("1 < 2 < 3")
    assert _eval(spark, sql) is True
    sql = compile_expression("1 < 2 > 5")
    assert _eval(spark, sql) is False
