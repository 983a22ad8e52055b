"""Driver contract for the spark-graft builder (PySpark target).

Queries and oracles live in ``fast_carpenter_spark.queries``; each
implemented operator from SURVEY.md §2 has one entry in ``queries()`` and a
matching DuckDB oracle in ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fast_carpenter_spark.queries import QUERIES, q_pip_tile_agg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial join (cell cover + PIP refine) -> per-region tile
    aggregation on sf0.001."""
    return q_pip_tile_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
