"""Unit tests for the shared Pregel connected-components loop
(functions/graph.py) on hand-built graphs with known components, plus a
Spark-vs-DuckDB check of the recursive-CTE oracle twin on the same edges."""

import duckdb
import pytest
from pyspark.sql import functions as F

from fast_carpenter_spark.functions.graph import connected_components, reach_cte_sql


def _undirected(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def _run(spark, n_nodes, pairs, **kw):
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    labels = connected_components(nodes, _undirected(spark, pairs), **kw)
    return dict(
        (r["node"], r["cluster_id"]) for r in labels.collect()
    )


def test_two_components_and_singleton(spark):
    # {0,1,2} triangle, {3,4} edge, {5} isolated
    got = _run(spark, 6, [(0, 1), (1, 2), (0, 2), (3, 4)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_long_chain_converges(spark):
    # diameter-9 chain: needs multiple supersteps, exercises the
    # localCheckpoint lineage truncation
    got = _run(spark, 10, [(i, i + 1) for i in range(9)])
    assert set(got.values()) == {0}


def test_max_iter_caps_rounds(spark):
    # one round of min-propagation on a chain only moves labels one hop
    got = _run(spark, 4, [(i, i + 1) for i in range(3)], max_iter=1)
    assert got == {0: 0, 1: 0, 2: 1, 3: 2}


def test_custom_node_col(spark):
    nodes = spark.createDataFrame([(10,), (11,), (12,)], "cell bigint")
    edges = _undirected(spark, [(10, 12)])
    labels = connected_components(nodes, edges, node_col="cell")
    got = {r["cell"]: r["cluster_id"] for r in labels.collect()}
    assert got == {10: 10, 11: 11, 12: 10}


def test_oracle_cte_matches_spark(spark):
    pairs = [(0, 1), (1, 2), (4, 5), (6, 7), (7, 8), (5, 8)]
    got = _run(spark, 9, pairs)
    values = " UNION ALL ".join(
        f"SELECT {a} AS src, {b} AS dst UNION ALL SELECT {b}, {a}"
        for a, b in pairs
    )
    nodes_sql = "SELECT unnest(range(9)) AS node"
    sql = (
        "WITH RECURSIVE "
        + reach_cte_sql(values, nodes_sql)
        + " SELECT node, cluster_id FROM cl"
    )
    oracle = dict(duckdb.sql(sql).fetchall())
    assert got == oracle
