"""Arrow token-hash kernel: bit-exact parity with the SQL fold and with the
Spark column wrapper (the dedup hot path runs the kernel; the DuckDB
oracle runs the SQL twin)."""

import numpy as np

from fast_carpenter_spark.functions.text import (
    token_hashes_batch,
    token_hashes_column,
    token_hashes_sql,
)

from conftest import SF_DIR


def test_kernel_matches_duckdb_sql(duck):
    rows = duck.execute(
        f"SELECT doc_id, {token_hashes_sql('text', 'duck')} AS hs, text "
        "FROM documents ORDER BY doc_id"
    ).fetchall()
    got = token_hashes_batch([r[2] for r in rows])
    for (_, exp, _), g in zip(rows, got):
        assert list(g) == (list(exp) if exp is not None else [])


def test_kernel_edge_cases():
    out = token_hashes_batch(["", "   ", "a", "ab ab", None and "x" or ""])
    assert [len(o) for o in out] == [0, 0, 1, 2, 0]
    # "a" -> ascii 97; "ab" -> (0*31+97)*31+98
    assert out[2][0] == 97
    assert out[3][0] == out[3][1] == (97 * 31 + 98) % 1_000_000_007


def test_spark_column_matches_sql(spark, docs):
    via_udf = docs.select("doc_id", token_hashes_column("text").alias("h")).collect()
    via_sql = docs.selectExpr(
        "doc_id", f"{token_hashes_sql('text', 'spark')} AS h"
    ).collect()
    a = {r["doc_id"]: list(r["h"]) for r in via_udf}
    b = {r["doc_id"]: list(r["h"]) for r in via_sql}
    assert a == b
