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


NON_ASCII = [
    "héllo wörld",
    "日本語 の テスト 文",
    "mixed ascii ünd ßpecial",
    "кириллица и текст",
    "emoji 😀 astral 𝕏 chars",
    "",
    "é",
]


def test_kernel_non_ascii_matches_duckdb(duck):
    """Code-point fold parity on non-ASCII text (the round-1 kernels indexed
    UTF-8 byte buffers with character offsets and crashed on any of these)."""
    exp = [
        duck.execute(
            f"SELECT {token_hashes_sql('t', 'duck')} FROM (SELECT ? AS t)", [s]
        ).fetchone()[0]
        for s in NON_ASCII
    ]
    got = token_hashes_batch(NON_ASCII)
    for e, g in zip(exp, got):
        assert list(g) == (list(e) if e is not None else [])


def test_doc_hash_non_ascii_matches_duckdb(duck):
    from fast_carpenter_spark.functions.text import doc_hash_batch, text_hash_sql

    exp = [
        duck.execute(
            f"SELECT CASE WHEN length(t) = 0 THEN 0 ELSE "
            f"COALESCE({text_hash_sql('t', 'duck')}, 0) END FROM (SELECT ? AS t)", [s]
        ).fetchone()[0]
        for s in NON_ASCII
    ]
    assert doc_hash_batch(NON_ASCII) == exp


def test_simhash_non_ascii_matches_duckdb(duck):
    from fast_carpenter_spark.functions.text import simhash_batch
    from fast_carpenter_spark.functions.dedup import simhash_sql

    exp = [
        duck.execute(
            f"SELECT {simhash_sql('t', 'duck')} FROM (SELECT ? AS t)", [s]
        ).fetchone()[0]
        for s in NON_ASCII
    ]
    assert simhash_batch(NON_ASCII) == exp


def test_winnow_positional_guarantee(spark):
    """Winnowing's defining property: two documents sharing a token run of
    length >= w + k - 1 share at least one selected fingerprint; disjoint
    vocabularies share none."""
    from fast_carpenter_spark.functions.text import (
        WINNOW_K,
        WINNOW_W,
        winnow_fps_query_sql,
    )

    run = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    rows = [
        (0, f"xx yy {run} zz"),
        (1, f"{run} qq rr ss tt"),
        (2, "uu vv ww aa bb cc dd ee"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "winnow_docs"
    )
    assert len(run.split()) == WINNOW_W + WINNOW_K - 1
    fps = spark.sql(
        winnow_fps_query_sql("spark", docs="winnow_docs")
    ).toPandas()
    s0 = set(fps[fps.doc_id == 0].fp)
    s1 = set(fps[fps.doc_id == 1].fp)
    s2 = set(fps[fps.doc_id == 2].fp)
    assert s0 & s1  # shared run -> shared fingerprint (the guarantee)
    assert not (s0 & s2) and not (s1 & s2)  # disjoint vocab -> none


def test_winnow_short_and_empty_docs(spark):
    """Docs with 0 grams emit no fingerprint; docs with 0 < grams < w emit
    exactly one (the global min)."""
    from fast_carpenter_spark.functions.text import winnow_fps_query_sql

    rows = [(0, ""), (1, "one two"), (2, "one two three"), (3, "a b c d e")]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "winnow_short"
    )
    fps = spark.sql(
        winnow_fps_query_sql("spark", docs="winnow_short")
    ).toPandas()
    counts = fps.groupby("doc_id").size().to_dict()
    assert 0 not in counts and 1 not in counts  # < k tokens -> no grams
    assert counts[2] == 1  # one gram < w -> global min
    assert counts[3] == 1  # three grams < w -> global min


def test_winnow_arrow_kernel_matches_sql_twin(spark, docs):
    """The Arrow-kernel winnow path must reproduce the pure-SQL twin
    bit-for-bit (same fps, same overlap pairs)."""
    from fast_carpenter_spark.functions.text import (
        winnow_fps_df,
        winnow_fps_query_sql,
        winnow_overlap_df,
        winnow_overlap_query_sql,
    )

    sql_fps = sorted(map(tuple, spark.sql(winnow_fps_query_sql("spark")).collect()))
    df_fps = sorted(map(tuple, winnow_fps_df(docs).collect()))
    assert sql_fps == df_fps and len(df_fps) > 0
    sql_ov = sorted(map(tuple, spark.sql(winnow_overlap_query_sql("spark")).collect()))
    df_ov = sorted(map(tuple, winnow_overlap_df(docs).collect()))
    assert sql_ov == df_ov


def test_quality_repetition_semantics(spark):
    """Duplicate-gram fraction and max multiplicity recomputed in Python
    over synthetic docs with known repetition structure."""
    from fast_carpenter_spark.queries import _quality_repetition_sql

    rows = [
        (0, "a b c a b c a b c"),        # 7 grams, heavy repetition
        (1, "one two three four five"),  # 3 distinct grams, no repeats
        (2, "x y"),                       # < k tokens -> no grams -> absent
    ]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "repetition_docs"  # NOT "documents": the session-scoped view must survive
    )
    out = {
        r["doc_id"]: r
        for r in spark.sql(
            _quality_repetition_sql("spark", docs="repetition_docs")
        ).collect()
    }
    assert 2 not in out
    r0 = out[0]
    # grams of doc 0: abc bca cab abc bca cab abc -> total 7, distinct 3
    assert (r0["total_n"], r0["distinct_n"], r0["top_gram_count"]) == (7, 3, 3)
    assert r0["dup_frac_bp"] == (7 - 3) * 10000 // 7
    assert bool(r0["is_repetitive"]) is True
    r1 = out[1]
    assert (r1["total_n"], r1["distinct_n"], r1["top_gram_count"]) == (3, 3, 1)
    assert bool(r1["is_repetitive"]) is False
