"""Empty/degenerate-input behavior of the round-3 operators: an empty
micro-batch, an empty partition or an all-filtered slice must flow through
cleanly (return empty, never throw), and malformed widths must fail
loudly, not silently emit garbage."""

import pytest
from pyspark.sql import functions as F, types as T

from fast_carpenter_spark.functions import pq, sketch
from fast_carpenter_spark.functions.dedup import edit_distance_pairs
from fast_carpenter_spark.functions.graph import connected_components, pagerank


def _empty_docs(spark):
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
    ])
    return spark.createDataFrame([], schema)


def _empty_emb(spark):
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("label", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    return spark.createDataFrame([], schema)


def test_cms_empty(spark):
    assert sketch.cms_sketch(_empty_docs(spark)).count() == 0
    assert sketch.cms_topk(_empty_docs(spark)).count() == 0


def test_hll_empty(spark):
    assert sketch.hll_distinct(_empty_docs(spark)).count() == 0


def test_editdist_empty(spark):
    assert edit_distance_pairs(_empty_docs(spark)).count() == 0


def test_pq_empty(spark):
    assert pq.pq_codes(_empty_emb(spark)).count() == 0
    assert pq.ivfpq_codes(_empty_emb(spark)).count() == 0
    assert pq.pq_adc_topk(_empty_emb(spark)).count() == 0


def test_pq_wrong_dim_fails_loudly(spark):
    bad = spark.createDataFrame(
        [(1, 0, [1.0, 2.0, 3.0])], "vec_id long, label int, embedding array<double>"
    )
    with pytest.raises(Exception, match="64-dim"):
        pq.pq_codes(bad).count()


def test_graph_empty_edges(spark):
    nodes = spark.range(3).select(F.col("id").alias("node"))
    empty_e = spark.createDataFrame([], "src long, dst long")
    cc = {r["node"]: r["cluster_id"]
          for r in connected_components(nodes, empty_e).collect()}
    assert cc == {0: 0, 1: 1, 2: 2}  # all isolated singletons
    pr = {r["node"]: r["pr"] for r in pagerank(nodes, empty_e).collect()}
    assert set(pr.values()) == {150_000_000}  # everyone at the 0.15 base


def test_constraints_audit_flags_violations(spark):
    from fast_carpenter_spark.functions import curate

    clean = spark.createDataFrame(
        [(1, "abc", "en", "s", 3), (2, "de", "fr", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rep = {r["constraint"]: r for r in curate.constraints_audit(clean).collect()}
    assert len(rep) == 5 and all(r["passed"] for r in rep.values())
    dirty = spark.createDataFrame(
        [
            (1, "", "en", "s", 0),        # empty text + n_chars out of range
            (1, "xy", "xx", "s", 2),      # dup key + bad lang
            (3, "abc", "en", "s", 99),    # n_chars inconsistent with text
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rep = {r["constraint"]: r for r in curate.constraints_audit(dirty).collect()}
    assert not any(r["passed"] for r in rep.values())
    assert rep["completeness_text"]["metric"] == pytest.approx(2 / 3)
    assert rep["uniqueness_doc_id"]["metric"] == pytest.approx(2 / 3)
    assert rep["range_n_chars"]["metric"] == 1.0
    assert rep["domain_lang"]["metric"] == 1.0
    assert rep["consistency_n_chars"]["metric"] == 1.0  # only 'abc' vs 99


def test_redact_counts_and_rewrites(spark):
    from fast_carpenter_spark.functions import curate

    docs = spark.createDataFrame(
        [(1, "the customer saw a vector of customers"),  # 'customers' NOT bounded-matched
         (2, "nothing to scrub here"),
         (3, "vector vector")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curate.redact(docs).collect()}
    assert set(out) == {1, 3}  # doc 2 untouched -> not emitted
    assert out[1]["n_redacted"] == 2
    assert out[1]["redacted"] == "the [REDACTED] saw a [REDACTED] of customers"
    assert out[3]["n_redacted"] == 2
    assert out[3]["redacted"] == "[REDACTED] [REDACTED]"
