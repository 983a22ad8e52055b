"""Domain-mixture rebalance invariants (oracle parity is covered by the
parametrized tests/test_queries_oracle.py sweep)."""

import pytest
from pyspark.sql import functions as F

from fast_carpenter_spark.functions.curate import TRAIN_MIX_TARGETS, train_mix

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_mixture_caps_and_takes(spark, docs):
    rows = {r["lang"]: r for r in train_mix(docs).collect()}
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # the binding group caps the total: N = min_g floor(n_g * 1024 / w_g)
    n_total = min(avail[g] * 1024 // w for g, w in TRAIN_MIX_TARGETS.items())
    for g, w in TRAIN_MIX_TARGETS.items():
        assert rows[g]["n_avail"] == avail[g]
        assert rows[g]["n_take"] == n_total * w // 1024
        assert rows[g]["n_take"] <= avail[g]  # never overdraws a group
    # achieved mixture is within 1 doc per group of the target share
    tot = sum(r["n_take"] for r in rows.values())
    for g, w in TRAIN_MIX_TARGETS.items():
        assert abs(rows[g]["n_take"] - tot * w / 1024) <= 1


def test_selection_is_reproducible(spark, docs):
    a = {(r["lang"], r["sum_doc_id"]) for r in train_mix(docs).collect()}
    b = {(r["lang"], r["sum_doc_id"]) for r in
         train_mix(docs.repartition(7)).collect()}
    assert a == b  # partitioning-independent exact member set


def test_bad_targets_raise(spark, docs):
    with pytest.raises(AssertionError):
        train_mix(docs, {"en": 512, "de": 500}).collect()  # != 1024
