"""Count-min sketch invariants (oracle parity is covered by the
parametrized tests/test_queries_oracle.py sweep over QUERIES)."""

from pyspark.sql import functions as F

from fast_carpenter_spark.functions import sketch

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_sketch_is_bounded(spark):
    s = sketch.cms_sketch(_docs(spark))
    n = s.count()
    assert n <= sketch.D_ROWS * sketch.W_COLS
    # every token increments exactly one cell per row -> the per-row cell
    # sums are all equal to the total token count
    per_row = {r["row"]: r["s"] for r in
               s.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert len(set(per_row.values())) == 1
    assert set(per_row) == set(range(sketch.D_ROWS))


def test_estimate_is_one_sided(spark):
    out = sketch.cms_topk(_docs(spark), k=50).collect()
    assert len(out) > 0
    assert all(r["est"] >= r["exact"] for r in out)
    # at this vocabulary size vs 4x256 cells, the top tokens should be
    # estimated exactly (collisions would add, never subtract)
    assert out[0]["est"] == out[0]["exact"]


def test_hll_distinct_estimate_quality(spark):
    out = sketch.hll_distinct(_docs(spark)).collect()
    assert len(out) > 0
    for r in out:
        assert r["exact"] > 200  # bigram vocab: estimator's valid regime
        rel = abs(r["est"] - r["exact"]) / r["exact"]
        assert rel < 0.35, f"{r['lang']}: rel err {rel}"  # ~3 sigma at m=64
        assert 0 < r["n_hit"] <= sketch.HLL_M


def test_hll_union_merge_identity(spark, docs):
    """Register-wise MAX merge of per-source partials must reproduce the
    single-pass sketch EXACTLY (max of maxes) — the mergeability law."""
    from fast_carpenter_spark.functions.sketch import hll_distinct, hll_union

    single = {r["lang"]: (r["sum_int"], r["n_hit"], r["est"], r["exact"])
              for r in hll_distinct(docs).collect()}
    merged = {r["lang"]: (r["sum_int"], r["n_hit"], r["est"], r["exact"])
              for r in hll_union(docs).collect()}
    assert merged == single
    nsrc = {r["lang"]: r["n_sources"] for r in hll_union(docs).collect()}
    assert all(v > 1 for v in nsrc.values())  # the merge actually merges

def test_theta_distinct_estimate_quality(spark):
    out = sketch.theta_distinct(_docs(spark)).collect()
    assert len(out) > 0
    for r in out:
        assert r["est_int"] == r["n_kept"] * sketch.THETA_DEN
        rel = abs(r["est_int"] - r["exact"]) / r["exact"]
        # ~1/sqrt(n_kept) std; n_kept ~ 60 here -> 13% sigma, gate at 3x
        assert rel < 0.40, f"{r['lang']}: rel err {rel}"


def test_theta_union_merge_identity(spark, docs):
    """Set-union merge of per-source kept sets must reproduce the
    single-pass kept set EXACTLY (union of unions) — the mergeability
    law that lets shards sketch independently."""
    from pyspark.sql import functions as F

    whole = sketch.theta_registers(docs)
    # shard by source, sketch each shard independently, union + distinct
    shards = [
        sketch.theta_registers(docs.filter(F.col("source") == s))
        for s in [r["source"] for r in docs.select("source").distinct().collect()]
    ]
    merged = shards[0]
    for sh in shards[1:]:
        merged = merged.unionByName(sh)
    merged = merged.distinct()
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_theta_jaccard_bounds(spark):
    out = sketch.theta_jaccard(_docs(spark)).collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 <= r["jac_est"] <= 1.0
        assert 0.0 <= r["jac_exact"] <= 1.0
        # sketch estimate within +-0.15 of exact on this shared-vocab corpus
        assert abs(r["jac_est"] - r["jac_exact"]) < 0.15
