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


def _qd_hist(duck):
    from fast_carpenter_spark.functions.qdigest import QD_U

    return dict(
        duck.execute(
            f"SELECT least(greatest(n_chars,0),{QD_U-1}) v, count(*) c "
            "FROM documents GROUP BY 1"
        ).fetchall()
    )


def test_qdigest_size_and_rank_bounds(duck):
    """The two q-digest guarantees: size <= 3k nodes, and every percentile
    answer's TRUE rank within log2(U)/k * n of the target."""
    from fast_carpenter_spark.functions.qdigest import (
        QD_K,
        QD_QS,
        QD_U,
        qdigest_compress,
        qdigest_rank_query,
    )

    hist = _qd_hist(duck)
    digest, n, _ = qdigest_compress({QD_U + v: c for v, c in hist.items()})
    assert len(digest) <= 3 * QD_K
    eps_n = (QD_U.bit_length() - 1) * n / QD_K
    svals = sorted(hist.items())
    for q in QD_QS:
        est = qdigest_rank_query(digest, n, q)
        true_rank = sum(c for v, c in svals if v <= est)
        target = (q * n + 99) // 100
        assert target - eps_n <= true_rank, (q, est, true_rank, target)
        # one-sided overshoot also bounded (cum includes containing nodes)
        assert true_rank <= target + eps_n, (q, est, true_rank, target)


def test_qdigest_merge_preserves_guarantees(duck):
    """Shard digests merged (union counts + recompress) keep BOTH
    guarantees with the combined n — the mergeability contract — even
    though the merged digest need not be bit-identical to the single-pass
    one (lossy compression; the documented contrast with hll/theta/cms)."""
    from fast_carpenter_spark.functions.qdigest import (
        QD_K,
        QD_QS,
        QD_U,
        qdigest_compress,
        qdigest_merge,
        qdigest_rank_query,
    )

    rows = duck.execute(
        f"SELECT doc_id % 2 AS half, least(greatest(n_chars,0),{QD_U-1}) v, "
        "count(*) c FROM documents GROUP BY 1, 2"
    ).fetchall()
    halves = {0: {}, 1: {}}
    for h, v, c in rows:
        halves[h][QD_U + v] = c
    d0, n0, _ = qdigest_compress(halves[0])
    d1, n1, _ = qdigest_compress(halves[1])
    merged, n, _ = qdigest_merge(d0, d1)
    assert n == n0 + n1
    assert len(merged) <= 3 * QD_K
    hist = _qd_hist(duck)
    svals = sorted(hist.items())
    eps_n = (QD_U.bit_length() - 1) * n / QD_K
    for q in QD_QS:
        est = qdigest_rank_query(merged, n, q)
        true_rank = sum(c for v, c in svals if v <= est)
        target = (q * n + 99) // 100
        assert abs(true_rank - target) <= eps_n


def test_qdigest_python_matches_duck_cte(duck):
    """The Python build and the DuckDB chained-CTE build are independent
    implementations of the same rule — their digests must agree
    node-for-node."""
    from fast_carpenter_spark.functions.qdigest import (
        QD_U,
        qdigest_compress,
        qdigest_oracle_sql,
    )

    hist = _qd_hist(duck)
    digest, _, _ = qdigest_compress({QD_U + v: c for v, c in hist.items()})
    sql = (
        qdigest_oracle_sql().split("iv AS")[0].rstrip().rstrip(",")
        + "\nSELECT id, cnt FROM digest"
    )
    assert dict(duck.execute(sql).fetchall()) == digest


def test_cms_join_size_one_sided(spark):
    """The CMS inner-product estimate must dominate the exact join size
    (collisions only add non-negative cross terms) and stay within the
    d x w grid's theoretical slack on this key distribution."""
    from fast_carpenter_spark.functions.sketch import cms_join_size

    for t in ("orders", "customer"):
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").createOrReplaceTempView(t)
    r = cms_join_size(spark).collect()[0]
    assert r["est"] >= r["exact"] > 0
    # additive error <= |A| * |B| / W per row (CM inner-product bound)
    na = spark.table("orders").count()
    nb = spark.table("customer").count()
    assert r["est"] - r["exact"] <= na * nb / 256
