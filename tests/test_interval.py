"""Interval overlap join edge semantics (the registry oracle test covers
the sessions corpus; these pin the boundary cases)."""

from fast_carpenter_spark.functions.interval import overlap_count

BIN = 100


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id bigint, session_id bigint, sess_start_us bigint, sess_end_us bigint"
    )
    got = overlap_count(df, bin_us=BIN).collect()
    return {(r["user_id"], r["session_id"]): r["n_concurrent"] for r in got}


def test_touching_endpoints_overlap_and_lonely_is_zero(spark):
    rows = [
        (1, 1, 0, 50),
        (2, 1, 50, 120),   # touches (1,1) at exactly t=50 -> closed overlap
        (3, 1, 500, 600),  # far away
    ]
    out = _run(spark, rows)
    assert out[(1, 1)] == 1 and out[(2, 1)] == 1
    assert out[(3, 1)] == 0


def test_pair_spanning_many_shared_bins_counts_once(spark):
    # both intervals span bins 0..9: 10 shared bins, ONE pair
    rows = [(1, 1, 0, 999), (2, 1, 10, 990)]
    out = _run(spark, rows)
    assert out == {(1, 1): 1, (2, 1): 1}


def test_chain_counts_are_per_pair(spark):
    # a overlaps b, b overlaps c, a does NOT overlap c
    rows = [(1, 1, 0, 100), (2, 1, 90, 250), (3, 1, 240, 400)]
    out = _run(spark, rows)
    assert out == {(1, 1): 1, (2, 1): 2, (3, 1): 1}
