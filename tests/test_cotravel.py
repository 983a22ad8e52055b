"""Semantic check of co-travel detection: recompute pair bin counts
independently in pandas from raw events (the oracle test proves
Spark == DuckDB; this proves both are RIGHT)."""

from itertools import combinations

import pandas as pd

from fast_carpenter_spark.spatial.trajectory import (
    COTRAVEL_BUCKET_US,
    COTRAVEL_MIN_BINS,
    COTRAVEL_RES,
    cotravel_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def test_cotravel_matches_pandas(spark):
    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView(
        "events"
    )
    got = {
        (r["u1"], r["u2"]): r["n_bins"]
        for r in spark.sql(cotravel_sql("spark")).collect()
    }

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    n = 1 << COTRAVEL_RES
    lon = ((ev.event_id * 9973 + ev.user_id * 31 + 7) % 360000) / 1000.0 - 180.0
    lat = ((ev.event_id * 7919 + ev.user_id * 37 + 3) % 180000) / 1000.0 - 90.0
    cx = ((lon + 180.0) / 360.0 * n).astype(int).clip(0, n - 1)
    cy = ((lat + 90.0) / 180.0 * n).astype(int).clip(0, n - 1)
    # parquet ts is datetime64[us] -> int64 view IS epoch microseconds
    tb = ev.ts.astype("int64") // COTRAVEL_BUCKET_US
    keys = (
        pd.DataFrame({"u": ev.user_id, "cx": cx, "cy": cy, "tb": tb})
        .drop_duplicates()
    )
    expected = {}
    for _, g in keys.groupby(["cx", "cy", "tb"]):
        for a, b in combinations(sorted(g["u"]), 2):
            expected[(a, b)] = expected.get((a, b), 0) + 1
    expected = {k: v for k, v in expected.items() if v >= COTRAVEL_MIN_BINS}
    assert got == expected
    assert len(got) > 0
