"""DBSCAN structural tests on crafted geometries (the registry oracle test
covers the synthetic corpus; these pin the edge semantics)."""

import pytest

from fast_carpenter_spark.spatial.cluster import dbscan


def _run(spark, rows, eps, min_pts):
    df = spark.createDataFrame(rows, "doc_id bigint, lon double, lat double")
    got = dbscan(df, eps=eps, min_pts=min_pts).collect()
    return {r["doc_id"]: (r["role"], r["cluster_id"]) for r in got}


def test_two_clusters_and_noise(spark):
    # two tight triads far apart + one isolated point
    rows = [
        (1, 0.0, 0.0), (2, 0.5, 0.0), (3, 0.0, 0.5),
        (10, 50.0, 50.0), (11, 50.5, 50.0), (12, 50.0, 50.5),
        (99, -120.0, -60.0),
    ]
    out = _run(spark, rows, eps=1.0, min_pts=3)
    assert out[1] == ("core", 1) and out[2] == ("core", 1) and out[3] == ("core", 1)
    assert out[10] == ("core", 10) and out[11] == ("core", 10) and out[12] == ("core", 10)
    assert out[99] == ("noise", -1)


def test_border_tie_breaks_to_min_cluster(spark):
    """A point within eps of cores from TWO clusters (classic DBSCAN's
    visit-order ambiguity) must land in the min-labelled cluster."""
    rows = [
        # cluster A: 4 mutually-eps-close cores around x=0
        (1, 0.0, 0.0), (2, 0.5, 0.0), (3, -0.5, 0.0), (4, 0.0, 0.5),
        # cluster B: 4 cores around x=3 (min core-core gap to A = 2.0 > eps)
        (7, 2.5, 0.0), (8, 3.0, 0.0), (9, 3.5, 0.0), (10, 3.0, 0.5),
        # border: exactly eps from core 2 (A) and core 7 (B); only those 2
        # neighbours + itself = 3 < min_pts=4 -> not core
        (5, 1.5, 0.0),
    ]
    out = _run(spark, rows, eps=1.0, min_pts=4)
    assert out[5] == ("border", 1)
    # clusters must NOT merge through the border point
    assert {out[1][1], out[2][1], out[3][1], out[4][1]} == {1}
    assert {out[7][1], out[8][1], out[9][1], out[10][1]} == {7}
    assert out[7][0] == "core"


def test_min_pts_counts_self(spark):
    # a pair within eps: each has 1 neighbour + itself = 2 >= min_pts=2
    rows = [(1, 0.0, 0.0), (2, 0.3, 0.0)]
    out = _run(spark, rows, eps=1.0, min_pts=2)
    assert out[1] == ("core", 1) and out[2] == ("core", 1)
    # min_pts=3: neither is core, both noise (no core to border off)
    out = _run(spark, rows, eps=1.0, min_pts=3)
    assert out[1] == ("noise", -1) and out[2] == ("noise", -1)
