"""Convex hull: two-level reduction identity, geometric properties on
random point clouds, degenerate inputs, partition invariance."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fast_carpenter_spark.spatial import hull as H


def _hull_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_two_level_equals_single_level(spark):
    """Map-side local hulls + final merge must equal the hull of the raw
    points (Hull(S) = Hull(Hull(S1) ∪ Hull(S2)) — the associativity the
    shuffle reduction relies on)."""
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "user_id": rng.randint(0, 5, 400).astype("int64"),
            "x": rng.randint(0, 360000, 400).astype("int64"),
            "y": rng.randint(0, 180000, 400).astype("int64"),
        }
    )
    df = spark.createDataFrame(pdf).repartition(13)
    got = _hull_rows(H.convex_hull(df))
    # single-level reference: one chain per user over ALL points
    want = []
    for uid, g in pdf.groupby("user_id"):
        ch = H._chain(g["x"].to_numpy(), g["y"].to_numpy())
        a2 = H._area2(ch)
        for i, (x, y) in enumerate(ch):
            want.append((uid, i, x, y, len(ch), a2))
    assert got == sorted(want)


def test_hull_geometric_properties(spark):
    """Every input point lies inside-or-on the hull (cross >= 0 per CCW
    edge), vertices are a subset of the inputs, turns are strictly convex,
    and the shoelace area is positive."""
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "user_id": np.zeros(200, dtype="int64"),
            "x": rng.randint(0, 100000, 200).astype("int64"),
            "y": rng.randint(0, 100000, 200).astype("int64"),
        }
    )
    out = H.convex_hull(spark.createDataFrame(pdf)).toPandas().sort_values("seq")
    hull = list(zip(out.x, out.y))
    assert set(hull) <= set(zip(pdf.x, pdf.y))
    assert out.area2.iloc[0] > 0
    n = len(hull)
    for i in range(n):
        ax, ay = hull[i]
        bx, by = hull[(i + 1) % n]
        cx, cy = hull[(i + 2) % n]
        # strict CCW turn at every vertex (no collinear kept)
        assert (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0
        # all points left-of-or-on every edge
        cr = (bx - ax) * (pdf.y - ay) - (by - ay) * (pdf.x - ax)
        assert (cr >= 0).all()


@pytest.mark.parametrize(
    "pts,want_n,want_a2",
    [
        ([(5, 5)], 1, 0),  # single point
        ([(0, 0), (10, 10)], 2, 0),  # two points
        ([(0, 0), (5, 5), (10, 10), (2, 2)], 2, 0),  # all collinear -> endpoints
        ([(0, 0), (10, 0), (10, 10), (0, 10), (5, 5), (5, 0)], 4, 200),  # square
    ],
)
def test_hull_degenerate_and_collinear(spark, pts, want_n, want_a2):
    pdf = pd.DataFrame(
        {
            "user_id": np.zeros(len(pts), dtype="int64"),
            "x": np.array([p[0] for p in pts], dtype="int64"),
            "y": np.array([p[1] for p in pts], dtype="int64"),
        }
    )
    out = H.convex_hull(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == want_n
    assert (out.hull_size == want_n).all()
    assert (out.area2 == want_a2).all()


def test_hull_partition_invariance(spark):
    """Same result no matter how the raw points are partitioned — the
    candidate-reduction stage must be a pure optimization."""
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").createOrReplaceTempView(
        "events"
    )
    pts = spark.sql(H.event_points_sql("spark"))
    a = _hull_rows(H.convex_hull(pts.repartition(2)))
    b = _hull_rows(H.convex_hull(pts.repartition(17, F.col("x"))))
    assert a == b and len(a) > 0


def test_diameter_via_hull_equals_brute(spark):
    """Farthest pair restricted to hull vertices must equal the brute-force
    farthest pair over all points (diameter is attained at hull vertices),
    including the canonical tie-break."""
    from fast_carpenter_spark.queries import q_trajectory_diameter

    out = q_trajectory_diameter(spark, "/root/testdata/sf0.001").toPandas()
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").createOrReplaceTempView(
        "events"
    )
    pts = spark.sql(H.event_points_sql("spark")).toPandas()
    for uid, g in pts.groupby("user_id"):
        ps = sorted(set(zip(g.x, g.y)))
        best = max(
            ((bx - ax) ** 2 + (by - ay) ** 2, ax, ay, bx, by)
            for i, (ax, ay) in enumerate(ps)
            for bx, by in ps[i + 1:]
        )
        # max() on the tuple picks max d2 then LARGEST coords; redo with
        # canonical smallest-coords among maxima
        d2max = best[0]
        cand = min(
            (ax, ay, bx, by)
            for i, (ax, ay) in enumerate(ps)
            for bx, by in ps[i + 1:]
            if (bx - ax) ** 2 + (by - ay) ** 2 == d2max
        )
        row = out[out.user_id == uid].iloc[0]
        assert (row.d2, row.ax, row.ay, row.bx, row.by) == (d2max, *cand)
