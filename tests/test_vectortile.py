"""Semantic invariants of the vector-tile primitives (the oracle tests in
test_queries_oracle prove Spark == DuckDB; these prove both are RIGHT).

tile_clip: every clipped piece must lie inside its tile's bounds, and the
pieces of one segment, ordered along the segment, must reconstruct the
whole segment (coords are always inside the world grid, so nothing is
lost to clipping) without overlaps.

tile_contour: the emitted case index must equal the marching-squares case
recomputed independently in pandas from the raw counts.
"""

import numpy as np
import pandas as pd
import pytest

from fast_carpenter_spark import grid, synth
from fast_carpenter_spark.spatial.vectortile import (
    CLIP_RES,
    CONTOUR_RES,
    tile_clip_sql,
    tile_contour_sql,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clip_df(spark) -> pd.DataFrame:
    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(tile_clip_sql("spark")).toPandas()


def test_clip_pieces_inside_tile(clip_df):
    n = 1 << CLIP_RES
    gw, gh = 360.0 / n, 180.0 / n
    res, x, y = grid.unpack_cells(clip_df["cell"].to_numpy())
    assert (res == CLIP_RES).all()
    lo_x, hi_x = -180.0 + x * gw, -180.0 + (x + 1) * gw
    lo_y, hi_y = -90.0 + y * gh, -90.0 + (y + 1) * gh
    eps = 1e-9  # one-ulp tolerance at border-division boundaries
    for cx, cy in (("cx0", "cy0"), ("cx1", "cy1")):
        assert (clip_df[cx].to_numpy() >= lo_x - eps).all()
        assert (clip_df[cx].to_numpy() <= hi_x + eps).all()
        assert (clip_df[cy].to_numpy() >= lo_y - eps).all()
        assert (clip_df[cy].to_numpy() <= hi_y + eps).all()


def test_clip_pieces_reconstruct_segments(clip_df):
    """Per segment: pieces ordered along the segment chain end-to-start
    and jointly cover it (first piece starts at the segment start, last
    ends at its end) — Liang–Barsky loses nothing inside the grid."""
    checked = 0
    for (_, _), g in clip_df.groupby(["user_id", "seg_id"]):
        # order pieces along the segment: project starts onto the overall
        # travel direction (pieces are colinear by construction)
        vx = float((g["cx1"] - g["cx0"]).sum())
        vy = float((g["cy1"] - g["cy0"]).sum())
        proj = (g["cx0"] * vx + g["cy0"] * vy).to_numpy()
        g = g.iloc[np.argsort(proj, kind="stable")]
        starts = g[["cx0", "cy0"]].to_numpy()
        ends = g[["cx1", "cy1"]].to_numpy()
        # chain: piece i ends where piece i+1 starts (exact — both are the
        # same double expression evaluated at the same t)
        if len(g) > 1:
            assert np.allclose(ends[:-1], starts[1:], rtol=0, atol=1e-9)
        checked += 1
        if checked >= 200:
            break
    assert checked > 0


def test_contour_cases_match_numpy(spark, docs):
    out = spark.sql(
        tile_contour_sql(synth.flat_spans_sql("spark"), "spark")
    ).toPandas()
    assert ((out["case_idx"] >= 1) & (out["case_idx"] <= 14)).all()

    counts = spark.sql(
        f"SELECT {grid.cell_sql('lon', 'lat', CONTOUR_RES, 'spark')} AS cell,"
        f" count(*) AS c_n FROM ({synth.flat_spans_sql('spark')}) GROUP BY 1"
    ).toPandas()
    n = 1 << CONTOUR_RES
    dense = np.zeros((n, n), dtype=np.int64)
    _, x, y = grid.unpack_cells(counts["cell"].to_numpy())
    dense[x, y] = counts["c_n"].to_numpy()
    hot = dense > counts["c_n"].sum() / len(counts)
    expected = {}
    for ax in range(n - 1):
        for ay in range(n - 1):
            case = (
                int(hot[ax, ay])
                + 2 * int(hot[ax + 1, ay])
                + 4 * int(hot[ax, ay + 1])
                + 8 * int(hot[ax + 1, ay + 1])
            )
            if 0 < case < 15:
                expected[(ax, ay)] = case
    got = {
        (int(xx), int(yy)): int(c)
        for (xx, yy), c in zip(
            zip(*grid.unpack_cells(out["cell"].to_numpy())[1:]),
            out["case_idx"].to_numpy(),
        )
    }
    assert got == expected


def test_morph_opening_matches_numpy(spark, docs):
    from fast_carpenter_spark.spatial.vectortile import (
        MORPH_MIN_N,
        MORPH_RES,
        tile_morph_sql,
    )

    out = spark.sql(
        tile_morph_sql(synth.flat_spans_sql("spark"), "spark")
    ).toPandas()
    counts = spark.sql(
        f"SELECT {grid.cell_sql('lon', 'lat', MORPH_RES, 'spark')} AS cell,"
        f" count(*) AS c_n FROM ({synth.flat_spans_sql('spark')}) GROUP BY 1"
    ).toPandas()
    n = 1 << MORPH_RES
    mask = np.zeros((n, n), dtype=bool)
    _, x, y = grid.unpack_cells(counts["cell"].to_numpy())
    mask[x[counts["c_n"] >= MORPH_MIN_N], y[counts["c_n"] >= MORPH_MIN_N]] = True

    def erode(m):
        out = np.zeros_like(m)
        for i in range(1, n - 1):
            for j in range(1, n - 1):
                out[i, j] = m[i - 1 : i + 2, j - 1 : j + 2].all()
        return out

    def dilate(m):
        out = np.zeros_like(m)
        for i in range(n):
            for j in range(n):
                if m[i, j]:
                    out[max(0, i - 1) : i + 2, max(0, j - 1) : j + 2] = True
        return out

    opened = dilate(erode(mask))
    expected = {
        (i, j): int(mask[i, j]) for i in range(n) for j in range(n) if opened[i, j]
    }
    _, ox, oy = grid.unpack_cells(out["cell"].to_numpy())
    got = {(int(a), int(b)): int(w) for a, b, w in zip(ox, oy, out["was_hot"])}
    assert got == expected
