"""Independent semantic checks for idw_interp and skyline (the oracle
tests prove Spark == DuckDB; these prove the semantics are RIGHT)."""

import numpy as np
import pandas as pd

from fast_carpenter_spark import grid, synth
from fast_carpenter_spark.spatial.raster import IDW_MIN_N, IDW_RES, idw_sql

SF_DIR = "/root/testdata/sf0.001"


def test_idw_matches_numpy(spark, docs):
    out = spark.sql(idw_sql(synth.flat_spans_sql("spark"), "spark")).toPandas()
    counts = spark.sql(
        f"SELECT {grid.cell_sql('lon', 'lat', IDW_RES, 'spark')} AS cell,"
        f" count(*) AS c_n FROM ({synth.flat_spans_sql('spark')}) GROUP BY 1"
    ).toPandas()
    n = 1 << IDW_RES
    dense = np.zeros((n, n), dtype=np.int64)
    _, x, y = grid.unpack_cells(counts["cell"].to_numpy())
    dense[x, y] = counts["c_n"].to_numpy()
    stations = dense * (dense >= IDW_MIN_N)
    expected = {}
    for tx in range(n):
        for ty in range(n):
            if dense[tx, ty] > 0:
                continue  # only EMPTY cells are interpolated
            swn = sw = 0
            for dx in range(-2, 3):
                for dy in range(-2, 3):
                    sx, sy = tx - dx, ty - dy
                    if (dx, dy) == (0, 0) or not (0 <= sx < n and 0 <= sy < n):
                        continue
                    if stations[sx, sy] >= IDW_MIN_N:
                        w = 40 // (dx * dx + dy * dy)
                        swn += w * int(stations[sx, sy])
                        sw += w
            if sw > 0:
                expected[(tx, ty)] = (swn / sw, sw)
    _, ox, oy = grid.unpack_cells(out["cell"].to_numpy())
    got = {
        (int(a), int(b)): (float(e), int(w))
        for a, b, e, w in zip(ox, oy, out["est"], out["w_total"])
    }
    assert got == expected
    assert len(got) > 0


def test_skyline_matches_pandas(spark, docs):
    from fast_carpenter_spark.queries import q_skyline

    out = q_skyline(spark, SF_DIR).toPandas()
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ns = np.where(d.doc_id % 100 == 0, 48, d.doc_id % 7 + 1)
    feat = pd.DataFrame({"doc_id": d.doc_id, "x": ns, "y": d.n_chars})
    keep = []
    for _, r in feat.iterrows():
        dom = (
            (feat.x >= r.x) & (feat.y >= r.y) & ((feat.x > r.x) | (feat.y > r.y))
        ).any()
        if not dom:
            keep.append((r.doc_id, r.x, r.y))
    got = sorted(zip(out.doc_id, out.n_spans, out.n_chars))
    assert got == sorted(keep)
    assert 0 < len(got) < len(feat)


def test_tile_trend_semantics(spark):
    """Mann–Kendall S recomputed in pandas over the densified (cell, bin)
    counts must match the SQL operator exactly, including zero bins."""
    import itertools

    from fast_carpenter_spark.queries import _tile_trend_sql, q_tile_trend

    spark.read.parquet("/root/testdata/sf0.001/events.parquet").createOrReplaceTempView(
        "events"
    )
    out = {r["cell"]: (r["s_stat"], r["n_pairs"], r["trend"])
           for r in q_tile_trend(spark, "/root/testdata/sf0.001").collect()}
    # recompute: counts per (cell, bin) via the same ev projection
    ev_sql = _tile_trend_sql("spark").split("cb0 AS")[0].replace("WITH ev AS (", "")
    ev = spark.sql(ev_sql.rsplit("),", 1)[0]).toPandas()
    bins = sorted(ev.tb.unique())
    for cell, g in ev.groupby("cell"):
        counts = g.groupby("tb").size().reindex(bins, fill_value=0)
        s = sum(
            (1 if counts[b] > counts[a] else -1 if counts[b] < counts[a] else 0)
            for a, b in itertools.combinations(bins, 2)
        )
        n_pairs = len(bins) * (len(bins) - 1) // 2
        trend = "rising" if s > 0 else "falling" if s < 0 else "flat"
        assert out[cell] == (s, n_pairs, trend), cell


def test_tile_changepoint_semantics(spark):
    """CUSUM argmax recomputed in pandas over the densified bins must
    match the SQL operator, including the scaled integer statistic and
    earliest-bin tie-break."""
    from fast_carpenter_spark.queries import q_tile_changepoint, _tile_trend_sql

    spark.read.parquet("/root/testdata/sf0.001/events.parquet").createOrReplaceTempView(
        "events"
    )
    out = {r["cell"]: (r["change_tb"], r["s_t"], r["direction"])
           for r in q_tile_changepoint(spark, "/root/testdata/sf0.001").collect()}
    ev_sql = _tile_trend_sql("spark").split("cb0 AS")[0].replace("WITH ev AS (", "")
    ev = spark.sql(ev_sql.rsplit("),", 1)[0]).toPandas()
    bins = sorted(ev.tb.unique())
    T = len(bins)
    for cell, g in ev.groupby("cell"):
        counts = g.groupby("tb").size().reindex(bins, fill_value=0).tolist()
        N = sum(counts)
        best = None
        pf = 0
        for t, (tb, n) in enumerate(zip(bins, counts), start=1):
            if t == T:
                break
            pf += n
            s = T * pf - t * N
            if best is None or abs(s) > abs(best[1]):
                best = (tb, s)
        direction = "drop_after" if best[1] > 0 else "rise_after" if best[1] < 0 else "none"
        assert out[cell] == (best[0], best[1], direction), cell
