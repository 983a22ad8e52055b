"""Grid kernels: SQL fragments vs numpy kernels, pack/unpack, Hilbert.

Mirrors the reference's kernel-level unit tests on hand-built arrays
(ref: /root/reference/tests/define/test_reductions.py:7-105).
"""

import numpy as np
import pytest

from fast_carpenter_spark import grid


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(42)
    res = 16
    x = rng.randint(0, 1 << res, size=1000)
    y = rng.randint(0, 1 << res, size=1000)
    cells = grid.pack_cells(res, x, y)
    r2, x2, y2 = grid.unpack_cells(cells)
    assert (r2 == res).all()
    assert (x2 == x).all()
    assert (y2 == y).all()


def test_parent_cells():
    cells = grid.pack_cells(16, np.array([65535, 0, 32768]), np.array([1, 2, 3]))
    parents = grid.parent_cells(cells, 8)
    r, x, y = grid.unpack_cells(parents)
    assert (r == 8).all()
    assert list(x) == [255, 0, 128]
    assert list(y) == [0, 0, 0]


def test_encode_clamps_extremes():
    x, y = grid.encode_xy(np.array([-180.0, 180.0]), np.array([-90.0, 90.0]), 4)
    assert list(x) == [0, 15]
    assert list(y) == [0, 15]


def test_sql_matches_numpy(spark):
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    pdf = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    res = 12
    got = (
        pdf.selectExpr(grid.cell_sql("lon", "lat", res, "spark") + " AS cell")
        .toPandas()["cell"]
        .values
    )
    want = grid.encode_cells(lon, lat, res)
    assert (got == want).all()


def test_sql_parent_matches_numpy(spark):
    rng = np.random.RandomState(8)
    cells = grid.pack_cells(
        12, rng.randint(0, 1 << 12, 200), rng.randint(0, 1 << 12, 200)
    )
    pdf = spark.createDataFrame([(int(c),) for c in cells], "cell bigint")
    got = (
        pdf.selectExpr(grid.parent_sql("cell", 12, 5, "spark") + " AS p")
        .toPandas()["p"]
        .values
    )
    want = grid.parent_cells(cells, 5)
    assert (got == want).all()


def test_duckdb_sql_matches_numpy():
    import duckdb

    rng = np.random.RandomState(9)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lon, lat)))
    got = con.execute(
        f"SELECT {grid.cell_sql('lon', 'lat', 12, 'duck')} FROM pts"
    ).fetchnumpy()
    want = grid.encode_cells(lon, lat, 12)
    assert (list(got.values())[0] == want).all()


def test_hilbert_bijection_small():
    order = 4
    n = 1 << order
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    d = grid.hilbert_key(gx.ravel(), gy.ravel(), order)
    assert sorted(d.tolist()) == list(range(n * n))


def test_hilbert_locality():
    # consecutive d values must be grid neighbours (property of the curve)
    order = 5
    n = 1 << order
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = gx.ravel(), gy.ravel()
    d = grid.hilbert_key(xs, ys, order)
    order_idx = np.argsort(d)
    dx = np.abs(np.diff(xs[order_idx]))
    dy = np.abs(np.diff(ys[order_idx]))
    assert ((dx + dy) == 1).all()


def test_k_ring():
    cells = grid.k_ring(0, 0, 1, 4)
    assert sorted(cells) == [(0, 0), (0, 1), (1, 0), (1, 1)]
    cells = grid.k_ring(5, 5, 1, 4)
    assert len(cells) == 9


def test_parent_res_validation():
    with pytest.raises(ValueError):
        grid.parent_sql("cell", 4, 8, "spark")
