"""kNN neighbor lists via cell-ring expansion.

Per-document nearest neighbours: each document is represented by its first
span's point; candidates are documents whose cell lies within Chebyshev
radius ``ring`` of the query's cell at resolution ``res``; the top-k by
(squared planar distance, neighbor doc_id) win — a deterministic tie-break
so the DuckDB oracle reproduces the exact rows (SURVEY.md §7 risk 5).

Implementation is pure DataFrame algebra:
* explode each point over its (2R+1)^2 ring cells (a tiny constant-size
  ``sequence`` cross — codegen'd, no UDF);
* hash equi-join ring cells against the points-by-cell table — the only
  shuffle, keyed by BIGINT cell;
* window ``row_number() over (partition by doc order by dist2, nbr)`` <= k.

The bounded ring radius makes the operator a single join round — the
scale-out path (vs. iterative expansion which needs unbounded rounds;
documented trade-off in SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import grid


def knn_bounded(
    points: DataFrame,
    *,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 5,
    ring: int = 1,
    k: int = 3,
) -> DataFrame:
    """(id, nbr_id, rank, dist2) top-k rows per point."""
    n = 1 << res
    pts = points.select(
        F.col(id_col).alias("_id"),
        F.col(lon_col).alias("_lon"),
        F.col(lat_col).alias("_lat"),
        F.expr(grid.cell_x_sql(lon_col, res, "spark")).alias("_cx"),
        F.expr(grid.cell_y_sql(lat_col, res, "spark")).alias("_cy"),
    )

    ring_cells = pts.select(
        "_id", "_lon", "_lat",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-{ring}, {ring}), dx -> "
                f"transform(sequence(-{ring}, {ring}), dy -> "
                f"struct(_cx + dx AS x, _cy + dy AS y))))"
            )
        ).alias("_nc"),
    ).filter(
        (F.col("_nc.x") >= 0) & (F.col("_nc.x") < n)
        & (F.col("_nc.y") >= 0) & (F.col("_nc.y") < n)
    ).select(
        "_id", "_lon", "_lat",
        F.expr(grid.pack_sql(res, "_nc.x", "_nc.y")).alias("_cell"),
    )

    others = pts.select(
        F.col("_id").alias("_nbr"),
        F.col("_lon").alias("_nlon"),
        F.col("_lat").alias("_nlat"),
        F.expr(grid.pack_sql(res, "_cx", "_cy")).alias("_cell"),
    )

    cand = ring_cells.join(others, "_cell").filter(F.col("_id") != F.col("_nbr"))
    cand = cand.withColumn(
        "dist2",
        (F.col("_lon") - F.col("_nlon")) * (F.col("_lon") - F.col("_nlon"))
        + (F.col("_lat") - F.col("_nlat")) * (F.col("_lat") - F.col("_nlat")),
    )
    w = Window.partitionBy("_id").orderBy(F.col("dist2").asc(), F.col("_nbr").asc())
    out = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            F.col("_nbr").alias("neighbor_id"),
            "rank",
            "dist2",
        )
    )
    return out


def knn_oracle_sql(points_sql: str, *, res: int, ring: int, k: int) -> str:
    """DuckDB ground truth: all pairs filtered by cell Chebyshev distance
    <= ring at ``res`` (identical axis math), ranked identically."""
    return f"""
WITH pts AS (
  SELECT *,
         CAST(LEAST(GREATEST(FLOOR((lon - (-180.0)) / 360.0 * {float(1 << res)!r}), 0.0), {float((1 << res) - 1)!r}) AS BIGINT) AS cx,
         CAST(LEAST(GREATEST(FLOOR((lat - (-90.0)) / 180.0 * {float(1 << res)!r}), 0.0), {float((1 << res) - 1)!r}) AS BIGINT) AS cy
  FROM ({points_sql})
),
cand AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS neighbor_id,
         (a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat) AS dist2
  FROM pts a JOIN pts b
    ON abs(a.cx - b.cx) <= {ring} AND abs(a.cy - b.cy) <= {ring}
   AND a.doc_id != b.doc_id
)
SELECT doc_id, neighbor_id, CAST(rank AS INT) AS rank, dist2 FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY dist2, neighbor_id) AS rank
  FROM cand
) WHERE rank <= {k}
"""
