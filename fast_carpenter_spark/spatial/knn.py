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

import math

from pyspark.sql import DataFrame, Window, functions as F

from .. import grid


def auto_res(n_points: int, target_per_cell: float = 5.0, lo: int = 3, hi: int = 20) -> int:
    """Density-adaptive grid resolution: ~target_per_cell points per cell
    (4^res cells).  A fixed resolution blows up quadratically with density —
    candidates/point = ring_cells * density — so resolution MUST scale with
    the point count (the 100 TB knob)."""
    cells_needed = max(1.0, n_points / target_per_cell)
    res = math.ceil(math.log(cells_needed, 4))
    return max(lo, min(hi, res))


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


def knn_local(
    points: DataFrame,
    *,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 5,
    ring: int = 1,
    k: int = 3,
    hot_threshold: int = 4000,
    nsalt: int = 16,
    group_offset: int = 5,
) -> DataFrame:
    """Scale-path kNN: identical semantics to ``knn_bounded`` (ring
    candidates, (dist2, id) tie-break) but executed as per-cell LOCAL
    search.

    Shape: each point is replicated to the (2R+1)^2 cells it can serve as a
    candidate for (~9x rows, one shuffle keyed by cell), then an
    Arrow-batched ``applyInPandas`` computes top-k per cell with chunked
    numpy — dense, vectorized, node-local.  The window-function variant
    shuffles every candidate PAIR; this shuffles only points.

    Hot-cell skew: a cell with > ``hot_threshold`` home points would become
    one straggler task (its dense block is quadratic in the cell
    population), so hot cells are SALTED — their queries are split over
    ``nsalt`` sub-groups (salt = hash(id) % nsalt) while every candidate is
    replicated to all salts.  Same results, nsalt-way parallel.
    """
    import numpy as np
    import pandas as pd

    n = 1 << res
    pts = points.select(
        F.col(id_col).alias("_id"),
        F.col(lon_col).alias("_lon"),
        F.col(lat_col).alias("_lat"),
        F.expr(grid.cell_x_sql(lon_col, res, "spark")).alias("_cx"),
        F.expr(grid.cell_y_sql(lat_col, res, "spark")).alias("_cy"),
    )
    # replicate each point into every ring cell it could serve; mark whether
    # this row is in its home cell (a "core" point needing neighbours here)
    members = pts.select(
        "_id", "_lon", "_lat", "_cx", "_cy",
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
        ((F.col("_cx") == F.col("_nc.x")) & (F.col("_cy") == F.col("_nc.y"))).alias("_core"),
    )

    # hot-cell detection: tiny aggregate over home cells, broadcast back
    home_cell = grid.pack_sql(res, "_cx", "_cy")
    hot = (
        pts.groupBy(F.expr(home_cell).alias("_cell"))
        .count()
        .filter(F.col("count") > hot_threshold)
        .select("_cell")
    )
    members = members.join(
        F.broadcast(hot.withColumn("_hot", F.lit(True))), "_cell", "left"
    ).withColumn("_hot", F.coalesce("_hot", F.lit(False)))
    members = (
        members.withColumn(
            "_my_salt",
            F.when(F.col("_hot"), F.pmod(F.xxhash64("_id"), F.lit(nsalt)).cast("int"))
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "_salt",
            F.explode(
                F.when(F.col("_hot"), F.expr(f"sequence(0, {nsalt - 1})"))
                .otherwise(F.expr("array(0)"))
            ),
        )
        # a point is core only in its own salt sub-group of its home cell
        .withColumn("_core", F.col("_core") & (F.col("_salt") == F.col("_my_salt")))
        .drop("_hot", "_my_salt")
    )

    out_schema = (
        f"{id_col} long, neighbor_id long, rank int, dist2 double"
    )

    def _dense_topk(ids, lon, lat, core, acc):
        """Exact top-k inside one cell segment — all numpy.  STABLE argsort:
        equal distances keep column order, and candidates are pre-sorted by
        id, so ties break (dist2 asc, id asc) exactly."""
        q_idx = np.nonzero(core)[0]
        if len(q_idx) == 0 or len(ids) < 2:
            return
        order = np.argsort(ids, kind="stable")
        ids_s, lon_s, lat_s = ids[order], lon[order], lat[order]
        q_ids, q_lon, q_lat = ids[q_idx], lon[q_idx], lat[q_idx]
        kk = min(k, len(ids_s))
        chunk = max(1, int(4_000_000 // max(len(ids_s), 1)))  # bound dense block
        for s in range(0, len(q_idx), chunk):
            dlon = q_lon[s : s + chunk][:, None] - lon_s[None, :]
            dlat = q_lat[s : s + chunk][:, None] - lat_s[None, :]
            d2 = dlon * dlon + dlat * dlat
            d2[q_ids[s : s + chunk][:, None] == ids_s[None, :]] = np.inf
            idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            vals = np.take_along_axis(d2, idx, axis=1)
            mask = np.isfinite(vals).ravel()
            acc.append(
                (
                    np.repeat(q_ids[s : s + chunk], kk)[mask],
                    ids_s[idx].ravel()[mask],
                    np.tile(np.arange(1, kk + 1, dtype=np.int32), d2.shape[0])[mask],
                    vals.ravel()[mask],
                )
            )

    def local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        # one group = one PARENT cell (x salt): loop its subcell segments in
        # numpy — ~4^offset fewer Python/Arrow round trips than per-cell
        # grouping, which dominated wall time at fine resolutions
        cells = pdf["_cell"].to_numpy()
        order = np.argsort(cells, kind="stable")
        cells = cells[order]
        ids = pdf["_id"].to_numpy()[order]
        lon = pdf["_lon"].to_numpy()[order]
        lat = pdf["_lat"].to_numpy()[order]
        core = pdf["_core"].to_numpy()[order]
        bounds = np.nonzero(np.diff(cells))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cells)]])
        acc: list = []
        for s, e in zip(starts, ends):
            _dense_topk(ids[s:e], lon[s:e], lat[s:e], core[s:e], acc)
        if not acc:
            return pd.DataFrame(
                {id_col: [], "neighbor_id": [], "rank": [], "dist2": []}
            ).astype(
                {id_col: "int64", "neighbor_id": "int64", "rank": "int32", "dist2": "float64"}
            )
        return pd.DataFrame(
            {
                id_col: np.concatenate([a[0] for a in acc]),
                "neighbor_id": np.concatenate([a[1] for a in acc]),
                "rank": np.concatenate([a[2] for a in acc]),
                "dist2": np.concatenate([a[3] for a in acc]),
            }
        )

    # parent-cell grouping at res - group_offset: offset 5 => 4^5 = 1024
    # subcells per Arrow group — measured 2x faster and far less variance
    # than offset 4 (bigger batches amortize the Arrow/pandas per-group
    # cost) while keeping >= 1024 groups of parallelism
    group_res = max(res - group_offset, 0)
    members = members.withColumn(
        "_pcell", F.expr(grid.parent_sql("_cell", res, group_res, "spark"))
    )
    return members.groupBy("_pcell", "_salt").applyInPandas(local_topk, schema=out_schema)


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


def radius_join(
    points: DataFrame,
    *,
    radius: float,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int | None = None,
) -> DataFrame:
    """Distance (DWithin) self-join: all pairs (a < b) within planar
    ``radius`` degrees.  Candidates come from an asymmetric cell ring —
    rx = ceil(radius / lon_cell_width), ry = ceil(radius / lat_cell_height)
    — which is a superset of the disk, then the exact distance filter
    refines.  One BIGINT-keyed shuffle join; resolution defaults to cells
    about one radius tall so the ring stays ~3x3."""
    if res is None:
        res = max(1, min(20, int(math.floor(math.log2(180.0 / radius)))))
    n = 1 << res
    rx = max(1, math.ceil(radius / (360.0 / n)))
    ry = max(1, math.ceil(radius / (180.0 / n)))
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
                f"flatten(transform(sequence(-{rx}, {rx}), dx -> "
                f"transform(sequence(-{ry}, {ry}), dy -> "
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
    cand = ring_cells.join(others, "_cell").filter(F.col("_id") < F.col("_nbr"))
    d2 = (
        (F.col("_lon") - F.col("_nlon")) * (F.col("_lon") - F.col("_nlon"))
        + (F.col("_lat") - F.col("_nlat")) * (F.col("_lat") - F.col("_nlat"))
    )
    return (
        cand.withColumn("dist2", d2)
        .filter(F.col("dist2") <= radius * radius)
        .select(
            F.col("_id").alias("doc_a"),
            F.col("_nbr").alias("doc_b"),
            "dist2",
        )
    )


def radius_join_oracle_sql(points_sql: str, *, radius: float) -> str:
    """DuckDB ground truth: brute-force all pairs, exact distance filter."""
    return f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       (a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat) AS dist2
FROM ({points_sql}) a JOIN ({points_sql}) b
  ON a.doc_id < b.doc_id
WHERE (a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat) <= {radius!r} * {radius!r}
"""
