"""Raster <-> vector join: tile-key equi-join.

The raster layer is a dense grid of tiles at a fixed zoom whose tile ids
use the same packed-cell encoding as the engine (grid.pack_sql), so the
join is a plain BIGINT equi-join — broadcastable when the raster fits,
shuffle-on-cell otherwise.  Per-doc output carries the sampled tile value;
per-tile aggregates reuse the BinnedDataframe machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import grid
from ..synth import raster_sql


def raster_vector_join(
    points: DataFrame,
    *,
    res: int = 6,
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast: bool = True,
) -> DataFrame:
    """points + (tile_id, zoom, tile_value) of the tile containing each point."""
    spark = points.sparkSession
    raster = spark.sql(raster_sql("spark", res))
    keyed = points.withColumn(
        "tile_id", F.expr(grid.cell_sql(lon_col, lat_col, res, "spark"))
    )
    r = F.broadcast(raster) if broadcast else raster
    return keyed.join(r, "tile_id", "inner")


def tile_centers(spark, res: int = 6) -> DataFrame:
    """Raster tiles with their center coordinates as point rows."""
    n = 1 << res
    raster = spark.sql(raster_sql("spark", res))
    x = grid.unpack_x_sql("tile_id", "spark")
    y = grid.unpack_y_sql("tile_id", "spark")
    cx = f"(CAST({x} AS DOUBLE) + 0.5) / {float(n)!r} * 360.0 - 180.0"
    cy = f"(CAST({y} AS DOUBLE) + 0.5) / {float(n)!r} * 180.0 - 90.0"
    return raster.selectExpr("tile_id", "zoom", "tile_value", f"{cx} AS lon", f"{cy} AS lat")


def zonal_stats(spark, polygons: list[dict], *, res: int = 6) -> DataFrame:
    """Per-polygon raster aggregate (zonal statistics): tiles whose CENTER
    lies inside the polygon contribute (n_tiles, sum, sum-of-squares of
    tile_value).  Reuses the spatial-join machinery on tile centers —
    cover equi-join + exact PIP refine; the raster side is generated, the
    polygon side broadcast."""
    from .join import SpatialJoinStage

    centers = tile_centers(spark, res)
    joined = SpatialJoinStage(name="zonal", polygons=polygons).apply(centers)
    return joined.groupBy("poly_id", "region").agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum("tile_value").alias("sum_value"),
        F.sum(F.col("tile_value") * F.col("tile_value")).alias("sum_value2"),
    )
