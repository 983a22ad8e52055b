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
