"""Adaptive multi-resolution tile pyramid (quadtree histogram).

The variable-resolution analogue of BinnedDataframe's fixed grid (ref:
fast_carpenter/summary/binned_dataframe.py — fixed binning spec): a cell is
SPLIT into its children while it holds more than ``threshold`` points (and
is above ``res_max``), so dense regions get fine tiles and sparse regions
coarse ones — the standard map-tile / vector-tile serving layout.

The plan is strictly LINEAR — one scan, no diamonds (a naive per-level
union recomputed the base aggregation once per level: measured 26 parquet
scans in the physical plan because Catalyst's exchange reuse does not
unify the branches):

1. ONE groupBy of the input at the finest resolution — the only shuffle
   whose key cardinality is data-sized; partial aggregation runs map-side,
   so the wire carries at most 4^res_max rows per partition.
2. Each finest cell EXPLODES into its (res_max - res_min + 1) ancestor
   cells (packed ids carry their resolution, so one BIGINT column holds
   all levels); one more groupBy yields every level's counts in a single
   bounded table (<= sum_r 4^r rows).
3. The leaf predicate is local given the parent's count, and the parent's
   count is the SUM OVER SIBLINGS at the same level — a window over
   partitionBy(parent-of-cell), no self-join:

       leaf(c) =  (n(c) <= threshold  OR  res == res_max)
             AND  (res == res_min     OR  n(parent(c)) > threshold)

   (count monotonicity up the hierarchy makes "parent over threshold"
   equivalent to "every ancestor over threshold").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import grid


def tile_pyramid(
    points: DataFrame,
    *,
    res_max: int = 8,
    res_min: int = 4,
    threshold: int = 64,
    lon_col: str = "lon",
    lat_col: str = "lat",
    weight_col: str | None = "w",
) -> DataFrame:
    """(cell, res, n, sumw) adaptive pyramid leaves covering every point
    exactly once.  ``sumw`` is omitted when ``weight_col`` is None."""
    if not (0 <= res_min <= res_max):
        raise ValueError(f"need 0 <= res_min <= res_max, got {res_min}..{res_max}")

    aggs = [F.count(F.lit(1)).alias("n")]
    roll = [F.sum("n").alias("n")]
    if weight_col is not None:
        aggs.append(F.sum(F.col(weight_col).cast("double")).alias("sumw"))
        roll.append(F.sum("sumw").alias("sumw"))

    base = (
        points.withColumn(
            "cell", F.expr(grid.cell_sql(lon_col, lat_col, res_max, "spark"))
        )
        .groupBy("cell")
        .agg(*aggs)
    )

    ancestors = F.array(
        *[
            F.expr(grid.parent_sql("cell", res_max, r, "spark"))
            for r in range(res_min, res_max + 1)
        ]
    )
    levels = (
        base.select(F.explode(ancestors).alias("cell"), "n",
                    *(["sumw"] if weight_col is not None else []))
        .groupBy("cell")
        .agg(*roll)
    )

    res_col = F.expr(grid.unpack_res_sql("cell", "spark")).cast("int")
    parent_w = Window.partitionBy(F.expr(grid.parent1_sql("cell", "spark")))
    leaf = (
        ((F.col("n") <= threshold) | (F.col("res") == res_max))
        & ((F.col("res") == res_min) | (F.col("_parent_n") > threshold))
    )
    out_cols = ["cell", "res", "n"] + (["sumw"] if weight_col is not None else [])
    return (
        levels.withColumn("res", res_col)
        .withColumn("_parent_n", F.sum("n").over(parent_w))
        .filter(leaf)
        .select(*out_cols)
    )


def tile_pyramid_oracle_sql(
    points_sql: str,
    *,
    res_max: int = 8,
    res_min: int = 4,
    threshold: int = 64,
    lon_col: str = "lon",
    lat_col: str = "lat",
    weight_col: str | None = "w",
) -> str:
    """DuckDB twin: fixed-depth CTE chain, identical leaf predicate.  The
    oracle is free to use the simple per-level formulation — only the
    engine plan needs to be scale-shaped.  Integer sums cast to BIGINT
    (DuckDB sum() returns HUGEINT, which hashes differently from int64
    despite equal values)."""
    w_sel = f", CAST(sum({weight_col}) AS DOUBLE) AS sumw" if weight_col else ""
    w_roll = ", CAST(sum(sumw) AS DOUBLE) AS sumw" if weight_col else ""
    w_out = ", sumw" if weight_col else ""
    ctes = [
        f"c{res_max} AS (SELECT {grid.cell_sql(lon_col, lat_col, res_max, 'duck')} AS cell, "
        f"count(*) AS n{w_sel} FROM ({points_sql}) GROUP BY 1)"
    ]
    for r in range(res_max - 1, res_min - 1, -1):
        ctes.append(
            f"c{r} AS (SELECT {grid.parent_sql('cell', r + 1, r, 'duck')} AS cell, "
            f"CAST(sum(n) AS BIGINT) AS n{w_roll} FROM c{r + 1} GROUP BY 1)"
        )
    branches = []
    for r in range(res_min, res_max + 1):
        self_ok = f"n <= {threshold}" if r < res_max else "TRUE"
        if r == res_min:
            cond = self_ok
        else:
            cond = (
                f"({self_ok}) AND {threshold} < ("
                f"SELECT p.n FROM c{r - 1} p "
                f"WHERE p.cell = {grid.parent_sql(f'c{r}.cell', r, r - 1, 'duck')})"
            )
        branches.append(
            f"SELECT cell, CAST({r} AS INT) AS res, n{w_out} FROM c{r} WHERE {cond}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(branches)
