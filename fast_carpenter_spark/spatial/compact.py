"""Cell-set compaction — the H3 ``compact`` primitive for the quadtree grid.

Given the set of OCCUPIED cells at one resolution, emit the minimal
mixed-resolution cell set covering exactly the same area: bottom-up,
every complete 4-sibling group is replaced by its parent, recursively.
The compacted set is what a tile server ships and what a spatial filter
pushes down (a compact cover turns thousands of leaf cells into a handful
of range predicates on the packed cell id).

Plan shape: one window (count over sibling group) per level, levels fixed
by the resolution span (res_from - res_to <= 28), data shrinking >= 4x per
level — a LINEAR chain like tile_pyramid, no iteration at run time, no
driver-side data.  Each level's shuffle key is the parent cell, which the
packed id makes a pure arithmetic derivation (codegen, no UDF).

The DuckDB oracle runs the same fixed-level algorithm as a generated WITH
chain — independent evaluation of each level on the other engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import grid


def compact_cells(cells: DataFrame, res_from: int, res_to: int) -> DataFrame:
    """Compact a distinct single-column ``cell`` set at ``res_from`` down
    to (at most) ``res_to``.  Returns (cell, res)."""
    assert res_from > res_to >= 0
    pieces = []
    cur = cells.select("cell").distinct()
    for r in range(res_from, res_to, -1):
        with_p = cur.withColumn(
            "_p", F.expr(grid.parent_sql("cell", r, r - 1, "spark"))
        ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("_p")))
        pieces.append(with_p.filter("_n < 4").select("cell"))
        cur = with_p.filter("_n = 4").select(F.col("_p").alias("cell")).distinct()
    pieces.append(cur.select("cell"))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.select(
        "cell", F.expr(grid.unpack_res_sql("cell", "spark")).cast("int").alias("res")
    )


def compact_oracle_sql(cells_sql: str, res_from: int, res_to: int) -> str:
    """DuckDB twin: the same bottom-up fixed-level chain as a WITH chain.
    ``cells_sql`` must yield a single distinct BIGINT column ``cell``."""
    assert res_from > res_to >= 0
    parts = [f"c{res_from} AS ({cells_sql})"]
    keeps = []
    for r in range(res_from, res_to, -1):
        parent = grid.parent_sql("cell", r, r - 1, "duck")
        parts.append(
            f"l{r} AS (SELECT cell, _p, count(*) OVER (PARTITION BY _p) AS _n "
            f"FROM (SELECT cell, {parent} AS _p FROM c{r}))"
        )
        parts.append(f"k{r} AS (SELECT cell FROM l{r} WHERE _n < 4)")
        parts.append(f"c{r - 1} AS (SELECT DISTINCT _p AS cell FROM l{r} WHERE _n = 4)")
        keeps.append(f"SELECT cell FROM k{r}")
    keeps.append(f"SELECT cell FROM c{res_to}")
    union = " UNION ALL ".join(keeps)
    res_expr = grid.unpack_res_sql("cell", "duck")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT cell, CAST({res_expr} AS INT) AS res FROM ({union})"
    )


def uncompact_cells(cells: DataFrame, res_to: int) -> DataFrame:
    """Inverse of :func:`compact_cells`: expand a mixed-resolution cell
    set to the uniform ``res_to`` leaf set.  Pure codegen — one explode of
    a generated child-offset sequence per row, 4^(res_to - r) children per
    cell; no join, no shuffle (map-side explode, like the cover explode in
    the spatial join)."""
    x = grid.unpack_x_sql("cell", "spark")
    y = grid.unpack_y_sql("cell", "spark")
    r = grid.unpack_res_sql("cell", "spark")
    # Guard the mirror of compact_cells' res assert: a cell FINER than
    # res_to would make the shift negative and silently emit an empty
    # sequence (wrong output) — fail loudly instead.
    span = (
        f"CASE WHEN CAST({r} AS INT) > {res_to} THEN "
        f"CAST(raise_error(concat('uncompact_cells: cell res ', CAST({r} AS STRING),"
        f" ' exceeds res_to {res_to}')) AS BIGINT) "
        f"ELSE shiftleft(CAST(1 AS BIGINT), {res_to} - CAST({r} AS INT)) END"
    )
    child = grid.pack_sql(
        res_to,
        f"(({x}) * _s + _i DIV _s)",
        f"(({y}) * _s + _i % _s)",
    )
    return (
        cells.withColumn("_s", F.expr(span))
        .select(
            "cell",
            F.explode(F.expr("sequence(CAST(0 AS BIGINT), _s * _s - 1)")).alias("_i"),
            "_s",
        )
        .select(F.expr(child).alias("cell"))
    )


def uncompact_oracle_sql(cells_sql: str, res_to: int) -> str:
    x = grid.unpack_x_sql("cell", "duck")
    y = grid.unpack_y_sql("cell", "duck")
    r = grid.unpack_res_sql("cell", "duck")
    child = grid.pack_sql(res_to, f"(({x}) * _s + _i // _s)", f"(({y}) * _s + _i % _s)")
    return f"""
WITH src AS ({cells_sql}),
ex AS (
  SELECT cell, (CAST(1 AS BIGINT) << ({res_to} - CAST({r} AS INT))) AS _s
  FROM src
),
ch AS (
  SELECT {child} AS cell
  FROM (SELECT cell, _s, unnest(range(0, _s * _s)) AS _i FROM ex)
)
SELECT cell FROM ch
"""
