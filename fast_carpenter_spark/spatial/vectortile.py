"""Vector-tile primitives: segment→tile clipping and raster→vector contours.

The serving-layer counterpart of the tile aggregates: ``tile_clip_sql``
cuts every trajectory segment into per-tile clipped pieces (the geometry
step of MVT-style vector-tile generation — each tile must carry only the
portion of each feature inside its bounds), and ``tile_contour_sql``
classifies the 2x2 marching-squares case of the above-mean density region
(the raster→vector iso-contour extraction step).

Both are pure dual-dialect SQL (Spark + DuckDB oracle) built from the
packed-grid primitives in ``grid.py`` — no UDFs, whole plans codegen.

Scale shapes
------------
tile_clip: ONE user_id window shuffle to form segments, then a two-level
map-side explode that is PROPORTIONAL TO TILES ACTUALLY TOUCHED, not to
the bounding-box area: the first explode walks the x-columns the segment's
x-extent covers (<= 2^res), and for each column the segment's parametric
t-interval inside that column bounds the y-rows to explode — the classic
DDA supercover.  A bbox explode would be O(w*h) per segment (65k tiles at
res 8 for a cross-hemisphere segment); this is O(w + h).

tile_contour: one groupBy at tile grain (bounded 4^res keys), a 1-row
global mean attach (broadcast), a map-side explode shifting each hot
cell onto its four candidate anchors, and one more bounded groupBy.
(An earlier 4-branch UNION ALL draft recomputed the corpus-scan `hot`
aggregate per branch — Spark inlines CTEs — so the explode form is the
one that survives 100 TB.)

Float determinism: every coordinate expression is +,-,*,/ and
least/greatest on doubles with identical text in both dialects —
correctly-rounded IEEE ops, so clip endpoints and keep decisions are
bit-identical (same discipline as trajectory_length_sql; no trig).
"""

from __future__ import annotations

from .. import grid

CLIP_RES = 4


def _seg_base_sql(dialect: str) -> str:
    """Consecutive-event segments per user with a stable seg_id (ordering
    pinned by (us, event_id) — same recipe as the other trajectory ops)."""
    from .trajectory import _coords_sql

    lon, lat = _coords_sql()
    if dialect == "spark":
        us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    else:
        us = "epoch_us(ts)"
    return f"""
ev AS (
  SELECT user_id, event_id, {us} AS us, {lon} AS lon, {lat} AS lat FROM events
),
seg AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS seg_id,
         lon AS x0, lat AS y0,
         lead(lon) OVER (PARTITION BY user_id ORDER BY us, event_id) AS x1,
         lead(lat) OVER (PARTITION BY user_id ORDER BY us, event_id) AS y1
  FROM ev
),
sg AS (
  SELECT user_id, seg_id, x0, y0, x1, y1, x1 - x0 AS dx, y1 - y0 AS dy
  FROM seg WHERE x1 IS NOT NULL AND NOT (x1 - x0 = 0 AND y1 - y0 = 0)
)"""


def tile_clip_sql(dialect: str, res: int = CLIP_RES) -> str:
    """Per-tile Liang–Barsky clip of every trajectory segment.

    For each segment and each tile it touches, emits the clipped piece
    (cx0, cy0)→(cx1, cy1) with t0 = max(0, slab entries) and
    t1 = min(1, slab exits); tiles with t0 >= t1 (miss or corner graze)
    are dropped.  Axis-aligned slabs make the parametric form exact:
    no polygon math, only divisions by dx/dy guarded by CASE for the
    axis-parallel degenerate cases.
    """
    n = 1 << res
    gw = 360.0 / n  # tile width (lon degrees)
    gh = 180.0 / n  # tile height (lat degrees)

    # x-column explode bounds: grid x of both endpoints (clamped ints)
    cx0 = grid.cell_x_sql("x0", res, dialect)
    cx1 = grid.cell_x_sql("x1", res, dialect)
    # per-column slab [gx0, gx0+gw): parametric t of the two x borders
    gx0 = f"(-180.0 + CAST(ix AS DOUBLE) * {gw!r})"
    txa = f"(({gx0} - x0) / dx)"
    txb = f"((({gx0} + {gw!r}) - x0) / dx)"
    tx_lo = f"(CASE WHEN dx = 0 THEN 0.0 ELSE LEAST({txa}, {txb}) END)"
    tx_hi = f"(CASE WHEN dx = 0 THEN 1.0 ELSE GREATEST({txa}, {txb}) END)"
    # y extent of the segment within this column (t clamped to [0,1])
    tca = f"GREATEST({tx_lo}, 0.0)"
    tcb = f"LEAST({tx_hi}, 1.0)"
    ya = f"(y0 + dy * {tca})"
    yb = f"(y0 + dy * {tcb})"
    cylo = grid.cell_y_sql(f"LEAST({ya}, {yb})", res, dialect)
    cyhi = grid.cell_y_sql(f"GREATEST({ya}, {yb})", res, dialect)

    # per-tile y slab
    gy0 = f"(-90.0 + CAST(iy AS DOUBLE) * {gh!r})"
    tya = f"(({gy0} - y0) / dy)"
    tyb = f"((({gy0} + {gh!r}) - y0) / dy)"
    ty_lo = f"(CASE WHEN dy = 0 THEN 0.0 ELSE LEAST({tya}, {tyb}) END)"
    ty_hi = f"(CASE WHEN dy = 0 THEN 1.0 ELSE GREATEST({tya}, {tyb}) END)"
    t0 = f"GREATEST(GREATEST(tx_lo, {ty_lo}), 0.0)"
    t1 = f"LEAST(LEAST(tx_hi, {ty_hi}), 1.0)"

    if dialect == "spark":
        cols_from = (
            f"FROM sg LATERAL VIEW explode(sequence(LEAST({cx0}, {cx1}), "
            f"GREATEST({cx0}, {cx1}))) _cx AS ix"
        )
        ix_expr = "ix"
        rows_from = "FROM cols LATERAL VIEW explode(sequence(cylo, cyhi)) _cy AS iy"
        iy_expr = "iy"
    else:
        cols_from = "FROM sg"
        ix_expr = (
            f"unnest(range(LEAST({cx0}, {cx1}), GREATEST({cx0}, {cx1}) + 1))"
        )
        rows_from = "FROM cols"
        iy_expr = "unnest(range(cylo, cyhi + 1))"

    return f"""
WITH {_seg_base_sql(dialect)},
xcols AS (
  SELECT user_id, seg_id, x0, y0, dx, dy, {ix_expr} AS ix
  {cols_from}
),
cols AS (
  SELECT user_id, seg_id, x0, y0, dx, dy, ix,
         {tx_lo} AS tx_lo, {tx_hi} AS tx_hi,
         {cylo} AS cylo, {cyhi} AS cyhi
  FROM xcols
),
tiles AS (
  SELECT user_id, seg_id, x0, y0, dx, dy, ix, tx_lo, tx_hi, {iy_expr} AS iy
  {rows_from}
),
clipped AS (
  SELECT user_id, seg_id, ix, iy, x0, y0, dx, dy,
         {t0} AS t0, {t1} AS t1
  FROM tiles
)
SELECT {grid.pack_sql(res, 'ix', 'iy')} AS cell,
       user_id, CAST(seg_id AS BIGINT) AS seg_id,
       x0 + dx * t0 AS cx0, y0 + dy * t0 AS cy0,
       x0 + dx * t1 AS cx1, y0 + dy * t1 AS cy1
FROM clipped WHERE t0 < t1
"""


CONTOUR_RES = 4


def tile_contour_sql(points_sql: str, dialect: str, res: int = CONTOUR_RES) -> str:
    """Marching-squares case classification of the above-mean density
    region of the tile histogram built from ``points_sql`` (columns lon,
    lat).

    Corner convention: anchor (ax, ay) owns corners (ax, ay)=bit 1,
    (ax+1, ay)=bit 2, (ax, ay+1)=bit 4, (ax+1, ay+1)=bit 8; a corner is
    set iff its cell count exceeds the GLOBAL MEAN count (one exact
    BIGINT sum divided once — bit-identical across engines, and
    scale-free where a fixed threshold would degenerate as density
    grows).  Anchors with case 0 (all cold / empty) never materialise;
    case 15 (interior) is filtered — what remains is the iso-contour
    band, each anchor tagged with its standard marching-squares case.
    """
    n = 1 << res
    cell = grid.cell_sql("lon", "lat", res, dialect)
    # Each hot cell (x, y) contributes to up to 4 anchors (x-sx, y-sy),
    # sx, sy in {0,1}, with corner weight (1+sx)*(1+3*sy) = 1/2/4/8 —
    # a single map-side double explode, NOT a 4-branch UNION: Spark
    # inlines CTEs, so a union would recompute the corpus-scan `hot`
    # aggregate once per branch (4 scans at 100 TB).
    if dialect == "spark":
        sx_expr, sx_from = "sx", "LATERAL VIEW explode(array(0, 1)) _sx AS sx"
        sy_expr, sy_from = "sy", "LATERAL VIEW explode(array(0, 1)) _sy AS sy"
    else:
        sx_expr, sx_from = "unnest([0, 1])", ""
        sy_expr, sy_from = "unnest([0, 1])", ""
    return f"""
WITH counts AS (
  SELECT {cell} AS cell, count(*) AS c_n FROM ({points_sql}) GROUP BY 1
),
m AS (
  SELECT CAST(sum(c_n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_n
  FROM counts
),
hot AS (
  SELECT {grid.unpack_x_sql('cell', dialect)} AS x,
         {grid.unpack_y_sql('cell', dialect)} AS y
  FROM counts, m WHERE CAST(c_n AS DOUBLE) > mean_n
),
hx AS (
  SELECT x, y, {sx_expr} AS sx FROM hot {sx_from}
),
hxy AS (
  SELECT x, y, sx, {sy_expr} AS sy FROM hx {sy_from}
),
cases AS (
  SELECT x - sx AS ax, y - sy AS ay,
         CAST(sum((1 + sx) * (1 + 3 * sy)) AS INT) AS case_idx
  FROM hxy
  WHERE x - sx >= 0 AND x - sx <= {n - 2}
    AND y - sy >= 0 AND y - sy <= {n - 2}
  GROUP BY 1, 2
)
SELECT {grid.pack_sql(res, 'ax', 'ay')} AS cell, case_idx
FROM cases WHERE case_idx < 15
"""


MORPH_RES = 4
MORPH_MIN_N = 4


def tile_morph_sql(points_sql: str, dialect: str, *, res: int = MORPH_RES,
                   min_n: int = MORPH_MIN_N) -> str:
    """Morphological OPENING (erode → dilate, 3×3 structuring element) of
    the dense-cell mask — the raster denoise step that removes isolated
    specks while preserving the bulk of each hot region (the cheap
    cell-space stand-in for polygon negative-then-positive buffering).

    Border convention: out-of-grid is NOT in the mask, so erosion at the
    grid border requires all in-grid neighbours AND fails on the missing
    ones — the standard zero-padded binary erosion.  Erosion is computed
    by spreading every mask cell to its 3×3 neighbourhood and keeping
    the cells that received all 9 contributions; dilation spreads the
    eroded set the same way and dedups.

    Output: (cell, was_hot) for every cell of the opening — was_hot = 1
    for cells of the original mask, 0 for cells the dilation grew outside
    it (possible only at concavities; the flag exposes the full opening
    rather than silently intersecting it with the input).

    Scale shape: two constant 9-way map-side explodes + two aggregates
    and one left join, ALL bounded by grid cardinality (4^res); the only
    corpus-sized operation is the initial cell histogram.
    """
    n = 1 << res
    cell = grid.cell_sql("lon", "lat", res, dialect)
    if dialect == "spark":
        d_from = ("LATERAL VIEW explode(sequence(-1, 1)) _dx AS dx "
                  "LATERAL VIEW explode(sequence(-1, 1)) _dy AS dy")
    else:
        d_from = ", (SELECT unnest(range(-1, 2)) AS dx), (SELECT unnest(range(-1, 2)) AS dy)"
    in_grid = (f"x + dx >= 0 AND x + dx <= {n - 1} "
               f"AND y + dy >= 0 AND y + dy <= {n - 1}")
    return f"""
WITH counts AS (
  SELECT {cell} AS cell, count(*) AS c_n FROM ({points_sql}) GROUP BY 1
),
hot AS (
  SELECT {grid.unpack_x_sql('cell', dialect)} AS x,
         {grid.unpack_y_sql('cell', dialect)} AS y
  FROM counts WHERE c_n >= {min_n}
),
eroded AS (
  SELECT x + dx AS x, y + dy AS y
  FROM hot {d_from}
  WHERE {in_grid}
  GROUP BY 1, 2 HAVING count(*) = 9
),
opened AS (
  SELECT DISTINCT x + dx AS x, y + dy AS y
  FROM eroded {d_from}
  WHERE {in_grid}
)
SELECT {grid.pack_sql(res, 'o.x', 'o.y')} AS cell,
       CAST(CASE WHEN h.x IS NULL THEN 0 ELSE 1 END AS INT) AS was_hot
FROM opened o LEFT JOIN hot h ON h.x = o.x AND h.y = o.y
"""
