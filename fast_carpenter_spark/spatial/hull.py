"""Per-group convex hull over integer point sets — exact, two-level.

The hull operator the tile/trajectory family was missing: given (group, x, y)
integer points, emit the hull VERTICES in canonical order (CCW, seq 0 at the
lowest-then-leftmost vertex, collinear mid-edge points excluded) plus the
hull size and the exact shoelace double-area.  All arithmetic is BIGINT
(cross products and the shoelace sum stay far under 2^63 for millidegree
coordinates), so the result is bit-exact and order-insensitive across
engines and partitionings.

Scale shape (the part that matters at 10^12 points):

* **Convexity is associative**: Hull(S) = Hull(Hull(S1) ∪ Hull(S2)).  Stage
  1 computes a LOCAL hull per (input partition, group) with `mapInPandas` —
  map-side, no shuffle — so the one shuffle that follows carries only
  O(hull_size) candidate vertices per group per partition (hulls of random
  point sets grow ~log n), never the raw points.  A hot group costs its
  partition count × its local hull size, not its point count — the same
  partial-aggregate discipline as every other stage in the engine, applied
  to a geometric aggregate.
* Stage 2 (`applyInPandas` after a groupBy on the group key) merges the
  candidates with one monotone chain per group — tiny inputs by then.
* Both stages are Arrow-batched numpy kernels (no per-row Python), and the
  monotone chain is O(n log n) per batch.

Oracle: an INDEPENDENT gift-wrapping (Jarvis march) as a DuckDB recursive
CTE — next hull vertex = the unique candidate with no point strictly to its
right and no farther collinear point on the forward ray — so the two
engines agree through entirely different algorithms (chain vs wrap), which
pins the geometry, not the implementation.

ref parity note: the reference has no spatial ops at all (numpy/awkward HEP
arrays); this extends the §2.4 spatial-join family the same way kNN did.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

HULL_SCHEMA = (
    "{g} long, seq int, x long, y long, hull_size int, area2 long"
)


def _chain(xs: np.ndarray, ys: np.ndarray) -> list[tuple[int, int]]:
    """Monotone chain on distinct integer points: CCW vertex cycle starting
    at the lowest-then-leftmost vertex, strict turns (collinear excluded)."""
    pts = sorted(set(zip(xs.tolist(), ys.tolist())))
    if len(pts) <= 2:
        hull = pts
    else:

        def cross(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

        lo: list[tuple[int, int]] = []
        for p in pts:
            while len(lo) >= 2 and cross(lo[-2], lo[-1], p) <= 0:
                lo.pop()
            lo.append(p)
        up: list[tuple[int, int]] = []
        for p in reversed(pts):
            while len(up) >= 2 and cross(up[-2], up[-1], p) <= 0:
                up.pop()
            up.append(p)
        hull = lo[:-1] + up[:-1]
    k = min(range(len(hull)), key=lambda i: (hull[i][1], hull[i][0]))
    return hull[k:] + hull[:k]


def _area2(hull: list[tuple[int, int]]) -> int:
    """Exact shoelace double-area of the CCW cycle (0 for degenerate)."""
    n = len(hull)
    return sum(
        hull[i][0] * hull[(i + 1) % n][1] - hull[(i + 1) % n][0] * hull[i][1]
        for i in range(n)
    )


def convex_hull(points: DataFrame, group: str = "user_id") -> DataFrame:
    """Exact per-group hull vertices + shoelace area, two-level (see module
    docstring).  `points` needs integer columns (group, x, y)."""
    spark_group_t = dict(points.dtypes)[group]

    def local_hulls(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # stage 1: per-partition candidate reduction — emits each group's
        # LOCAL hull vertices only (map-side, before the shuffle)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs = []
            for gid, g in pdf.groupby(group, sort=False):
                hull = _chain(g["x"].to_numpy(), g["y"].to_numpy())
                outs.append(
                    pd.DataFrame(
                        {group: gid, "x": [p[0] for p in hull], "y": [p[1] for p in hull]}
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    candidates = points.select(group, "x", "y").mapInPandas(
        local_hulls, schema=f"{group} {spark_group_t}, x long, y long"
    )

    def final_hull(pdf: pd.DataFrame) -> pd.DataFrame:
        hull = _chain(pdf["x"].to_numpy(), pdf["y"].to_numpy())
        a2 = _area2(hull)
        return pd.DataFrame(
            {
                group: pdf[group].iloc[0],
                "seq": np.arange(len(hull), dtype="int32"),
                "x": [p[0] for p in hull],
                "y": [p[1] for p in hull],
                "hull_size": np.int32(len(hull)),
                "area2": np.int64(a2),
            }
        )

    return candidates.groupBy(group).applyInPandas(
        final_hull, schema=HULL_SCHEMA.format(g=group)
    )


def jarvis_oracle_sql(pts_cte: str, group: str = "user_id") -> str:
    """Gift-wrapping hull as a DuckDB recursive CTE over ``pts_cte`` (a CTE
    body exposing (group, x, y) distinct integer points as ``pts``).  Next
    vertex from p = the unique n with (a) no point strictly right of p→n
    and (b) no farther collinear point on the forward ray — collinear
    mid-edge points excluded, matching the chain's strict turns."""
    g = group
    return f"""
WITH RECURSIVE pts AS ({pts_cte}),
starts AS (
  SELECT {g}, x, y FROM pts
  QUALIFY row_number() OVER (PARTITION BY {g} ORDER BY y, x) = 1
),
hull AS (
  SELECT {g}, x AS px, y AS py, x AS sx, y AS sy, 0 AS seq FROM starts
  UNION ALL
  SELECT h.{g}, n.x, n.y, h.sx, h.sy, h.seq + 1
  FROM hull h
  JOIN pts n ON n.{g} = h.{g} AND NOT (n.x = h.px AND n.y = h.py)
  WHERE NOT (h.seq > 0 AND h.px = h.sx AND h.py = h.sy)
    AND NOT EXISTS (
      SELECT 1 FROM pts r
      WHERE r.{g} = h.{g}
        AND NOT (r.x = h.px AND r.y = h.py) AND NOT (r.x = n.x AND r.y = n.y)
        AND (n.x - h.px) * (r.y - h.py) - (n.y - h.py) * (r.x - h.px) < 0
    )
    AND NOT EXISTS (
      SELECT 1 FROM pts r
      WHERE r.{g} = h.{g}
        AND NOT (r.x = h.px AND r.y = h.py) AND NOT (r.x = n.x AND r.y = n.y)
        AND (n.x - h.px) * (r.y - h.py) - (n.y - h.py) * (r.x - h.px) = 0
        AND (n.x - h.px) * (r.x - h.px) + (n.y - h.py) * (r.y - h.py) > 0
        AND (r.x - h.px) * (r.x - h.px) + (r.y - h.py) * (r.y - h.py)
            > (n.x - h.px) * (n.x - h.px) + (n.y - h.py) * (n.y - h.py)
    )
),
verts AS (
  SELECT {g}, seq, px AS x, py AS y FROM hull
  WHERE NOT (seq > 0 AND px = sx AND py = sy)
),
shoe0 AS (
  SELECT {g}, seq, x, y,
         lead(x) OVER w AS xn0, lead(y) OVER w AS yn0,
         first_value(x) OVER w AS x0, first_value(y) OVER w AS y0,
         count(*) OVER (PARTITION BY {g}) AS hull_size
  FROM verts
  WINDOW w AS (PARTITION BY {g} ORDER BY seq)
),
shoe AS (
  SELECT {g}, seq, x, y, coalesce(xn0, x0) AS xn, coalesce(yn0, y0) AS yn,
         hull_size
  FROM shoe0
),
area AS (
  SELECT {g}, CAST(sum(x * yn - xn * y) AS BIGINT) AS area2
  FROM shoe GROUP BY 1
)
SELECT s.{g} AS {g}, s.seq AS seq, s.x AS x, s.y AS y,
       CAST(s.hull_size AS INT) AS hull_size, a.area2 AS area2
FROM shoe s JOIN area a ON a.{g} = s.{g}
ORDER BY 1, 2
"""


def event_points_sql(dialect: str) -> str:
    """Distinct integer event coordinates per user (the millidegree twins
    of spatial/trajectory.py _coords_sql, kept as exact BIGINTs)."""
    return """
SELECT DISTINCT user_id,
       CAST((event_id * 9973 + user_id * 31 + 7) % 360000 AS BIGINT) AS x,
       CAST((event_id * 7919 + user_id * 37 + 3) % 180000 AS BIGINT) AS y
FROM events
"""
