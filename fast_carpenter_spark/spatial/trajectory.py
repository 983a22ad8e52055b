"""Trajectory → cell-path cover: segment interpolation over ordered events.

The line/polyline analogue of the point cell-encode stage: per user, order
events by event time, form consecutive-pair segments (one lag window = one
shuffle on user_id), sample each segment at S equidistant points (constant
explode, no join) and encode every sample into the tile grid — yielding the
per-user traversed-cell histogram (the "which tiles did this trajectory
touch" cover used for map-matching / heatmap pipelines).

Determinism: interpolation weights are exact binary fractions (i/8), the
lerp is the same double expression text on both engines, and the segment
order is pinned by (ts, event_id) so lag() is unambiguous under ties.

Scale shape: ONE shuffle (the user_id window); sampling is a constant
8-way explode map-side; the final (user, cell) aggregate reuses the
window's hash partitioning only if keys matched — they don't, so it is a
second (partial-agg'd) shuffle on the composite key.  No skew pivot: a
hot user costs 8× their event count, linear.
"""

from __future__ import annotations

from .. import grid

N_STEPS = 8


def _coords_sql() -> tuple[str, str]:
    """Deterministic synthetic event coordinates (events table carries no
    geometry): same integer-hash recipe as the span geometry in synth.py."""
    lon = "(CAST((event_id * 9973 + user_id * 31 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0)"
    lat = "(CAST((event_id * 7919 + user_id * 37 + 3) % 180000 AS DOUBLE) / 1000.0 - 90.0)"
    return lon, lat


def trajectory_od_sql(dialect: str, res: int) -> str:
    """Origin–destination matrix: each user's trajectory contributes one
    (first-event cell → last-event cell) edge; the matrix aggregates users
    and their event volumes per OD pair.

    Scale shape: ONE data-sized shuffle (the user_id window that ranks
    events); the per-user endpoint pivot is a partial-agg'd groupBy on the
    same key (AQE coalesces it onto the window's partitioning), and the
    final OD aggregate is cell-pair-cardinality sized — tiny.  Endpoint
    order is pinned by (ts, event_id) so ties are deterministic.

    Every expression is shared text between the engines except the cell
    encode; the integer ``sum`` is cast to BIGINT (DuckDB widens to
    HUGEINT, which would hash differently at equal values)."""
    lon, lat = _coords_sql()
    cell = grid.cell_sql("lon", "lat", res, dialect)
    return f"""
WITH ev AS (
  SELECT user_id, event_id, ts, {lon} AS lon, {lat} AS lat FROM events
),
ranked AS (
  SELECT user_id, {cell} AS cell,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_ev
  FROM ev
),
odp AS (
  SELECT user_id,
         max(CASE WHEN rn = 1 THEN cell END) AS o_cell,
         max(CASE WHEN rn = n_ev THEN cell END) AS d_cell,
         max(n_ev) AS n_events
  FROM ranked GROUP BY user_id
)
SELECT o_cell, d_cell, count(*) AS n_users,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM odp GROUP BY o_cell, d_cell
"""


def trajectory_length_sql(dialect: str) -> str:
    """Per-user planar trajectory length: Σ segment lengths in event-time
    order, plus endpoint displacement and the wander ratio.

    Float determinism for an ORDER-SENSITIVE float aggregate over shuffled
    data: collect each user's points into an array, SORT it (pinning the
    order a groupBy sum would scramble), then LEFT-FOLD the pairwise
    distances — +,*,/ and sqrt are correctly-rounded IEEE ops, so the same
    fold order yields bit-identical doubles on both engines (the trig
    functions are NOT correctly rounded, which is why geodesic outputs are
    rank-only — planar lengths have no such restriction).

    Scale shape: ONE user_id shuffle; per-user arrays are bounded by
    per-user event counts (same invariant as the window queries); the fold
    is map-side compute."""
    from . import geom

    lon, lat = _coords_sql()
    if dialect == "spark":
        arr = (
            "sort_array(collect_list(struct(us, event_id, lon, lat)))"
        )
        base = f"""
WITH ev AS (
  SELECT user_id, event_id,
         timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS us,
         {lon} AS lon, {lat} AS lat
  FROM events
),
tr AS (SELECT user_id, {arr} AS pts FROM ev GROUP BY user_id)
"""
        at = lambda i: f"element_at(pts, CAST({i} AS INT))"  # noqa: E731
    else:
        arr = "list(struct_pack(lon := lon, lat := lat) ORDER BY us, event_id)"
        base = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, {lon} AS lon, {lat} AS lat
  FROM events
),
tr AS (SELECT user_id, {arr} AS pts FROM ev GROUP BY user_id)
"""
        at = lambda i: f"list_extract(pts, CAST({i} AS BIGINT))"  # noqa: E731
    n = "size(pts)" if dialect == "spark" else "len(pts)"
    seg = (
        f"sqrt(({at('i + 1')}.lon - {at('i')}.lon) * ({at('i + 1')}.lon - {at('i')}.lon)"
        f" + ({at('i + 1')}.lat - {at('i')}.lat) * ({at('i + 1')}.lat - {at('i')}.lat))"
    )
    # guard n=1: Spark's sequence(1, 0) DESCENDS ([1,0]) instead of being
    # empty (DuckDB's range(1,1) is empty) — never let the fold see it
    path = (
        f"(CASE WHEN {n} < 2 THEN CAST(0.0 AS DOUBLE) "
        f"ELSE {geom._fold_sql(seg, f'({n} - 1)', dialect)} END)"
    )
    disp = (
        f"sqrt(({at(n)}.lon - {at('1')}.lon) * ({at(n)}.lon - {at('1')}.lon)"
        f" + ({at(n)}.lat - {at('1')}.lat) * ({at(n)}.lat - {at('1')}.lat))"
    )
    return f"""{base}
SELECT user_id, CAST({n} AS BIGINT) AS n_events,
       {path} AS path_len,
       {disp} AS displacement,
       CASE WHEN {path} > 0.0 THEN {disp} / {path} ELSE 1.0 END AS wander
FROM tr
"""


def trajectory_cells_sql(dialect: str, res: int) -> str:
    """Full query in either dialect (the bodies differ only in the
    sequence-explode idiom; every arithmetic expression is shared text)."""
    lon, lat = _coords_sql()
    t = f"(CAST(i AS DOUBLE) / {float(N_STEPS)!r})"
    slon = f"(plon + (lon - plon) * {t})"
    slat = f"(plat + (lat - plat) * {t})"
    cell = grid.cell_sql(slon, slat, res, dialect)
    if dialect == "spark":
        steps = f"LATERAL VIEW explode(sequence(1, {N_STEPS})) _st AS i"
        from_steps = f"FROM seg {steps} WHERE plon IS NOT NULL"
    else:
        from_steps = (
            f"FROM seg, (SELECT unnest(range(1, {N_STEPS + 1})) AS i) "
            "WHERE plon IS NOT NULL"
        )
    return f"""
WITH ev AS (
  SELECT user_id, event_id, ts, {lon} AS lon, {lat} AS lat FROM events
),
seg AS (
  SELECT user_id, lon, lat,
         lag(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plon,
         lag(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plat
  FROM ev
),
samples AS (
  SELECT user_id, {cell} AS cell
  {from_steps}
)
SELECT user_id, cell, count(*) AS n_samples
FROM samples GROUP BY user_id, cell
"""
