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


# 6 hours in microseconds — the regular resample grid for trajectory_interp
INTERP_STEP_US = 6 * 3600 * 1_000_000

# perpendicular-offset threshold (degrees) for trajectory_simplify
SIMPLIFY_EPS = 20.0

BEARING_RES = 6


def trajectory_interp_sql(dialect: str, res: int, step_us: int = INTERP_STEP_US) -> str:
    """Time-grid resampling: linearly interpolate each user's trajectory at
    the regular instants t = i * step that fall strictly inside each
    consecutive-event segment (us, next_us] — the fixed-rate resample that
    map-matching / sensor-fusion pipelines run before any spatial join.

    No range join: each segment EMITS its own ticks (i from
    us DIV step + 1 to next_us DIV step — a per-row integer sequence, empty
    for segments shorter than one step), so the plan is ONE user_id window
    shuffle plus a map-side explode proportional to output size.  A naive
    formulation (grid table x events, ev.us <= t < ev.next_us) would be a
    BNLJ theta join — the shape that dies at 10^12 docs.

    Determinism: tick instants are exact BIGINT micros; the lerp weight and
    coordinates are the same double expression text on both engines
    (+,-,*,/ are correctly-rounded IEEE, so raw doubles are hash-safe).
    Tick-at-boundary convention (t == next_us → w = 1) cannot duplicate:
    the NEXT segment starts its ticks at next_us DIV step + 1.
    """
    from .. import grid

    lon, lat = _coords_sql()
    idiv = lambda a, b: grid._idiv(a, b, dialect)  # noqa: E731
    if dialect == "spark":
        us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    else:
        us = "epoch_us(ts)"
    lo = idiv("us", str(step_us)) + " + 1"
    hi = idiv("nus", str(step_us))
    if dialect == "spark":
        ticks_from = (
            f"FROM seg LATERAL VIEW explode(sequence({lo}, {hi})) _tk AS i "
            f"WHERE nus IS NOT NULL AND ({lo}) <= ({hi})"
        )
    else:
        # DuckDB: unnest(range(..)) in the projection expands rows and emits
        # nothing for an empty range — no pre-filter needed, but keep it for
        # shared semantics
        ticks_from = f"FROM seg WHERE nus IS NOT NULL AND ({lo}) <= ({hi})"
    i_expr = "i" if dialect == "spark" else f"unnest(range({lo}, ({hi}) + 1))"
    w = "(CAST(t - us AS DOUBLE) / CAST(nus - us AS DOUBLE))"
    ilon = f"(lon + (nlon - lon) * {w})"
    ilat = f"(lat + (nlat - lat) * {w})"
    cell = grid.cell_sql("ilon", "ilat", res, dialect)
    return f"""
WITH ev AS (
  SELECT user_id, event_id, {us} AS us, {lon} AS lon, {lat} AS lat FROM events
),
seg AS (
  SELECT user_id, us, lon, lat,
         lead(us)  OVER (PARTITION BY user_id ORDER BY us, event_id) AS nus,
         lead(lon) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nlon,
         lead(lat) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nlat
  FROM ev
),
ticks AS (
  SELECT user_id, us, nus, lon, lat, nlon, nlat, ({i_expr}) * {step_us} AS t
  {ticks_from}
),
interp AS (
  SELECT user_id, t AS tick_us, {ilon} AS ilon, {ilat} AS ilat
  FROM (SELECT user_id, t, lon, lat, nlon, nlat, us, nus FROM ticks)
)
SELECT user_id, tick_us, ilon AS lon, ilat AS lat,
       {grid.cell_sql('ilon', 'ilat', res, dialect)} AS cell
FROM interp
"""


def trajectory_simplify_sql(dialect: str, eps: float = SIMPLIFY_EPS) -> str:
    """Single-pass polyline simplification (perpendicular-offset filter):
    keep both endpoints plus every interior point whose perpendicular
    distance to the chord (prev → next) is >= eps — the streaming-friendly
    cousin of Douglas–Peucker (which is recursive and needs the whole line
    in hand; this is one window pass per point, the shape that scales).

    Exactness: the keep test compares cross² >= eps² * |chord|² — products
    and sums of doubles only (no division, no sqrt), same expression text
    on both engines → bit-identical keep decisions and raw coordinates.
    A degenerate chord (prev == next, a spike turnaround) keeps the point
    iff cross == 0 is outweighed: 0 >= 0 holds, so spikes are kept — the
    conservative choice (dropping a turnaround would corrupt the path).

    Scale shape: ONE user_id window shuffle, everything else map-side.
    """
    lon, lat = _coords_sql()
    if dialect == "spark":
        us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    else:
        us = "epoch_us(ts)"
    cross = "((nlon - plon) * (lat - plat) - (nlat - plat) * (lon - plon))"
    chord2 = "((nlon - plon) * (nlon - plon) + (nlat - plat) * (nlat - plat))"
    return f"""
WITH ev AS (
  SELECT user_id, event_id, {us} AS us, {lon} AS lon, {lat} AS lat FROM events
),
pts AS (
  SELECT user_id, lon, lat,
         row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn,
         count(*)     OVER (PARTITION BY user_id) AS n,
         lag(lon)  OVER (PARTITION BY user_id ORDER BY us, event_id) AS plon,
         lag(lat)  OVER (PARTITION BY user_id ORDER BY us, event_id) AS plat,
         lead(lon) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nlon,
         lead(lat) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nlat
  FROM ev
)
SELECT user_id, CAST(rn AS BIGINT) AS rn, lon, lat
FROM pts
WHERE rn = 1 OR rn = n
   OR {cross} * {cross} >= {eps!r} * {eps!r} * {chord2}
"""


def trajectory_bearing_sql(dialect: str, res: int = BEARING_RES) -> str:
    """Per-tile movement-direction rose: each consecutive-event segment is
    classified into one of 8 compass octants by PURE SIGN/MAGNITUDE
    comparisons (no atan2 — trig is not correctly rounded across engines,
    comparisons of exact double subtractions are), then aggregated per
    origin cell — the flow-direction histogram under trajectory heatmaps.

    Octant boundaries are the axes and the 45° diagonals; ties land on the
    lower sector deterministically because both engines evaluate the same
    comparison text.  Zero-length segments are dropped.

    Scale shape: ONE user_id window shuffle, then a partial-agg'd groupBy
    on (cell, sector) — cardinality <= 8 * 4^res, bounded.
    """
    from .. import grid

    lon, lat = _coords_sql()
    sector = """CASE
      WHEN dx >= 0 AND dy >= 0 THEN (CASE WHEN dy >= dx THEN 0 ELSE 1 END)
      WHEN dx >= 0 AND dy < 0  THEN (CASE WHEN dx >= -dy THEN 2 ELSE 3 END)
      WHEN dx < 0  AND dy < 0  THEN (CASE WHEN -dy >= -dx THEN 4 ELSE 5 END)
      ELSE                          (CASE WHEN -dx >= dy THEN 6 ELSE 7 END)
    END"""
    cell = grid.cell_sql("lon", "lat", res, dialect)
    return f"""
WITH ev AS (
  SELECT user_id, event_id, ts, {lon} AS lon, {lat} AS lat FROM events
),
seg AS (
  SELECT lon, lat,
         lead(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id) - lon AS dx,
         lead(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id) - lat AS dy
  FROM ev
),
cls AS (
  SELECT {cell} AS cell, {sector} AS sector
  FROM seg WHERE dx IS NOT NULL AND NOT (dx = 0 AND dy = 0)
)
SELECT cell, CAST(sector AS INT) AS sector, count(*) AS n_segments
FROM cls GROUP BY cell, sector
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


# ---------------------------------------------------------------------------
# Co-travel detection
# ---------------------------------------------------------------------------

COTRAVEL_RES = 3
COTRAVEL_BUCKET_US = 6 * 3600 * 1_000_000  # 6-hour buckets
COTRAVEL_MIN_BINS = 3
COTRAVEL_CAP = 64


def cotravel_sql(
    dialect: str,
    *,
    res: int = COTRAVEL_RES,
    bucket_us: int = COTRAVEL_BUCKET_US,
    min_bins: int = COTRAVEL_MIN_BINS,
    cap: int = COTRAVEL_CAP,
) -> str:
    """Co-travel pair detection: user pairs sharing >= ``min_bins``
    distinct (tile cell, time bucket) bins — the trajectory-correlation
    primitive behind companion detection / contact tracing / convoy
    mining.

    Scale shape: the quadratic step is a self-join keyed on the BOUNDED
    (cell, tb) bin — the same bucketed shape as the MinHash band join,
    never an all-pairs user cross.  Corpus volume only grows the number
    of bins (linear); pair work is sum over bins of m^2.  The one skew
    pivot is a hot bin (stadium cell at rush hour): a DETERMINISTIC
    per-bin cap keeps only the ``cap`` smallest user_ids per bin
    (row_number <= cap, identical rule text in both engines, so the
    capped semantics stay bit-identical).  At the test scales the largest
    bin holds < 30 users, so the cap never binds; at 100 TB it bounds any
    bin's join fan-out at cap^2 and is the knob to widen with cluster
    memory.

    All arithmetic is integer (cell ids, epoch-microsecond DIV bucket,
    pair bin counts) — aggregation-order-exact across engines.
    """
    lon, lat = _coords_sql()
    if dialect == "spark":
        us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        tb = f"(({us}) DIV {bucket_us})"
    else:
        tb = f"(epoch_us(ts) // {bucket_us})"
    cell = grid.cell_sql("lon", "lat", res, dialect)
    return f"""
WITH ev AS (
  SELECT user_id, {lon} AS lon, {lat} AS lat, {tb} AS tb FROM events
),
keys AS (
  SELECT DISTINCT user_id, {cell} AS cell, tb FROM ev
),
capped AS (
  SELECT user_id, cell, tb FROM (
    SELECT user_id, cell, tb,
           row_number() OVER (PARTITION BY cell, tb ORDER BY user_id) AS rn
    FROM keys
  ) t WHERE rn <= {cap}
),
pairs AS (
  SELECT a.user_id AS u1, b.user_id AS u2, count(*) AS nb
  FROM capped a JOIN capped b
    ON a.cell = b.cell AND a.tb = b.tb AND a.user_id < b.user_id
  GROUP BY 1, 2
)
SELECT u1, u2, CAST(nb AS BIGINT) AS n_bins
FROM pairs WHERE nb >= {min_bins}
"""
