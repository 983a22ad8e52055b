"""Split from the original single-module queries.py (round-4 refactor); see queries/__init__.py for the public surface."""

from __future__ import annotations

from ._common import (
    COARSE_RES,
    CutFlowStage,
    DefineStage,
    F,
    SESSION_GAP_US,
    SelectPhaseSpaceStage,
    SpatialJoinStage,
    _load_events,
    compile_tree,
    flat_spans,
    grid,
    load_documents,
    oracle_counters_sql,
    parse_selection,
    pip_oracle_sql,
    synth,
)
from .tiles_q import (
    O_SPANS_FLAT,
)

# ---------------------------------------------------------------------------
# 3. Define (P1-P5) + jagged reductions (R1-R9)
# ---------------------------------------------------------------------------








def q_events_window(spark, sf_dir):
    """Tumbling 1-hour event-time windows x event_type — the batch twin of
    the streaming watermark path, over the driver's events table.  Window
    starts exported as epoch seconds so both engines hash identically."""
    ev = _load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(
            # ts is TIMESTAMP_NTZ: epoch via timestampdiff is timezone-free
            # in both engines (unix_timestamp would apply the session TZ)
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', win.start)"
            ).cast("long").alias("win_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


O_EVENTS_WINDOW = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS win_start,
       event_type, count(*) AS n, sum(value) AS value_sum
FROM events GROUP BY 1, 2
"""


SLIDE_S, SLIDE_WIN_S = 600, 3000  # 10-min slide, 50-min window (5 slides)


def q_events_sliding(spark, sf_dir):
    """Sliding event-time windows (50-min window, 10-min slide): each
    event lands in 5 overlapping windows — Spark's native window()
    generator vs the oracle's explicit slide-offset explode, epoch-aligned
    identically.  Counts and exact distinct users per window."""
    ev = _load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", f"{SLIDE_WIN_S} seconds", f"{SLIDE_S} seconds").alias("win")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', win.start)"
            ).cast("long").alias("win_start"),
            "n",
            "n_users",
        )
    )


O_EVENTS_SLIDING = f"""
WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
hit AS (
  SELECT user_id, (s // {SLIDE_S} - j) * {SLIDE_S} AS win_start
  FROM ev, (SELECT unnest(range(0, {SLIDE_WIN_S // SLIDE_S})) AS j)
)
SELECT win_start, count(*) AS n, count(DISTINCT user_id) AS n_users
FROM hit GROUP BY 1
"""




def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization: a new session starts after >30 min of user
    inactivity; session id = running count of session starts per user (two
    window passes over ONE shuffle on user_id — the partitioning a
    behavioral table would keep at scale)."""
    from pyspark.sql import Window as W

    ev = _load_events(spark, sf_dir).withColumn(
        "us",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"),
    )
    order = W.partitionBy("user_id").orderBy("us", "event_id")
    new_sess = F.when(
        F.col("us") - F.lag("us").over(order) > SESSION_GAP_US, 1
    ).otherwise(F.when(F.lag("us").over(order).isNull(), 1).otherwise(0))
    runsum = W.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    sess = ev.withColumn("session_id", F.sum(new_sess).over(runsum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("sess_start_us"),
        F.max("us").alias("sess_end_us"),
        F.sum("value").alias("value_sum"),
    )


O_EVENTS_SESSIONIZE = f"""
WITH marked AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US} THEN 1
              ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
  SELECT *, CAST(sum(new_sess) OVER (
    PARTITION BY user_id ORDER BY us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events,
       min(us) AS sess_start_us, max(us) AS sess_end_us, sum(value) AS value_sum
FROM sessions GROUP BY 1, 2
"""


_ST_T0_US = 1_704_067_200_000_000  # 2024-01-01 epoch µs (events table origin)
_ST_DAY_US = 86_400_000_000
# each polygon is valid for one 7-day window derived from its numeric id
_ST_P = "CAST(substr(poly_id, 6) AS INT)"
_ST_VALID = (
    f"us >= {_ST_T0_US} + ({_ST_P} % 24) * {_ST_DAY_US} "
    f"AND us < {_ST_T0_US} + ({_ST_P} % 24 + 7) * {_ST_DAY_US}"
)


def q_events_stjoin(spark, sf_dir):
    """Spatiotemporal join: events (synthetic point + event time) against
    polygons carrying validity windows — the spatial cover join composes
    with a temporal refine predicate, then per-polygon visit stats.  The
    temporal filter rides the SAME broadcast join (no extra shuffle); a
    slowly-changing polygon layer at scale would put the window columns on
    the broadcast side identically."""
    from ..spatial.trajectory import _coords_sql

    _load_events(spark, sf_dir)
    lon, lat = _coords_sql()
    pts = spark.sql(
        f"SELECT user_id, event_id, "
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS us, "
        f"{lon} AS lon, {lat} AS lat FROM events"
    )
    stage = SpatialJoinStage(name="st", polygons=synth.polygons())
    return (
        stage.apply(pts)
        .filter(F.expr(_ST_VALID))
        .groupBy("poly_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def _o_events_stjoin() -> str:
    from ..spatial.trajectory import _coords_sql

    lon, lat = _coords_sql()
    pts = (
        f"SELECT user_id, event_id, epoch_us(ts) AS us, "
        f"{lon} AS lon, {lat} AS lat FROM events"
    )
    pip = pip_oracle_sql(
        pts, synth.polygons_values_sql("duck"), point_keys="user_id, event_id, us"
    )
    return f"""
SELECT poly_id, count(*) AS n_events, count(DISTINCT user_id) AS n_users
FROM ({pip}) matched
WHERE {_ST_VALID}
GROUP BY 1
"""


O_EVENTS_STJOIN = _o_events_stjoin()


_STAR_SQL = """
SELECT r_name, n_name,
       count(*) AS n_lines,
       -- fixed-point BIGINT (1e-4 currency units): decimal sums are exact
       -- in both engines but DuckDB's pandas bridge renders wide DECIMAL
       -- as float64, so ship the scaled integer instead
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
         AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_join_size_cms(spark, sf_dir):
    """Join-cardinality estimation from count-min grids (the optimizer's
    question answered WITHOUT running the join): |orders ⋈ customer| is
    estimated as min over sketch rows of the grid inner product — two
    bounded aggregates + a 1024-row join instead of a data-sized join.
    Collisions only add non-negative cross terms, so est >= exact is a
    deterministic one-sided guarantee, oracle-checked with the exact join
    size alongside."""
    from ..functions import sketch as _sketch

    for t in ["orders", "customer"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return _sketch.cms_join_size(spark)


def _o_join_size_cms() -> str:
    from ..functions import sketch as _sketch

    return _sketch.cms_join_size_oracle_sql()


def q_star_revenue(spark, sf_dir):
    """Star-schema revenue rollup over the TPC-H tables (the Q5 join
    shape): fact⋈fact on the order key, every dimension broadcast by
    Catalyst (size-based).  Money stays DECIMAL end-to-end — decimal sums
    are exact in both engines, so the aggregate is order-insensitive and
    hash-safe where a double sum would not be."""
    for t in ["lineitem", "orders", "customer", "nation", "region"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(_STAR_SQL)


O_STAR_REVENUE = _STAR_SQL


def _pricing_sql(ship_cutoff: str) -> str:
    """TPC-H Q1 pricing-summary shape with exact fixed-point outputs.
    The disc_price product is re-cast to DECIMAL(18,4) (exact: <= 4
    fractional digits by construction) before the tax multiply so the
    three-way product never exceeds precision 38 — Spark would otherwise
    truncate scale (allowPrecisionLoss) where DuckDB widens to 128-bit."""
    qty = "CAST(l_quantity AS DECIMAL(18,2))"
    price = "CAST(l_extendedprice AS DECIMAL(18,2))"
    disc = "CAST(l_discount AS DECIMAL(18,2))"
    tax = "CAST(l_tax AS DECIMAL(18,2))"
    disc_price = f"CAST({price} * (1 - {disc}) AS DECIMAL(18,4))"
    return f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       CAST(sum({qty}) * 100 AS BIGINT) AS sum_qty_e2,
       CAST(sum({price}) * 100 AS BIGINT) AS sum_base_e2,
       CAST(sum({disc_price}) * 10000 AS BIGINT) AS sum_disc_e4,
       CAST(sum({disc_price} * (1 + {tax})) * 1000000 AS BIGINT) AS sum_charge_e6
FROM lineitem
WHERE l_shipdate <= {ship_cutoff}
GROUP BY l_returnflag, l_linestatus
"""


def q_lineitem_pricing(spark, sf_dir):
    """TPC-H Q1 pricing summary (the reference-domain 'cutflow over a fact
    table' analogue): one scan, partial-agg'd groupBy on two low-card
    keys; all money exact fixed-point BIGINT."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(_pricing_sql("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))


O_LINEITEM_PRICING = _pricing_sql("TIMESTAMP '1998-09-02 00:00:00'")


_BRAND_SQL = """
SELECT p_brand, n_name,
       count(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
         AS revenue_e4
FROM lineitem
JOIN part     ON l_partkey   = p_partkey
JOIN supplier ON l_suppkey   = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY p_brand, n_name
"""


def q_brand_revenue(spark, sf_dir):
    """Revenue by part brand × supplier nation — covers the part/supplier
    dimensions: fact scan + three broadcast dimension joins, exact
    fixed-point money."""
    for t in ["lineitem", "part", "supplier", "nation"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(_BRAND_SQL)


O_BRAND_REVENUE = _BRAND_SQL


def _anomaly_sql(us: str, dialect: str) -> str:
    """Per-(cell, day) event-count anomalies vs the cell's own Poisson
    baseline: mean = cell total / GLOBAL day-span (so silent days count),
    z = (n - mean)/sqrt(mean).  All z inputs exact integers; one
    shared-text double formula; emits |z| >= 2 rows."""
    from ..spatial.trajectory import _coords_sql

    lon, lat = _coords_sql()
    cell = grid.cell_sql("lon", "lat", COARSE_RES, dialect)
    day = grid._idiv(f"({us})", str(_ST_DAY_US), dialect)
    mean = "(CAST(cell_total AS DOUBLE) / CAST(n_days AS DOUBLE))"
    z = f"((CAST(n AS DOUBLE) - {mean}) / sqrt({mean}))"
    return f"""
WITH ev AS (
  SELECT user_id, {day} AS day, {lon} AS lon, {lat} AS lat
  FROM events
),
cd AS (SELECT {cell} AS cell, day, count(*) AS n FROM ev GROUP BY 1, 2),
span AS (SELECT max(day) - min(day) + 1 AS n_days FROM ev),
ct AS (SELECT cell, CAST(sum(n) AS BIGINT) AS cell_total FROM cd GROUP BY 1)
SELECT cd.cell, cd.day, cd.n, ct.cell_total, {z} AS z
FROM cd JOIN ct ON cd.cell = ct.cell CROSS JOIN span
WHERE abs({z}) >= 2.0
"""


def q_tile_anomaly(spark, sf_dir):
    """Spatiotemporal anomaly detection: per-(cell, day) event counts
    z-scored against the cell's own Poisson baseline over the global day
    span — integer inputs, shared-text double (bit-identical), one
    (cell, day) shuffle + a co-partitioned per-cell totals join + a 1-row
    span broadcast."""
    _load_events(spark, sf_dir)
    return spark.sql(
        _anomaly_sql(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)",
            "spark",
        )
    )


O_TILE_ANOMALY = _anomaly_sql("epoch_us(ts)", "duck")


FUNNEL_WINDOW_US = 6 * 3_600_000_000  # each stage must convert within 6 h


def _funnel_sql(us: str) -> str:
    """Ordered windowed funnel view → click → purchase: each stage's
    first event must come strictly AFTER the previous stage's first event
    and within FUNNEL_WINDOW_US of it (the standard strictly-ordered
    windowed funnel).  Three tiny stage tables chained by user_id joins —
    the heavy lifting is three partial-agg'd min()s over one scan; ``us``
    is the dialect's epoch-µs expression."""
    w = FUNNEL_WINDOW_US
    return f"""
WITH ev AS (SELECT user_id, event_id, event_type, {us} AS us FROM events),
s0 AS (SELECT user_id, min(us) AS t0 FROM ev WHERE event_type = 'view' GROUP BY user_id),
s1 AS (
  SELECT ev.user_id, min(us) AS t1 FROM ev JOIN s0 USING (user_id)
  WHERE event_type = 'click' AND us > t0 AND us <= t0 + {w} GROUP BY ev.user_id
),
s2 AS (
  SELECT ev.user_id, min(us) AS t2 FROM ev JOIN s1 USING (user_id)
  WHERE event_type = 'purchase' AND us > t1 AND us <= t1 + {w} GROUP BY ev.user_id
)
SELECT CAST(1 + CASE WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
       count(*) AS n_users
FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
GROUP BY 1
"""


def q_events_funnel(spark, sf_dir):
    """Strictly-ordered conversion funnel (view → click → purchase):
    stage counts per furthest stage reached."""
    _load_events(spark, sf_dir)
    return spark.sql(
        _funnel_sql(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    )


O_EVENTS_FUNNEL = _funnel_sql("epoch_us(ts)")


def _funnel_latency_sql(dialect: str) -> str:
    """Conversion-latency distribution: per user the funnel instance is
    (first view) → (first click after it) → (first purchase after that),
    latencies in exact integer microseconds; the output is per-stage
    count + p50/p90 (Spark `percentile` ≡ DuckDB `quantile_cont`, both
    linear interpolation over exact BIGINTs — deterministic doubles).
    Scale shape: three bounded per-user min-aggregates riding one user_id
    key, then a 2-row percentile rollup."""
    if dialect == "spark":
        us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        p50, p90 = "percentile(lat, 0.5)", "percentile(lat, 0.9)"
    else:
        us = "epoch_us(ts)"
        p50, p90 = "quantile_cont(lat, 0.5)", "quantile_cont(lat, 0.9)"
    return f"""
WITH ev AS (SELECT user_id, event_type, {us} AS us FROM events),
v AS (SELECT user_id, min(us) AS v_us FROM ev WHERE event_type = 'view' GROUP BY 1),
c AS (
  SELECT e.user_id, min(e.us) AS c_us
  FROM ev e JOIN v ON v.user_id = e.user_id AND e.us > v.v_us
  WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.us) AS p_us
  FROM ev e JOIN c ON c.user_id = e.user_id AND e.us > c.c_us
  WHERE e.event_type = 'purchase' GROUP BY 1
),
lats AS (
  SELECT 'view_to_click' AS stage, CAST(c.c_us - v.v_us AS BIGINT) AS lat
  FROM v JOIN c ON c.user_id = v.user_id
  UNION ALL
  SELECT 'click_to_purchase' AS stage, CAST(p.p_us - c.c_us AS BIGINT) AS lat
  FROM c JOIN p ON p.user_id = c.user_id
)
SELECT stage, CAST(count(*) AS BIGINT) AS n_users,
       {p50} AS p50_us, {p90} AS p90_us
FROM lats GROUP BY stage
"""


def q_funnel_latency(spark, sf_dir):
    """Time-to-convert percentiles per funnel stage (exact integer
    latencies, deterministic interpolated percentiles)."""
    _load_events(spark, sf_dir)
    return spark.sql(_funnel_latency_sql("spark"))


def _daily_active_sql(dialect: str) -> str:
    """Daily active users with the new-vs-returning split: a user is NEW
    on their first-seen day (one min-day window on the user key),
    returning otherwise — the operational sibling of the cohort retention
    matrix.  Day ids are exact integer epoch-day quotients; one user_id
    aggregate + one (day)-keyed rollup."""
    if dialect == "spark":
        us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    else:
        us = "epoch_us(ts)"
    day = grid._idiv(us, str(86_400 * 1_000_000), dialect)
    return f"""
WITH ev AS (SELECT user_id, {day} AS day FROM events),
days AS (SELECT DISTINCT user_id, day FROM ev),
firsts AS (SELECT user_id, min(day) AS first_day FROM days GROUP BY 1)
SELECT d.day,
       CAST(count(*) AS BIGINT) AS dau,
       CAST(sum(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(sum(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users
FROM days d JOIN firsts f ON f.user_id = d.user_id
GROUP BY 1
"""


def q_daily_active(spark, sf_dir):
    """DAU with exact new/returning decomposition per epoch day."""
    _load_events(spark, sf_dir)
    return spark.sql(_daily_active_sql("spark"))


def q_events_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day; for each
    (cohort_day, day_offset) the number of distinct returning users.  ONE
    user_id shuffle derives the cohort (min-day window), then a
    day-pair aggregate over (cohort, offset) — the standard behavioral
    rollup, exact distinct counts."""
    from pyspark.sql import Window as W

    ev = _load_events(spark, sf_dir).withColumn(
        "day",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            f" DIV {_ST_DAY_US}"
        ),
    )
    cohort = ev.withColumn(
        "cohort_day", F.min("day").over(W.partitionBy("user_id"))
    )
    return (
        cohort.select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


O_EVENTS_RETENTION = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_ST_DAY_US} AS day FROM events
),
c AS (
  SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day FROM ev
)
SELECT cohort_day, day_offset, count(*) AS n_users
FROM (SELECT DISTINCT user_id, cohort_day, day - cohort_day AS day_offset FROM c)
GROUP BY 1, 2
"""


OVERLAP_BIN_US = 3_600_000_000  # 1 h — near the typical session length


def q_sessions_overlap(spark, sf_dir):
    """Interval overlap join (concurrency): for every session, how many
    other sessions overlap it in time — time-bin bucketing + exact refine
    + first-common-bin dedup, ONE bin-keyed shuffle instead of the
    nested-loop theta join (functions/interval.py)."""
    from ..functions.interval import overlap_count

    sess = q_events_sessionize(spark, sf_dir).select(
        "user_id", "session_id", "sess_start_us", "sess_end_us"
    )
    return overlap_count(sess, bin_us=OVERLAP_BIN_US)


def _o_sessions_overlap() -> str:
    from ..functions.interval import overlap_count_oracle_sql

    return overlap_count_oracle_sql(
        "SELECT user_id, session_id, sess_start_us, sess_end_us "
        f"FROM ({O_EVENTS_SESSIONIZE})"
    )


O_SESSIONS_OVERLAP = _o_sessions_overlap()


def q_events_json(spark, sf_dir):
    """Semi-structured extraction: pull props.k out of the JSON string
    column and aggregate — JVM-side JSON path evaluation (get_json_object),
    no Python in the loop."""
    ev = _load_events(spark, sf_dir)
    return (
        ev.withColumn(
            "k", F.get_json_object("props", "$.k").cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


O_EVENTS_JSON = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
       min(CAST(props->>'k' AS BIGINT)) AS k_min,
       max(CAST(props->>'k' AS BIGINT)) AS k_max
FROM events GROUP BY 1
"""


def q_define_expr(spark, sf_dir):
    """numexpr-dialect derived scalars through the transpiler."""
    df = flat_spans(spark, sf_dir)
    stage = DefineStage.from_config(
        "define",
        [
            {"r": "sqrt(lon**2 + lat**2)"},
            {"quadrant": "where((lon > 0) & (lat > 0), 1, 0)"},
            # sqrt is correctly rounded (IEEE) in both engines — safe for
            # exact parity; transcendentals (log/exp) are NOT oracle-checked
            {"softlen": "sqrt(n_chars) * 2.0"},
        ],
    )
    return stage.apply(df).select("doc_id", "span_idx", "r", "quadrant", "softlen")


O_DEFINE_EXPR = f"""
SELECT doc_id, span_idx,
       SQRT(lon * lon + lat * lat) AS r,
       CASE WHEN lon > 0 AND lat > 0 THEN 1 ELSE 0 END AS quadrant,
       SQRT(n_chars) * 2.0 AS softlen
FROM ({O_SPANS_FLAT})
"""


def q_jagged_reduce(spark, sf_dir):
    """Array reductions over the nested spans table (R1/R2/R5/R7)."""
    load_documents(spark, sf_dir)
    df = spark.sql(synth.spans_table_sql("spark"))
    return df.selectExpr(
        "doc_id",
        "size(spans) AS n_spans",
        "aggregate(spans, CAST(0.0 AS DOUBLE), (acc, s) -> acc + CAST(s.offset AS DOUBLE)) AS sum_offset",
        "array_max(transform(spans, s -> s.offset)) AS max_offset",
        "try_element_at(spans, 1).kind AS first_kind",
        "size(filter(spans, s -> s.kind = 'text')) AS n_text",
    )


O_JAGGED_REDUCE = f"""
SELECT doc_id,
       CAST(len(spans) AS INT) AS n_spans,
       CAST(list_sum(list_transform(spans, s -> s['offset'])) AS DOUBLE) AS sum_offset,
       list_max(list_transform(spans, s -> s['offset'])) AS max_offset,
       list_extract(spans, 1)['kind'] AS first_kind,
       CAST(len(list_filter(spans, s -> s['kind'] = 'text')) AS INT) AS n_text
FROM ({synth.spans_table_sql('duck')})
"""


def q_jagged_nested(spark, sf_dir):
    """3-level jagged parity (ref: tests/test_expressions.py:63-97
    test_3D_jagged): a deterministic array<array<double>> built per doc —
    [[t + doc_id for t in 0..i-1] for i in 1..doc_id%3] — pushed through
    DefineStage: elementwise math broadcasts to the innermost level,
    ``reduce`` collapses one innermost level (awkward axis=-1), and chained
    variables compose R1/R2/R7 across both levels down to scalars."""
    load_documents(spark, sf_dir)
    df = spark.sql(
        "SELECT doc_id, "
        "transform(filter(sequence(1, 2), i -> i <= doc_id % 3), "
        "          i -> transform(sequence(0, i - 1), t -> CAST(t + doc_id AS DOUBLE))"
        ") AS fake3d FROM documents"
    )
    stage = DefineStage.from_config(
        "nested",
        [
            # P1 on 3D: innermost elementwise broadcast (ref Fake3D * 2)
            {"doubled": "fake3d * 2"},
            # R2 innermost: array of per-inner sums, then R2 again -> scalar
            {"inner_sums": {"formula": "doubled", "reduce": "sum"}},
            {"total_doubled": {"formula": "inner_sums", "reduce": "sum"}},
            # R7 innermost (ref fake_3d.count() -> JaggedArray), then R2
            {"inner_counts": {"formula": "fake3d", "reduce": "counts"}},
            {"n_elems": {"formula": "inner_counts", "reduce": "sum"}},
            # R1 composition with fill: first of each inner, then first overall
            {"firsts": {"formula": "fake3d", "reduce": 0}},
            {"first_first": {"formula": "firsts", "reduce": 0, "fill_missing": -1.0}},
            # innermost element mask before reduction (P3 on 3D)
            {"odd_sums": {"formula": "fake3d", "mask": "fake3d % 2 == 1", "reduce": "sum"}},
            {"odd_total": {"formula": "odd_sums", "reduce": "sum"}},
        ],
    )
    return stage.apply(df).select(
        "doc_id",
        F.expr("size(fake3d)").alias("n_outer"),
        "total_doubled",
        F.col("n_elems").cast("long").alias("n_elems"),
        "first_first",
        "odd_total",
    )


O_JAGGED_NESTED = """
WITH nested AS (
  SELECT doc_id,
         list_transform(list_filter([1, 2], i -> i <= doc_id % 3),
                        i -> list_transform(range(0, i), t -> CAST(t + doc_id AS DOUBLE))
         ) AS fake3d
  FROM documents
)
SELECT doc_id,
       CAST(len(fake3d) AS INT) AS n_outer,
       CAST(COALESCE(list_sum(list_transform(fake3d,
            a -> COALESCE(list_sum(list_transform(a, x -> x * 2)), 0.0))), 0.0)
            AS DOUBLE) AS total_doubled,
       CAST(COALESCE(list_sum(list_transform(fake3d, a -> len(a))), 0) AS BIGINT) AS n_elems,
       COALESCE(list_extract(list_transform(fake3d, a -> list_extract(a, 1)), 1), -1.0) AS first_first,
       CAST(COALESCE(list_sum(list_transform(fake3d,
            a -> COALESCE(list_sum(list_filter(a, x -> x % 2 = 1)), 0.0))), 0.0)
            AS DOUBLE) AS odd_total
FROM nested
"""


# ---------------------------------------------------------------------------
# 4. CutFlow (F1-F6, A7-A9) / SelectPhaseSpace (F7)
# ---------------------------------------------------------------------------

CUTFLOW_SELECTION = {
    "All": [
        "n_chars > 100",
        {"Any": ["kind == 'image'", "lon > 0.0"]},
        "w < 1.2",
    ]
}
CUTFLOW_WEIGHTS = {"w": "w"}


def q_cutflow(spark, sf_dir):
    df = flat_spans(spark, sf_dir)
    stage = CutFlowStage(name="cutflow", selection=CUTFLOW_SELECTION, weights=CUTFLOW_WEIGHTS)
    return stage.counters(df)


def _oracle_cutflow_sql() -> str:
    tree = parse_selection(CUTFLOW_SELECTION)

    def duck_leaf(node):
        from ..expressions import compile_expression

        return compile_expression(node.config)

    _, specs = compile_tree(tree, duck_leaf)
    return oracle_counters_sql(specs, O_SPANS_FLAT, CUTFLOW_WEIGHTS)


O_CUTFLOW = _oracle_cutflow_sql()


def q_cutflow_data(spark, sf_dir):
    """Data-eventtype cutflow: weights apply to MC only (ref:
    selection/filters.py:48), so the weighted columns equal the unweighted
    counts for a data dataset."""
    df = flat_spans(spark, sf_dir)
    stage = CutFlowStage(
        name="cutflow", selection=CUTFLOW_SELECTION, weights=CUTFLOW_WEIGHTS, is_mc=False
    )
    return stage.counters(df)


def _oracle_cutflow_data_sql() -> str:
    tree = parse_selection(CUTFLOW_SELECTION)

    def duck_leaf(node):
        from ..expressions import compile_expression

        return compile_expression(node.config)

    _, specs = compile_tree(tree, duck_leaf)
    return oracle_counters_sql(specs, O_SPANS_FLAT, {w: "1.0" for w in CUTFLOW_WEIGHTS})


O_CUTFLOW_DATA = _oracle_cutflow_data_sql()


def q_cutflow_filter(spark, sf_dir):
    """Surviving spans after the cut tree — span fields preserved exactly
    (span-sequence equality invariant)."""
    df = flat_spans(spark, sf_dir)
    stage = CutFlowStage(name="cutflow", selection=CUTFLOW_SELECTION)
    return stage.apply(df).select(
        "doc_id", "span_idx", "kind", "span_text", "media_ref", "span_offset"
    )


def _oracle_cutflow_filter_sql() -> str:
    tree = parse_selection(CUTFLOW_SELECTION)

    def duck_leaf(node):
        from ..expressions import compile_expression

        return compile_expression(node.config)

    mask, _ = compile_tree(tree, duck_leaf)
    return (
        f"SELECT doc_id, span_idx, kind, span_text, media_ref, span_offset "
        f"FROM ({O_SPANS_FLAT}) WHERE {mask}"
    )


O_CUTFLOW_FILTER = _oracle_cutflow_filter_sql()


def q_select_phasespace(spark, sf_dir):
    df = flat_spans(spark, sf_dir)
    stage = SelectPhaseSpaceStage(
        name="ps", selection={"All": ["n_chars > 200", "lat < 0.0"]}, region_name="south_long"
    )
    return stage.apply(df).select("doc_id", "span_idx", "south_long")


O_SELECT_PHASESPACE = f"""
SELECT doc_id, span_idx, ((n_chars > 200) AND (lat < 0.0)) AS south_long
FROM ({O_SPANS_FLAT})
"""


