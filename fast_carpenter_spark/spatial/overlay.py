"""Polygon-polygon overlay join: which polygons of a layer intersect.

Predicate for two simple rings A, B (complete for simple polygons, up to
exact-touch degeneracies that the synthetic layer cannot produce):

    overlap(A, B) = any vertex of A strictly inside B   (A ⊆ B, partial)
                 OR any vertex of B strictly inside A   (B ⊆ A, partial)
                 OR any edge of A properly crosses any edge of B
                                                        (star-of-david case)

Vertex containment reuses the crossing-parity PIP formula
(`pip.pip_condition_sql`); proper edge crossing uses the orientation
(cross-product sign) test — both are +/-/* on identical doubles, so the
Spark expression and the DuckDB oracle are bit-identical, and the output
exposes only the pair ids (hash-safe).

Scale design: candidates come from a longitude-band equi join — each
polygon explodes to the integer bands its bbox spans, pairs meet on a
band key, bbox-overlap prefilter, exact refine after `dropDuplicates`.
A polygon layer (admin zones, land cover) is ~10^6-10^8 rows, not 10^12:
one band-keyed shuffle with bounded replication (bands-per-polygon =
bbox_width / band_deg, giants bounded by 360/band_deg) is the right
shape; hot bands fall under the same AQE/salting backstop as hot cells.
The refine is O(|ringA| x |ringB|) per candidate inside whole-stage
codegen — no Python, no cartesian product.

ref: plays the role of fast-carpenter's All/Any selection combinators
(fast_carpenter/selection/filters.py) over geometric predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .pip import pip_condition_sql


def _edge_coords(lon_arr: str, lat_arr: str, i: str, dialect: str):
    """(x1, y1, x2, y2) SQL for directed edge ``i`` (1-based) of a ring."""
    ext = "element_at" if dialect == "spark" else "list_extract"
    ln = f"size({lon_arr})" if dialect == "spark" else f"len({lon_arr})"
    return (
        f"{ext}({lon_arr}, {i})",
        f"{ext}({lat_arr}, {i})",
        f"{ext}({lon_arr}, 1 + {i} % {ln})",
        f"{ext}({lat_arr}, 1 + {i} % {ln})",
    )


def _any_sql(n_expr: str, var: str, body: str, dialect: str) -> str:
    """EXISTS over 1..n: Spark `exists(sequence(...))`, DuckDB
    `len(list_filter(range(...))) > 0`."""
    if dialect == "spark":
        return f"exists(sequence(1, {n_expr}), {var} -> {body})"
    return f"len(list_filter(range(1, {n_expr} + 1), {var} -> {body})) > 0"


def poly_overlap_condition_sql(
    a_lon: str, a_lat: str, b_lon: str, b_lat: str, dialect: str
) -> str:
    """Boolean overlap(A, B) as one SQL expression over four array columns."""
    ln = (lambda a: f"size({a})") if dialect == "spark" else (lambda a: f"len({a})")
    ext = "element_at" if dialect == "spark" else "list_extract"

    # NB: the vertex-loop lambda variables must NOT be named `i` — the PIP
    # formula internally aggregates over the CONTAINING ring with its own
    # lambda var `i`, and the inner binding would shadow the vertex index
    # (wrong vertex picked, and out-of-bounds when ring lengths differ).
    vert_a_in_b = _any_sql(
        ln(a_lon),
        "va",
        pip_condition_sql(
            f"{ext}({a_lon}, va)", f"{ext}({a_lat}, va)", b_lon, b_lat, dialect
        ),
        dialect,
    )
    vert_b_in_a = _any_sql(
        ln(b_lon),
        "vb",
        pip_condition_sql(
            f"{ext}({b_lon}, vb)", f"{ext}({b_lat}, vb)", a_lon, a_lat, dialect
        ),
        dialect,
    )

    ax1, ay1, ax2, ay2 = _edge_coords(a_lon, a_lat, "i", dialect)
    bx1, by1, bx2, by2 = _edge_coords(b_lon, b_lat, "j", dialect)
    # orientation products: proper crossing iff both segment pairs straddle
    c1 = f"(({ax2}) - ({ax1})) * (({by1}) - ({ay1})) - (({ay2}) - ({ay1})) * (({bx1}) - ({ax1}))"
    c2 = f"(({ax2}) - ({ax1})) * (({by2}) - ({ay1})) - (({ay2}) - ({ay1})) * (({bx2}) - ({ax1}))"
    c3 = f"(({bx2}) - ({bx1})) * (({ay1}) - ({by1})) - (({by2}) - ({by1})) * (({ax1}) - ({bx1}))"
    c4 = f"(({bx2}) - ({bx1})) * (({ay2}) - ({by1})) - (({by2}) - ({by1})) * (({ax2}) - ({bx1}))"
    cross_pred = f"(({c1}) * ({c2}) < 0) AND (({c3}) * ({c4}) < 0)"
    edge_cross = _any_sql(
        ln(a_lon), "i", _any_sql(ln(b_lon), "j", cross_pred, dialect), dialect
    )

    return f"(({vert_a_in_b}) OR ({vert_b_in_a}) OR ({edge_cross}))"


BAND_DEG = 30.0  # longitude band width for the candidate equi join


def polygon_overlap_join(
    polys: DataFrame,
    *,
    id_col: str = "poly_id",
    band_deg: float = BAND_DEG,
) -> DataFrame:
    """Self-overlay: all pairs (poly_a < poly_b) whose rings intersect.

    One longitude-band equi join (bounded replication) + bbox prefilter +
    exact vertex/edge refine.  Returns (poly_a, poly_b)."""
    boxed = polys.select(
        F.col(id_col).alias("_pid"),
        F.col("ring_lon").alias("_rlon"),
        F.col("ring_lat").alias("_rlat"),
        F.expr("array_min(ring_lon)").alias("_xmin"),
        F.expr("array_max(ring_lon)").alias("_xmax"),
        F.expr("array_min(ring_lat)").alias("_ymin"),
        F.expr("array_max(ring_lat)").alias("_ymax"),
    )
    banded = boxed.select(
        "*",
        F.explode(
            F.expr(
                f"sequence(CAST(FLOOR(_xmin / {band_deg!r}) AS BIGINT), "
                f"CAST(FLOOR(_xmax / {band_deg!r}) AS BIGINT))"
            )
        ).alias("_band"),
    )
    a = banded.select(
        F.col("_pid").alias("poly_a"), F.col("_rlon").alias("_alon"),
        F.col("_rlat").alias("_alat"), F.col("_xmin").alias("_axmin"),
        F.col("_xmax").alias("_axmax"), F.col("_ymin").alias("_aymin"),
        F.col("_ymax").alias("_aymax"), "_band",
    )
    b = banded.select(
        F.col("_pid").alias("poly_b"), F.col("_rlon").alias("_blon"),
        F.col("_rlat").alias("_blat"), F.col("_xmin").alias("_bxmin"),
        F.col("_xmax").alias("_bxmax"), F.col("_ymin").alias("_bymin"),
        F.col("_ymax").alias("_bymax"), "_band",
    )
    cand = (
        a.join(b, "_band")
        .filter(F.col("poly_a") < F.col("poly_b"))
        .filter(
            (F.col("_axmin") <= F.col("_bxmax"))
            & (F.col("_bxmin") <= F.col("_axmax"))
            & (F.col("_aymin") <= F.col("_bymax"))
            & (F.col("_bymin") <= F.col("_aymax"))
        )
        .dropDuplicates(["poly_a", "poly_b"])
    )
    cond = poly_overlap_condition_sql("_alon", "_alat", "_blon", "_blat", "spark")
    return cand.filter(F.expr(cond)).select("poly_a", "poly_b")


def polygon_overlap_oracle_sql(polygons_values: str) -> str:
    """DuckDB ground truth: brute-force every pair with the identical
    predicate (no bbox pruning — independent of the candidate path)."""
    cond = poly_overlap_condition_sql(
        "a.ring_lon", "a.ring_lat", "b.ring_lon", "b.ring_lat", "duck"
    )
    return f"""
WITH p AS (SELECT * FROM {polygons_values})
SELECT a.poly_id AS poly_a, b.poly_id AS poly_b
FROM p a, p b
WHERE a.poly_id < b.poly_id AND {cond}
"""
