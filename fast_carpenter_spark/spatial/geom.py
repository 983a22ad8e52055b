"""Polygon geometry metrics: signed shoelace area, centroid, winding.

Purely map-side (no shuffle at all — each polygon row folds its own ring
arrays), so at 100 TB this is embarrassingly parallel and the only cost
is the scan.

Float discipline: the shoelace and centroid sums are LEFT FOLDS with a
pinned term order (vertex index 1..n) on both engines — Spark
``aggregate(sequence(...))`` and DuckDB ``list_reduce(list_prepend(0.0,
list_transform(range(...))))`` perform the identical sequence of IEEE
additions on identically-computed terms, so the resulting doubles are
bit-exact across engines and safe for the driver's value hash.  A naive
``sum() OVER unnest`` would NOT be: engines order partial sums
differently.
"""

from __future__ import annotations


def _fold_sql(term: str, n_terms: str, dialect: str) -> str:
    """Left-fold sum of ``term`` (uses variable ``i`` = 1..n) — identical
    addition order on both engines."""
    if dialect == "spark":
        return (
            f"aggregate(sequence(1, {n_terms}), CAST(0.0 AS DOUBLE), "
            f"(acc, i) -> acc + ({term}))"
        )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {n_terms} + 1), i -> ({term}))), "
        f"(a, b) -> a + b)"
    )


def _at(arr: str, idx: str, dialect: str) -> str:
    """1-based array access in either dialect."""
    if dialect == "spark":
        return f"element_at({arr}, CAST({idx} AS INT))"
    return f"list_extract({arr}, CAST({idx} AS BIGINT))"


def polygon_metrics_sql(polygons_from: str, dialect: str) -> str:
    """SELECT poly_id, region, n_vertices, area, centroid_lon,
    centroid_lat, winding FROM ``polygons_from``.

    ``area`` is the unsigned shoelace area (planar degrees²); ``winding``
    classifies ring orientation from the signed area.  Centroid is the
    polygon (not vertex) centroid: C = Σ (p_i + p_{i+1}) c_i / (6A) with
    c_i the cross term — ill-defined for degenerate zero-area rings (the
    synthetic layer has none).
    """
    n = "size(ring_lon)" if dialect == "spark" else "len(ring_lon)"
    xi = _at("ring_lon", "i", dialect)
    yi = _at("ring_lat", "i", dialect)
    xj = _at("ring_lon", f"i % {n} + 1", dialect)
    yj = _at("ring_lat", f"i % {n} + 1", dialect)
    cross = f"({xi} * {yj} - {xj} * {yi})"
    signed = f"(0.5 * {_fold_sql(cross, n, dialect)})"
    cx_sum = _fold_sql(f"({xi} + {xj}) * {cross}", n, dialect)
    cy_sum = _fold_sql(f"({yi} + {yj}) * {cross}", n, dialect)
    return f"""
SELECT poly_id, region, CAST({n} AS BIGINT) AS n_vertices,
       abs(sa) AS area,
       cxs / (6.0 * sa) AS centroid_lon,
       cys / (6.0 * sa) AS centroid_lat,
       CASE WHEN sa > 0.0 THEN 'ccw' ELSE 'cw' END AS winding
FROM (
  SELECT poly_id, region, ring_lon, ring_lat,
         {signed} AS sa, {cx_sum} AS cxs, {cy_sum} AS cys
  FROM {polygons_from}
) t
"""
