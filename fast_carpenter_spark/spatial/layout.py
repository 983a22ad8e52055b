"""Layout A/B: quantify WHY the snapshot partitioner uses Hilbert order.

``layout_compare_sql`` assigns the corpus's occupied res-5 cells to F
range-partitioned files twice — once ordered by Hilbert rank, once by
Morton (Z-order) rank — and reports, per res-2 quadrant window query, how
many files each layout forces open.  Locality of the space-filling curve
is exactly what manifest pruning buys at 100 TB (sources/snapshot.py
Hilbert-partitioned snapshots open only the files whose hkey range
intersects the query window): the fewer files a window touches, the
cheaper every spatial scan.  Hilbert's no-jump property makes contiguous
windows touch fewer range-files than Morton's discontinuous Z jumps —
this query turns that design claim into a measured, oracle-checked table.
On this near-fully-occupied synthetic grid the gap is honest but modest
(88 vs 93 files at res 5 / 64 windows / 32 files); on sparse real-world
corpora (oceans empty, cities hot) the Z-jump penalty grows with the
occupancy contrast.

Mechanics
---------
* Morton rank: closed-form 5-bit interleave (pure shifts/masks/adds,
  identical semantics both dialects).
* Hilbert rank: the engine's layout kernel (grid.hilbert_key) evaluated
  ONCE over the constant 32x32 grid and injected as a 1024-row literal
  lookup — exactly how the engine itself uses Hilbert (physical-layout
  metadata computed at plan time, never a data-path expression), and the
  same literal feeds both engines so the comparison is bit-identical.
* File assignment: equal-count range partitioning via
  (rank_rn - 1) * F DIV n_occupied — integer-exact.

Scale shape: one corpus-sized cell histogram; everything after is bounded
by grid cardinality (1024 cells).  The 1024-row literal join is
broadcast-sized by construction.
"""

from __future__ import annotations

import numpy as np

from .. import grid

LAYOUT_RES = 5
LAYOUT_QUAD_RES = 3
LAYOUT_FILES = 32


def _hilbert_values() -> str:
    n = 1 << LAYOUT_RES
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    hk = grid.hilbert_key(xs.ravel(), ys.ravel(), LAYOUT_RES)
    rows = ", ".join(
        f"({x * n + y}, {h})" for x, y, h in zip(xs.ravel(), ys.ravel(), hk)
    )
    return f"(VALUES {rows}) AS hl(xy, hk)"


def _morton_spread(v: str, dialect: str) -> str:
    """Spread the low 5 bits of ``v`` to even positions (abcde ->
    a0b0c0d0e): sum of masked single bits shifted left by their index."""
    terms = []
    for b in range(LAYOUT_RES):
        bit = f"(({v}) & {1 << b})"
        if dialect == "spark":
            terms.append(f"shiftleft({bit}, {b})")
        else:
            terms.append(f"({bit} << {b})")
    return "(" + " + ".join(terms) + ")"


def layout_compare_sql(points_sql: str, dialect: str) -> str:
    res, qres, nf = LAYOUT_RES, LAYOUT_QUAD_RES, LAYOUT_FILES
    n = 1 << res
    shift = res - qres
    cell = grid.cell_sql("lon", "lat", res, dialect)
    ux = grid.unpack_x_sql("cell", dialect)
    uy = grid.unpack_y_sql("cell", dialect)
    op = "DIV" if dialect == "spark" else "//"
    mx = _morton_spread("x", dialect)
    my = _morton_spread("y", dialect)
    return f"""
WITH occ AS (
  SELECT DISTINCT {cell} AS cell FROM ({points_sql})
),
keyed AS (
  SELECT {ux} AS x, {uy} AS y FROM occ
),
ranked AS (
  SELECT x, y,
         row_number() OVER (ORDER BY hl.hk) AS rn_h,
         row_number() OVER (ORDER BY {mx} + 2 * {my}) AS rn_m,
         count(*) OVER () AS n_occ
  FROM keyed JOIN {_hilbert_values()} ON hl.xy = keyed.x * {n} + keyed.y
),
filed AS (
  SELECT x {op} {1 << shift} AS qx, y {op} {1 << shift} AS qy,
         ((rn_h - 1) * {nf}) {op} n_occ AS file_h,
         ((rn_m - 1) * {nf}) {op} n_occ AS file_m
  FROM ranked
)
SELECT qx, qy, CAST(count(*) AS BIGINT) AS n_cells,
       CAST(count(DISTINCT file_h) AS BIGINT) AS files_hilbert,
       CAST(count(DISTINCT file_m) AS BIGINT) AS files_morton
FROM filed GROUP BY qx, qy
"""


def hilbert_intervals(hkeys, max_intervals: int | None = None) -> list[tuple[int, int]]:
    """Decompose a set of Hilbert keys into its maximal contiguous runs —
    the multi-range scan plan for a region whose cell cover is NOT one
    contiguous interval (anything but a curve-aligned quadrant).

    When ``max_intervals`` caps the plan size, adjacent runs are merged
    smallest-gap-first (ties: leftmost) until the cap holds: every merge
    admits exactly ``gap`` extra keys, so greedily closing the smallest
    gaps minimizes the false-positive key volume — the same trade an
    Iceberg range-split planner makes.  Purely plan-time arithmetic on a
    sorted key set (region cell counts, not data), deterministic."""
    ks = sorted(set(int(k) for k in hkeys))
    if not ks:
        return []
    runs: list[list[int]] = [[ks[0], ks[0]]]
    for k in ks[1:]:
        if k == runs[-1][1] + 1:
            runs[-1][1] = k
        else:
            runs.append([k, k])
    while max_intervals is not None and len(runs) > max_intervals:
        gaps = [
            (runs[i + 1][0] - runs[i][1], i) for i in range(len(runs) - 1)
        ]
        _, i = min(gaps)
        runs[i][1] = runs[i + 1][1]
        del runs[i + 1]
    return [(a, b) for a, b in runs]
