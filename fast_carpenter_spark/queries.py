"""Driver-contract queries: each entry pairs a Spark implementation with an
independent DuckDB oracle over the same parquet tables.

Every operator from SURVEY.md §2 that is implemented gets an entry here;
``__spark_entry__.py`` re-exports them.  Column names are aliased
identically on both sides (driver hashes values after sorting columns by
name).  All weights/values are designed to be order-insensitive under
double addition (binary fractions / integers), so hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import grid, synth
from .operators.binned import BinnedDataframeStage, Dimension
from .operators.define import DefineStage
from .operators.selection import (
    CutFlowStage,
    SelectPhaseSpaceStage,
    compile_tree,
    oracle_counters_sql,
    parse_selection,
    spark_leaf_sql,
)
from .operators.systematics import SystematicWeightsStage
from .spatial.join import SpatialJoinStage
from .spatial.knn import knn_bounded, knn_oracle_sql, radius_join, radius_join_oracle_sql
from .spatial.pip import pip_oracle_sql
from .spatial.raster import raster_vector_join

BASE_RES = 16
TILE_RES = 8
COARSE_RES = 4
REGION_RES = 6


def _drain(q, timeout: int = 300) -> None:
    """Block until an availableNow streaming query finishes, and FAIL if
    it does not: a timed-out drain means the delta directory holds only a
    prefix of the batches, and silently aggregating it would be a wrong
    answer rather than an error."""
    done = q.awaitTermination(timeout)
    if not done:
        try:
            q.stop()
        finally:
            raise RuntimeError(
                f"streaming drain incomplete after {timeout}s — refusing to "
                "read a partial delta set"
            )


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df.createOrReplaceTempView("documents")
    return df


def flat_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_documents(spark, sf_dir)
    return spark.sql(synth.flat_spans_sql("spark"))


# ---------------------------------------------------------------------------
# 1. synthesis / explode / projection
# ---------------------------------------------------------------------------


def q_spans_flat(spark, sf_dir):
    """Interleaved spans, exploded with geometry (S4/S5 scans + A2 explode)."""
    return flat_spans(spark, sf_dir)


O_SPANS_FLAT = synth.flat_spans_sql("duck")


def q_cell_encode(spark, sf_dir):
    """Hierarchical cell encode at base + parent resolution (grid core)."""
    df = flat_spans(spark, sf_dir)
    cell = grid.cell_sql("lon", "lat", BASE_RES, "spark")
    return df.select(
        "doc_id", "span_idx", "lon", "lat",
        F.expr(cell).alias("cell16"),
        F.expr(grid.parent_sql(cell, BASE_RES, TILE_RES, "spark")).alias("cell8"),
    )


_d_cell = grid.cell_sql("lon", "lat", BASE_RES, "duck")
O_CELL_ENCODE = f"""
SELECT doc_id, span_idx, lon, lat,
       {_d_cell} AS cell16,
       {grid.parent_sql(_d_cell, BASE_RES, TILE_RES, "duck")} AS cell8
FROM ({O_SPANS_FLAT})
"""


# ---------------------------------------------------------------------------
# 2. tile aggregation (BinnedDataframe analogue A1/A4/A5) + zoom rollup
# ---------------------------------------------------------------------------


def q_tile_agg(spark, sf_dir):
    df = flat_spans(spark, sf_dir).withColumn(
        "cell", F.expr(grid.cell_sql("lon", "lat", TILE_RES, "spark"))
    )
    stage = BinnedDataframeStage(name="tiles", binning=[{"in": "cell"}], weights={"w": "w"})
    return stage.apply(df)


O_TILE_AGG = f"""
SELECT {grid.cell_sql('lon', 'lat', TILE_RES, 'duck')} AS cell,
       count(*) AS n, sum(w) AS w_sumw, sum(w * w) AS w_sumw2
FROM ({O_SPANS_FLAT})
GROUP BY 1
"""


def q_tile_agg_dataset(spark, sf_dir):
    """dataset-dimension variant (A5): `source` plays the dataset column."""
    df = flat_spans(spark, sf_dir).withColumn(
        "cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark"))
    )
    stage = BinnedDataframeStage(
        name="tiles", binning=[{"in": "cell"}], weights={"w": "w"}, dataset_col="source"
    )
    return stage.apply(df)


O_TILE_AGG_DATASET = f"""
SELECT source, {grid.cell_sql('lon', 'lat', REGION_RES, 'duck')} AS cell,
       count(*) AS n, sum(w) AS w_sumw, sum(w * w) AS w_sumw2
FROM ({O_SPANS_FLAT})
GROUP BY 1, 2
"""


def q_streaming_tile_agg(spark, sf_dir):
    """Structured-Streaming tile aggregation, drained with availableNow:
    the accumulated micro-batch partial deltas merged at read time must
    equal the batch aggregate EXACTLY (same oracle as tile_agg) — the
    streaming path passes the same bit-exact correctness gate as batch."""
    import tempfile

    from .streaming.tile_stream import StreamingTileAgg

    import os

    stage = StreamingTileAgg(
        name="st",
        res=TILE_RES,
        out_dir=tempfile.mkdtemp(prefix="fcs_stream_q_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="fcs_stream_ckpt_q_"),
    )
    # the file stream source needs a DIRECTORY; the test tables ship as
    # single parquet files — expose via a symlinked temp dir
    src = f"{sf_dir}/documents.parquet"
    if os.path.isfile(src):
        d = tempfile.mkdtemp(prefix="fcs_stream_in_")
        os.symlink(src, os.path.join(d, "part-000.parquet"))
        src = d
    q = stage.start(spark, src, available_now=True)
    _drain(q)
    return stage.result(spark)


def q_streaming_dedup(spark, sf_dir):
    """Structured-Streaming exact dedup, drained with availableNow: the
    delta-partials merge must equal the batch dedup table EXACTLY (same
    oracle as dedup_exact); cross-batch group merging is exercised in
    tests/test_streaming.py."""
    import os
    import tempfile

    from .streaming.dedup_stream import StreamingExactDedup

    stage = StreamingExactDedup(
        name="sdq",
        out_dir=tempfile.mkdtemp(prefix="fcs_sdedup_q_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="fcs_sdedup_ckpt_q_"),
    )
    src = f"{sf_dir}/documents.parquet"
    if os.path.isfile(src):
        d = tempfile.mkdtemp(prefix="fcs_sdedup_in_")
        os.symlink(src, os.path.join(d, "part-000.parquet"))
        src = d
    q = stage.start(spark, src, available_now=True)
    _drain(q)
    return stage.result(spark)


def q_streaming_hll(spark, sf_dir):
    """Structured-Streaming HLL sketch drained with availableNow: per
    micro-batch sparse registers (bounded state: <= n_langs * 64 rows per
    batch), read-time max-merge + finalize — must equal the batch
    hll_distinct's (n_hit, sum_int, est) bit-for-bit (registers merge by
    idempotent max).  Cross-batch merging exercised in tests."""
    import os
    import tempfile

    from .streaming.sketch_stream import StreamingHll

    stage = StreamingHll(
        name="shll",
        out_dir=tempfile.mkdtemp(prefix="fcs_shll_q_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="fcs_shll_ckpt_q_"),
    )
    src = f"{sf_dir}/documents.parquet"
    if os.path.isfile(src):
        d = tempfile.mkdtemp(prefix="fcs_shll_in_")
        os.symlink(src, os.path.join(d, "part-000.parquet"))
        src = d
    q = stage.start(spark, src, available_now=True)
    _drain(q)
    return stage.result(spark)


def _o_streaming_hll() -> str:
    from .functions import sketch as _sketch

    return (
        "SELECT lang, n_hit, sum_int, est FROM ("
        + _sketch.hll_distinct_oracle_sql()
        + ")"
    )


def q_streaming_theta(spark, sf_dir):
    """Structured-Streaming theta sketch drained with availableNow: per
    micro-batch kept sets (the ~1/16 sampled distinct-hash sub-space),
    read-time set-union merge — must equal the batch theta_distinct's
    (n_kept, est_int) exactly, because union of per-batch kept sets IS the
    corpus kept set (idempotent merge: replays are harmless by algebra)."""
    import os
    import tempfile

    from .streaming.sketch_stream import StreamingTheta

    stage = StreamingTheta(
        name="stheta",
        out_dir=tempfile.mkdtemp(prefix="fcs_stheta_q_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="fcs_stheta_ckpt_q_"),
    )
    src = f"{sf_dir}/documents.parquet"
    if os.path.isfile(src):
        d = tempfile.mkdtemp(prefix="fcs_stheta_in_")
        os.symlink(src, os.path.join(d, "part-000.parquet"))
        src = d
    q = stage.start(spark, src, available_now=True)
    _drain(q)
    return stage.result(spark)


def _o_streaming_theta() -> str:
    from .functions import sketch as _sketch

    return (
        "SELECT lang, n_kept, est_int FROM ("
        + _sketch.theta_distinct_oracle_sql()
        + ")"
    )


def q_streaming_cms(spark, sf_dir):
    """Structured-Streaming count-min sketch drained with availableNow:
    per micro-batch bounded d×w grid partials, read-time element-wise SUM
    merge — must equal the single-pass cms_sketch exactly (associative
    addition).  The additive (non-idempotent) member of the streaming
    sketch family: replay safety comes from the exactly-once sink
    discipline, not the algebra — the documented contrast with HLL/theta."""
    import os
    import tempfile

    from .streaming.sketch_stream import StreamingCms

    stage = StreamingCms(
        name="scms",
        out_dir=tempfile.mkdtemp(prefix="fcs_scms_q_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="fcs_scms_ckpt_q_"),
    )
    src = f"{sf_dir}/documents.parquet"
    if os.path.isfile(src):
        d = tempfile.mkdtemp(prefix="fcs_scms_in_")
        os.symlink(src, os.path.join(d, "part-000.parquet"))
        src = d
    q = stage.start(spark, src, available_now=True)
    _drain(q)
    return stage.result(spark).withColumn("row", F.col("row").cast("int"))


def _o_streaming_cms() -> str:
    from .functions import sketch as _sketch

    return _sketch.cms_sketch_oracle_sql()


def q_streaming_qdigest(spark, sf_dir):
    """Structured-Streaming q-digest drained with availableNow: per
    micro-batch bounded VALUE-HISTOGRAM deltas (<= U rows/batch), read-time
    per-value sum-merge, compression once at finalize — bit-identical to
    the batch qdigest_quantiles because histogram summing commutes and the
    lossy compression runs exactly once (same oracle)."""
    import os
    import tempfile

    from .streaming.sketch_stream import StreamingQdigest

    stage = StreamingQdigest(
        name="sqd",
        out_dir=tempfile.mkdtemp(prefix="fcs_sqd_q_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="fcs_sqd_ckpt_q_"),
    )
    src = f"{sf_dir}/documents.parquet"
    if os.path.isfile(src):
        d = tempfile.mkdtemp(prefix="fcs_sqd_in_")
        os.symlink(src, os.path.join(d, "part-000.parquet"))
        src = d
    q = stage.start(spark, src, available_now=True)
    _drain(q)
    return stage.result(spark)


def q_streaming_sessionize(spark, sf_dir):
    """Structured-Streaming gap sessionization drained with availableNow:
    per-batch session FRAGMENTS + read-time temporal-adjacency merge must
    equal the batch operator EXACTLY (same oracle as events_sessionize).
    The input is re-written as contiguous (ts, event_id) range slices —
    the contiguity precondition the fragment algebra needs; slice
    processing order is irrelevant (out-of-order backfill safe)."""
    import tempfile

    from .streaming.session_stream import StreamingSessionize

    ev = _load_events(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="fcs_sess_in_")
    ev.repartitionByRange(4, "ts", "event_id").write.mode("overwrite").parquet(d)
    stage = StreamingSessionize(
        name="ssq",
        out_dir=tempfile.mkdtemp(prefix="fcs_sess_out_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="fcs_sess_ckpt_"),
        gap_us=SESSION_GAP_US,
    )
    q = stage.start(spark, d, available_now=True)
    _drain(q)
    return stage.result(spark)


def q_tile_distinct(spark, sf_dir):
    """Distinct-document tile stats: per cell, exact count(DISTINCT doc)
    alongside span counts (the de-duplicated coverage statistic; at 10^12
    docs swap countDistinct for approx_count_distinct — same plan shape,
    sketch merge instead of exact set union)."""
    df = flat_spans(spark, sf_dir).withColumn(
        "cell", F.expr(grid.cell_sql("lon", "lat", COARSE_RES, "spark"))
    )
    return df.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


O_TILE_DISTINCT = f"""
SELECT {grid.cell_sql('lon', 'lat', COARSE_RES, 'duck')} AS cell,
       count(*) AS n_spans, count(DISTINCT doc_id) AS n_docs
FROM ({O_SPANS_FLAT})
GROUP BY 1
"""


def q_tile_smooth(spark, sf_dir):
    """k-ring neighborhood smoothing (grid convolution): each res-6 cell's
    smoothed aggregate sums its own and its 8 ring-1 neighbours' tile
    stats — the cell-ring expansion of the north_star applied to
    aggregation.  One explode over 9 constant offsets + re-aggregation;
    no joins."""
    n = 1 << REGION_RES
    tiles = (
        flat_spans(spark, sf_dir)
        .withColumn("cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("w_sumw"))
    )
    x = grid.unpack_x_sql("cell", "spark")
    y = grid.unpack_y_sql("cell", "spark")
    ring = (
        "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> "
        f"struct({x} + dx AS x, {y} + dy AS y))))"
    )
    contrib = (
        tiles.select("n", "w_sumw", F.explode(F.expr(ring)).alias("_nc"))
        .filter(
            (F.col("_nc.x") >= 0) & (F.col("_nc.x") < n)
            & (F.col("_nc.y") >= 0) & (F.col("_nc.y") < n)
        )
        .select(
            F.expr(grid.pack_sql(REGION_RES, "_nc.x", "_nc.y")).alias("cell"),
            "n", "w_sumw",
        )
    )
    return contrib.groupBy("cell").agg(
        F.sum("n").alias("n_smooth"), F.sum("w_sumw").alias("w_smooth")
    )


_n6 = 1 << REGION_RES
O_TILE_SMOOTH = f"""
WITH tiles AS (
  SELECT {grid.cell_sql('lon', 'lat', REGION_RES, 'duck')} AS cell,
         count(*) AS n, sum(w) AS w_sumw
  FROM ({O_SPANS_FLAT})
  GROUP BY 1
),
contrib AS (
  SELECT {grid.pack_sql(REGION_RES, f"({grid.unpack_x_sql('cell', 'duck')} + dx)", f"({grid.unpack_y_sql('cell', 'duck')} + dy)")} AS tcell,
         n, w_sumw
  FROM tiles,
       (SELECT unnest(range(-1, 2)) AS dx),
       (SELECT unnest(range(-1, 2)) AS dy)
  WHERE {grid.unpack_x_sql('cell', 'duck')} + dx BETWEEN 0 AND {_n6 - 1}
    AND {grid.unpack_y_sql('cell', 'duck')} + dy BETWEEN 0 AND {_n6 - 1}
)
SELECT tcell AS cell, CAST(sum(n) AS BIGINT) AS n_smooth, sum(w_sumw) AS w_smooth
FROM contrib GROUP BY 1
"""


def q_tile_gauss(spark, sf_dir):
    """Binomial-weighted 3×3 smoothing (the separable [1,2,1]⊗[1,2,1]
    Gaussian approximation): like tile_smooth but each neighbour
    contributes weight (2-|dx|)·(2-|dy|) ∈ {1,2,4} — integer weights keep
    the count channel exact BIGINT, and the weight channel stays exact
    because span weights are binary fractions.  Same single-explode,
    no-join shape as the box smooth."""
    n = 1 << REGION_RES
    tiles = (
        flat_spans(spark, sf_dir)
        .withColumn("cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("w_sumw"))
    )
    x = grid.unpack_x_sql("cell", "spark")
    y = grid.unpack_y_sql("cell", "spark")
    ring = (
        "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> "
        f"struct({x} + dx AS x, {y} + dy AS y, "
        "(2 - abs(dx)) * (2 - abs(dy)) AS kw))))"
    )
    contrib = (
        tiles.select("n", "w_sumw", F.explode(F.expr(ring)).alias("_nc"))
        .filter(
            (F.col("_nc.x") >= 0) & (F.col("_nc.x") < n)
            & (F.col("_nc.y") >= 0) & (F.col("_nc.y") < n)
        )
        .select(
            F.expr(grid.pack_sql(REGION_RES, "_nc.x", "_nc.y")).alias("cell"),
            F.expr("CAST(_nc.kw AS BIGINT) * n").alias("kn"),
            F.expr("CAST(_nc.kw AS DOUBLE) * w_sumw").alias("kws"),
        )
    )
    return contrib.groupBy("cell").agg(
        F.sum("kn").alias("n_gauss"), F.sum("kws").alias("w_gauss")
    )


O_TILE_GAUSS = f"""
WITH tiles AS (
  SELECT {grid.cell_sql('lon', 'lat', REGION_RES, 'duck')} AS cell,
         count(*) AS n, sum(w) AS w_sumw
  FROM ({O_SPANS_FLAT})
  GROUP BY 1
),
contrib AS (
  SELECT {grid.pack_sql(REGION_RES, f"({grid.unpack_x_sql('cell', 'duck')} + dx)", f"({grid.unpack_y_sql('cell', 'duck')} + dy)")} AS tcell,
         CAST((2 - abs(dx)) * (2 - abs(dy)) AS BIGINT) * n AS kn,
         CAST((2 - abs(dx)) * (2 - abs(dy)) AS DOUBLE) * w_sumw AS kws
  FROM tiles,
       (SELECT unnest(range(-1, 2)) AS dx),
       (SELECT unnest(range(-1, 2)) AS dy)
  WHERE {grid.unpack_x_sql('cell', 'duck')} + dx BETWEEN 0 AND {_n6 - 1}
    AND {grid.unpack_y_sql('cell', 'duck')} + dy BETWEEN 0 AND {_n6 - 1}
)
SELECT tcell AS cell, CAST(sum(kn) AS BIGINT) AS n_gauss, sum(kws) AS w_gauss
FROM contrib GROUP BY 1
"""


def q_tile_hotspot(spark, sf_dir):
    """Getis–Ord Gi* hotspot z-scores over the res-6 tile field — the
    cutflow-style 'is this region significant' classifier on top of the
    BinnedDataframe analogue.  All z inputs are exact integers; the double
    formula is the same expression text on both engines (bit-identical)."""
    from .spatial.stats import gi_star

    tiles = (
        flat_spans(spark, sf_dir)
        .withColumn("cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return gi_star(tiles, REGION_RES)


def _o_tile_hotspot() -> str:
    from .spatial.stats import gi_star_oracle_sql

    tiles = (
        f"SELECT {grid.cell_sql('lon', 'lat', REGION_RES, 'duck')} AS cell, "
        f"count(*) AS n FROM ({O_SPANS_FLAT}) GROUP BY 1"
    )
    return gi_star_oracle_sql(tiles, REGION_RES)


O_TILE_HOTSPOT = _o_tile_hotspot()


def q_tile_moran(spark, sf_dir):
    """Global Moran's I autocorrelation of the res-6 tile count field
    (queen ring-1 weights, occupied cells): the one-number 'is this field
    clustered at all' companion to the per-cell Gi* classifier.  Exact
    BIGINT scaled deviations; one shared-text double at the end."""
    from .spatial.stats import moran_i

    tiles = (
        flat_spans(spark, sf_dir)
        .withColumn("cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return moran_i(tiles, REGION_RES)


def _o_tile_moran() -> str:
    from .spatial.stats import moran_i_oracle_sql

    tiles = (
        f"SELECT {grid.cell_sql('lon', 'lat', REGION_RES, 'duck')} AS cell, "
        f"count(*) AS n FROM ({O_SPANS_FLAT}) GROUP BY 1"
    )
    return moran_i_oracle_sql(tiles, REGION_RES)


O_TILE_MORAN = _o_tile_moran()


def q_tile_lisa(spark, sf_dir):
    """Local Moran's I (LISA) per res-6 cell with HH/LL/HL/LH hot/cold
    quadrant classification — per-cell spatial-association companion to
    the global tile_moran (exact-integer signs classify; one mul/div
    double per row)."""
    from .spatial.stats import local_moran

    tiles = (
        flat_spans(spark, sf_dir)
        .withColumn("cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return local_moran(tiles, REGION_RES)


def _o_tile_lisa() -> str:
    from .spatial.stats import local_moran_oracle_sql

    tiles = (
        f"SELECT {grid.cell_sql('lon', 'lat', REGION_RES, 'duck')} AS cell, "
        f"count(*) AS n FROM ({O_SPANS_FLAT}) GROUP BY 1"
    )
    return local_moran_oracle_sql(tiles, REGION_RES)


O_TILE_LISA = _o_tile_lisa()


# Contiguous hot-region labelling: dense tiles -> 8-adjacency connected
# components.  res 5 / min 4 picked so the sf0.01 corpus yields ~40
# multi-cell regions (structure worth testing) with a cheap oracle CTE.
REGION_CC_RES = 5
REGION_CC_MIN = 4


def _dense_cells_edges(spark, sf_dir):
    """Dense-cell table (n >= REGION_CC_MIN at REGION_CC_RES) and its
    8-adjacency edge list (both orientations) — shared by the region
    labelling and BFS queries."""
    cell = grid.cell_sql("lon", "lat", REGION_CC_RES, "spark")
    dense = (
        flat_spans(spark, sf_dir)
        .groupBy(F.expr(cell).alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= REGION_CC_MIN)
    )
    n_ax = 1 << REGION_CC_RES
    deltas = ", ".join(
        f"struct({dx}L AS dx, {dy}L AS dy)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    )
    # 8-neighbour candidate cells, clamped at the grid boundary (no wrap)
    nbr = (
        dense.select(
            "cell",
            F.expr(grid.unpack_x_sql("cell", "spark")).alias("x"),
            F.expr(grid.unpack_y_sql("cell", "spark")).alias("y"),
            F.explode(F.expr(f"array({deltas})")).alias("d"),
        )
        .select(
            "cell",
            (F.col("x") + F.col("d.dx")).alias("nx"),
            (F.col("y") + F.col("d.dy")).alias("ny"),
        )
        .filter(
            (F.col("nx") >= 0) & (F.col("nx") < n_ax)
            & (F.col("ny") >= 0) & (F.col("ny") < n_ax)
        )
        .select(
            "cell",
            F.expr(grid.pack_sql(REGION_CC_RES, "nx", "ny")).alias("nbr"),
        )
    )
    edges = nbr.join(
        dense.select(F.col("cell").alias("nbr")), "nbr"
    ).select(F.col("cell").alias("src"), F.col("nbr").alias("dst"))
    return dense, edges


def q_tile_regions(spark, sf_dir):
    """Contiguous hot-region labelling — the spatial twin of near-dup
    clustering: dense tiles (n >= REGION_CC_MIN at res REGION_CC_RES) are
    nodes, 8-adjacency (Chebyshev distance 1) gives edges, and the shared
    Pregel min-label loop (functions/graph.py) labels each contiguous
    region with its minimum cell id.  Output: one row per region with its
    cell count and total point count.

    Scale shape: the dense-cell table is the POST-aggregation tile table
    (orders of magnitude smaller than the input), the neighbour explode is
    a fixed x8, and the adjacency join is an equi-join on packed cell ids
    — broadcastable whenever the dense set is, shuffle-safe otherwise.
    Region diameter bounds the rounds, and real hot regions are blobs
    (diameter ~ sqrt(cells)), not chains."""
    from .functions.graph import connected_components

    dense, edges = _dense_cells_edges(spark, sf_dir)
    labels = connected_components(dense.select("cell"), edges, node_col="cell")
    return (
        dense.join(labels, "cell")
        .groupBy(F.col("cluster_id").alias("region_id"))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n").alias("total_n"),
        )
    )


def _o_tile_regions() -> str:
    from .functions.graph import reach_cte_sql

    cell = grid.cell_sql("lon", "lat", REGION_CC_RES, "duck")
    ux = lambda e: grid.unpack_x_sql(e, "duck")  # noqa: E731
    uy = lambda e: grid.unpack_y_sql(e, "duck")  # noqa: E731
    edges_sql = f"""SELECT a.cell AS src, b.cell AS dst FROM dense a JOIN dense b
  ON a.cell <> b.cell
 AND abs({ux('a.cell')} - {ux('b.cell')}) <= 1
 AND abs({uy('a.cell')} - {uy('b.cell')}) <= 1"""
    cte = reach_cte_sql(edges_sql, "SELECT cell AS node FROM dense", "node")
    return f"""
WITH RECURSIVE
dense AS (SELECT {cell} AS cell, count(*) AS n FROM ({O_SPANS_FLAT})
          GROUP BY 1 HAVING count(*) >= {REGION_CC_MIN}),
{cte}
SELECT cl.cluster_id AS region_id, count(*) AS n_cells,
       CAST(sum(d.n) AS BIGINT) AS total_n
FROM cl JOIN dense d ON d.cell = cl.node
GROUP BY 1
"""


O_TILE_REGIONS = _o_tile_regions()


def q_spans_reconstruct(spark, sf_dir):
    """Interleaved-document roundtrip: re-assemble every document from its
    span array in offset order (text spans verbatim, media spans as typed
    placeholders) — the per-row span-sequence-equality invariant from the
    input contract, proven per document against an independent ordered
    string aggregation.  Pure codegen (array_sort + ordered fold), no
    shuffle at all: one narrow map over the snapshot."""
    load_documents(spark, sf_dir)
    df = spark.sql(synth.spans_table_sql("spark"))
    tok = (
        "CASE WHEN s.kind = 'text' THEN s.text "
        "ELSE concat('<', s.kind, ':', s.media_ref, '>') END"
    )
    return df.selectExpr(
        "doc_id",
        "size(spans) AS n_spans",
        "size(filter(spans, s -> s.kind <> 'text')) AS n_media",
        "aggregate(array_sort(spans, (a, b) -> CASE WHEN a.offset < b.offset THEN -1 "
        "WHEN a.offset > b.offset THEN 1 ELSE 0 END), "
        f"CAST('' AS STRING), (acc, s) -> concat(acc, {tok})) AS doc_restored",
    )


O_SPANS_RECONSTRUCT = f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM ({synth.spans_table_sql('duck')}))
SELECT doc_id,
       CAST(count(*) AS INT) AS n_spans,
       CAST(count(*) FILTER (WHERE sp['kind'] <> 'text') AS INT) AS n_media,
       string_agg(CASE WHEN sp['kind'] = 'text' THEN sp['text']
                       ELSE concat('<', sp['kind'], ':', sp['media_ref'], '>') END,
                  '' ORDER BY sp['offset']) AS doc_restored
FROM s GROUP BY doc_id
"""


def q_cell_compact(spark, sf_dir):
    """H3-style compact: occupied res-4 tiles -> minimal mixed-resolution
    cover (complete 4-sibling groups fuse into parents, recursively).
    Linear fixed-level plan, one sibling-group window per level."""
    from .spatial.compact import compact_cells

    df = flat_spans(spark, sf_dir).select(
        F.expr(grid.cell_sql("lon", "lat", COARSE_RES, "spark")).alias("cell")
    )
    return compact_cells(df, COARSE_RES, 1)


def _o_cell_compact() -> str:
    from .spatial.compact import compact_oracle_sql

    cells = (
        f"SELECT DISTINCT {grid.cell_sql('lon', 'lat', COARSE_RES, 'duck')} AS cell "
        f"FROM ({O_SPANS_FLAT})"
    )
    return compact_oracle_sql(cells, COARSE_RES, 1)


O_CELL_COMPACT = _o_cell_compact()


def q_cell_uncompact(spark, sf_dir):
    """Roundtrip proof: uncompact(compact(S)) must equal S exactly — the
    oracle is simply the ORIGINAL distinct res-4 cell set, so both ops are
    verified end-to-end against an independent formula."""
    from .spatial.compact import compact_cells, uncompact_cells

    df = flat_spans(spark, sf_dir).select(
        F.expr(grid.cell_sql("lon", "lat", COARSE_RES, "spark")).alias("cell")
    )
    return uncompact_cells(compact_cells(df, COARSE_RES, 1), COARSE_RES)


O_CELL_UNCOMPACT = (
    f"SELECT DISTINCT {grid.cell_sql('lon', 'lat', COARSE_RES, 'duck')} AS cell "
    f"FROM ({O_SPANS_FLAT})"
)


def q_cover_lookup(spark, sf_dir):
    """Adaptive-resolution tile aggregate: points bucketed into a COMPACTED
    mixed-resolution cover (H3 polyfill→compact→lookup).  Each point joins
    via its ancestor chain (constant 4-way explode) against the cover on a
    single key — the cover is perimeter-bounded by construction, hence
    broadcast-safe at any data scale; exactly one ancestor matches because
    the compacted cover partitions the occupied set."""
    from .spatial.compact import compact_cells

    pts = flat_spans(spark, sf_dir).select(
        F.expr(grid.cell_sql("lon", "lat", COARSE_RES, "spark")).alias("cell4"), "w"
    )
    cover = compact_cells(pts.select(F.col("cell4").alias("cell")), COARSE_RES, 1)
    anc = pts.select(
        "w",
        F.explode(
            F.array(
                *[
                    F.expr(grid.parent_sql("cell4", COARSE_RES, r, "spark"))
                    for r in range(1, COARSE_RES + 1)
                ]
            )
        ).alias("cand"),
    )
    j = anc.join(F.broadcast(cover), anc.cand == cover.cell)
    return j.groupBy("cell", "res").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("w_sumw")
    )


def _o_cover_lookup() -> str:
    from .spatial.compact import compact_oracle_sql

    cells = (
        f"SELECT DISTINCT {grid.cell_sql('lon', 'lat', COARSE_RES, 'duck')} AS cell "
        f"FROM ({O_SPANS_FLAT})"
    )
    cover = compact_oracle_sql(cells, COARSE_RES, 1)
    c4 = grid.cell_sql("lon", "lat", COARSE_RES, "duck")
    parents = ", ".join(
        grid.parent_sql("cell4", COARSE_RES, r, "duck") for r in range(1, COARSE_RES + 1)
    )
    return f"""
WITH cover AS ({cover}),
pts AS (SELECT {c4} AS cell4, w FROM ({O_SPANS_FLAT})),
anc AS (SELECT unnest([{parents}]) AS cand, w FROM pts)
SELECT c.cell AS cell, c.res AS res, count(*) AS n, sum(w) AS w_sumw
FROM anc JOIN cover c ON anc.cand = c.cell
GROUP BY 1, 2
"""


O_COVER_LOOKUP = _o_cover_lookup()


def q_trajectory_cells(spark, sf_dir):
    """Per-user trajectory → traversed-cell histogram (polyline cover):
    lag-window segments, 8-point lerp sampling, grid encode."""
    from .spatial.trajectory import trajectory_cells_sql

    _load_events(spark, sf_dir)
    return spark.sql(trajectory_cells_sql("spark", REGION_RES))


def _o_trajectory_cells() -> str:
    from .spatial.trajectory import trajectory_cells_sql

    return trajectory_cells_sql("duck", REGION_RES)


O_TRAJECTORY_CELLS = _o_trajectory_cells()


def q_trajectory_interp(spark, sf_dir):
    """Fixed-rate trajectory resampling: lerp each user's path at regular
    6-hour instants — ticks are EMITTED per segment (map-side sequence
    explode), never range-joined against a grid table; one user_id window
    shuffle total."""
    from .spatial.trajectory import trajectory_interp_sql

    _load_events(spark, sf_dir)
    return spark.sql(trajectory_interp_sql("spark", REGION_RES))


def _o_trajectory_interp() -> str:
    from .spatial.trajectory import trajectory_interp_sql

    return trajectory_interp_sql("duck", REGION_RES)


O_TRAJECTORY_INTERP = _o_trajectory_interp()


def q_trajectory_simplify(spark, sf_dir):
    """Single-pass polyline simplification (perpendicular-offset filter,
    the streaming cousin of Douglas–Peucker): keep endpoints + points
    whose offset from the prev→next chord is >= eps; the keep test is
    cross² >= eps²·|chord|² — multiplication-only, bit-exact across
    engines."""
    from .spatial.trajectory import trajectory_simplify_sql

    _load_events(spark, sf_dir)
    return spark.sql(trajectory_simplify_sql("spark"))


def _o_trajectory_simplify() -> str:
    from .spatial.trajectory import trajectory_simplify_sql

    return trajectory_simplify_sql("duck")


O_TRAJECTORY_SIMPLIFY = _o_trajectory_simplify()


def q_trajectory_bearing(spark, sf_dir):
    """Per-tile movement-direction rose: consecutive-segment compass
    octants via pure sign/magnitude comparisons (no atan2 — trig is not
    correctly rounded across engines), aggregated per origin cell."""
    from .spatial.trajectory import trajectory_bearing_sql

    _load_events(spark, sf_dir)
    return spark.sql(trajectory_bearing_sql("spark"))


def _o_trajectory_bearing() -> str:
    from .spatial.trajectory import trajectory_bearing_sql

    return trajectory_bearing_sql("duck")


O_TRAJECTORY_BEARING = _o_trajectory_bearing()


def q_tile_clip(spark, sf_dir):
    """Vector-tile geometry cut: Liang–Barsky clip of every trajectory
    segment into per-tile pieces.  Column-DDA explode — work proportional
    to tiles TOUCHED (O(w+h) per segment), never the bbox area (O(w*h));
    one user_id window shuffle, everything after is map-side."""
    from .spatial.vectortile import tile_clip_sql

    _load_events(spark, sf_dir)
    return spark.sql(tile_clip_sql("spark"))


def _o_tile_clip() -> str:
    from .spatial.vectortile import tile_clip_sql

    return tile_clip_sql("duck")


O_TILE_CLIP = _o_tile_clip()


def q_tile_contour(spark, sf_dir):
    """Raster→vector iso-contour extraction: marching-squares case index
    per 2x2 tile block of the above-global-mean density region (mean =
    one exact integer sum / one division — scale-free and bit-exact)."""
    from .spatial.vectortile import tile_contour_sql

    load_documents(spark, sf_dir)
    return spark.sql(tile_contour_sql(synth.flat_spans_sql("spark"), "spark"))


def _o_tile_contour() -> str:
    from .spatial.vectortile import tile_contour_sql

    return tile_contour_sql(synth.flat_spans_sql("duck"), "duck")


O_TILE_CONTOUR = _o_tile_contour()


def q_tile_morph(spark, sf_dir):
    """Morphological opening (erode→dilate, 3×3) of the dense-cell mask —
    raster denoising; two constant map-side explodes, all aggregates
    bounded by grid cardinality."""
    from .spatial.vectortile import tile_morph_sql

    load_documents(spark, sf_dir)
    return spark.sql(tile_morph_sql(synth.flat_spans_sql("spark"), "spark"))


def _o_tile_morph() -> str:
    from .spatial.vectortile import tile_morph_sql

    return tile_morph_sql(synth.flat_spans_sql("duck"), "duck")


O_TILE_MORPH = _o_tile_morph()


def q_layout_compare(spark, sf_dir):
    """Hilbert-vs-Morton layout A/B: per res-3 quadrant window, the number
    of range-partitioned files each curve order forces open — the measured
    justification for the snapshot partitioner's Hilbert choice (fewer
    files touched per window = cheaper manifest-pruned scans at 100 TB)."""
    from .spatial.layout import layout_compare_sql

    load_documents(spark, sf_dir)
    return spark.sql(layout_compare_sql(synth.flat_spans_sql("spark"), "spark"))


def _o_layout_compare() -> str:
    from .spatial.layout import layout_compare_sql

    return layout_compare_sql(synth.flat_spans_sql("duck"), "duck")


O_LAYOUT_COMPARE = _o_layout_compare()


def q_cotravel(spark, sf_dir):
    """Co-travel pairs: users sharing >= 3 distinct (cell, 6h-bucket) bins.
    The quadratic step is keyed on the bounded bin (bucketed self-join,
    never all-pairs); a deterministic per-bin cap bounds hot-bin fan-out."""
    from .spatial.trajectory import cotravel_sql

    _load_events(spark, sf_dir)
    return spark.sql(cotravel_sql("spark"))


def _o_cotravel() -> str:
    from .spatial.trajectory import cotravel_sql

    return cotravel_sql("duck")


O_COTRAVEL = _o_cotravel()


def q_trajectory_od(spark, sf_dir):
    """Origin–destination matrix over user trajectories: first-event cell →
    last-event cell per user, user and event-volume counts per OD pair.
    One user_id window shuffle; endpoint pivot rides the same key."""
    from .spatial.trajectory import trajectory_od_sql

    _load_events(spark, sf_dir)
    return spark.sql(trajectory_od_sql("spark", REGION_RES))


def _o_trajectory_od() -> str:
    from .spatial.trajectory import trajectory_od_sql

    return trajectory_od_sql("duck", REGION_RES)


O_TRAJECTORY_OD = _o_trajectory_od()


def q_tile_flow(spark, sf_dir):
    """Per-segment flow matrix: every consecutive span pair in a document
    contributes one (from_cell → to_cell) movement edge at REGION_RES —
    the flow-map operator (trajectory_od's endpoint matrix, refined to
    per-hop flux; self-loops = within-cell movement kept).  One doc_id
    window shuffle + a flow-cardinality aggregate."""
    from pyspark.sql import Window as W

    pts = flat_spans(spark, sf_dir).withColumn(
        "cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark"))
    )
    w = W.partitionBy("doc_id").orderBy("span_idx")
    return (
        pts.withColumn("prev_cell", F.lag("cell").over(w))
        .filter(F.col("prev_cell").isNotNull())
        .groupBy(
            F.col("prev_cell").alias("from_cell"), F.col("cell").alias("to_cell")
        )
        .agg(F.count(F.lit(1)).alias("n_moves"))
    )


O_TILE_FLOW = f"""
WITH pts AS (
  SELECT doc_id, span_idx, {grid.cell_sql('lon', 'lat', REGION_RES, 'duck')} AS cell
  FROM ({O_SPANS_FLAT})
),
seg AS (
  SELECT cell, lag(cell) OVER (PARTITION BY doc_id ORDER BY span_idx) AS prev_cell
  FROM pts
)
SELECT prev_cell AS from_cell, cell AS to_cell, count(*) AS n_moves
FROM seg WHERE prev_cell IS NOT NULL
GROUP BY 1, 2
"""


def q_kind_transitions(spark, sf_dir):
    """Span-kind Markov transition counts within documents (text→image→
    table chains of the interleaved format): lag window on span order,
    transition-matrix aggregate — the modality-structure profile of an
    interleaved corpus."""
    from pyspark.sql import Window as W

    df = flat_spans(spark, sf_dir).select("doc_id", "span_idx", "kind")
    w = W.partitionBy("doc_id").orderBy("span_idx")
    return (
        df.withColumn("prev_kind", F.lag("kind").over(w))
        .filter(F.col("prev_kind").isNotNull())
        .groupBy(F.col("prev_kind").alias("from_kind"), F.col("kind").alias("to_kind"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


O_KIND_TRANSITIONS = f"""
WITH s AS (
  SELECT kind, lag(kind) OVER (PARTITION BY doc_id ORDER BY span_idx) AS prev_kind
  FROM ({O_SPANS_FLAT})
)
SELECT prev_kind AS from_kind, kind AS to_kind, count(*) AS n
FROM s WHERE prev_kind IS NOT NULL
GROUP BY 1, 2
"""


def q_trajectory_length(spark, sf_dir):
    """Per-user planar path length / displacement / wander ratio — the
    order-sensitive float aggregate done deterministically (sort_array +
    pinned left fold; sqrt is correctly-rounded IEEE, so raw doubles are
    hash-safe — see trajectory_length_sql)."""
    from .spatial.trajectory import trajectory_length_sql

    _load_events(spark, sf_dir)
    return spark.sql(trajectory_length_sql("spark"))


def _o_trajectory_length() -> str:
    from .spatial.trajectory import trajectory_length_sql

    return trajectory_length_sql("duck")


O_TRAJECTORY_LENGTH = _o_trajectory_length()


def q_trajectory_hull(spark, sf_dir):
    """Per-user convex hull of the event point cloud: canonical CCW vertex
    cycle + exact BIGINT shoelace area, computed TWO-LEVEL — map-side local
    hulls per partition (convexity is associative), so the one user_id
    shuffle carries only O(hull) candidate vertices per user per partition,
    never the raw points (hot-user skew dies map-side).  Oracle = an
    independent gift-wrapping recursive CTE."""
    from .spatial import hull as _hull

    _load_events(spark, sf_dir)
    pts = spark.sql(_hull.event_points_sql("spark"))
    return _hull.convex_hull(pts, group="user_id")


def _o_trajectory_hull() -> str:
    from .spatial import hull as _hull

    return _hull.jarvis_oracle_sql(_hull.event_points_sql("duck"))


def q_trajectory_diameter(spark, sf_dir):
    """Per-user point-set diameter (farthest pair, exact integer d2): the
    diameter of a set equals the diameter of its hull VERTICES, so the pair
    search runs on the two-level hull's ~h rows per user (h ~ log n), not
    the raw points — an O(h^2)-per-user self-join on a table already
    reduced map-side.  Canonical tie-break: lexicographically smallest
    (ax, ay, bx, by) among maxima.  Oracle = brute-force quadratic max over
    ALL distinct points, so the hull reduction itself is what's checked."""
    from .spatial import hull as _hull

    _load_events(spark, sf_dir)
    pts = spark.sql(_hull.event_points_sql("spark"))
    verts = _hull.convex_hull(pts, group="user_id").select("user_id", "seq", "x", "y")
    a = verts.select("user_id", F.col("seq").alias("sa"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = verts.select("user_id", F.col("seq").alias("sb"), F.col("x").alias("bx"), F.col("y").alias("by"))
    pairs = (
        a.join(b, "user_id")
        .filter("(ax, ay) < (bx, by)")
        .select(
            "user_id", "ax", "ay", "bx", "by",
            F.expr(
                "(bx - ax) * (bx - ax) + (by - ay) * (by - ay)"
            ).alias("d2"),
        )
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(
            F.desc("d2"), "ax", "ay", "bx", "by"
        )
    )
    return pairs.withColumn("_rn", rn).filter("_rn = 1").drop("_rn")


def _o_trajectory_diameter() -> str:
    from .spatial import hull as _hull

    return f"""
WITH pts AS ({_hull.event_points_sql('duck')}),
pairs AS (
  SELECT a.user_id, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by,
         (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) AS d2
  FROM pts a JOIN pts b
    ON a.user_id = b.user_id AND (a.x, a.y) < (b.x, b.y)
)
SELECT user_id, ax, ay, bx, by, d2 FROM pairs
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY d2 DESC, ax, ay, bx, by
) = 1
"""


def _mean_center_sql(dialect: str) -> str:
    """Per-user mean center + standard distance over the event point
    cloud — the first-moment descriptive spatial statistics (centrography)
    alongside the Moran/LISA second-moment family.  All accumulations are
    exact BIGINT (coordinate sums, squared-coordinate sums: x < 3.6e5 so
    x^2 < 1.3e11 and 10^7 points stay under 2^63); the only float ops are
    the final divisions and one sqrt — identical expression text both
    engines, so correctly-rounded IEEE doubles match exactly."""
    from .spatial import hull as _hull

    pts = _hull.event_points_sql(dialect)
    return f"""
WITH pts AS ({pts}),
acc AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
  FROM pts GROUP BY user_id
)
SELECT user_id, n,
       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS cx,
       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cy,
       sqrt(
         (CAST(sxx AS DOUBLE) + CAST(syy AS DOUBLE)) / CAST(n AS DOUBLE)
         - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
       ) AS std_dist
FROM acc
"""


def q_mean_center(spark, sf_dir):
    """Centrography: per-user mean center + standard distance (the
    dispersion radius).  One partial-agg'd shuffle on user_id; BIGINT
    moment sums are order-insensitive, so the result is exact under any
    partitioning."""
    _load_events(spark, sf_dir)
    return spark.sql(_mean_center_sql("spark"))


def _cell_quadkey_sql(dialect: str) -> str:
    """Occupied-cell quadkey table: the tile-server addressing view of the
    grid (one base-4 digit per zoom level, MSB-first).  The parent's
    quadkey is the child's minus its last character — prefix matching IS
    hierarchy traversal, which is why tile CDNs key on it; emitted for
    both levels so the oracle checks the contract, and the decode
    roundtrip is pinned in tests/test_grid.py."""
    cell = grid.cell_sql("lon", "lat", REGION_RES, dialect)
    parent = grid.parent_sql("cell", REGION_RES, REGION_RES - 2, dialect)
    qk = grid.quadkey_sql("cell", REGION_RES, dialect)
    qk_par = grid.quadkey_sql("parent_cell", REGION_RES - 2, dialect)
    return f"""
WITH cells AS (
  SELECT {cell} AS cell FROM ({{spans}})
),
agg AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY cell
),
lab AS (
  SELECT cell, n, {parent} AS parent_cell FROM agg
)
SELECT cell, n, {qk} AS qk, {qk_par} AS qk_parent
FROM lab
""".replace("{spans}", synth.flat_spans_sql(dialect))


def q_cell_quadkey(spark, sf_dir):
    """Quadkey addressing of the occupied grid (Bing-tile serving keys):
    map-side string codec after one bounded cell aggregate; the
    parent-prefix contract rides in the output."""
    load_documents(spark, sf_dir)
    return spark.sql(_cell_quadkey_sql("spark"))


def _tile_trend_sql(dialect: str) -> str:
    """Emerging-hotspot trend: Mann–Kendall S statistic per coarse cell
    over 5-day event-count bins — S = sum over bin pairs (i < j) of
    sign(n_j − n_i), pure integer arithmetic so the statistic is exact and
    order-insensitive across engines.  Bins are DENSIFIED with zeros
    (absence of events IS a low count; trend on observed-only bins would
    miss die-offs) via the grid×bins cross — the pinned bounded-densify
    class, cardinality cells × bins, never data-sized.  The pair join runs
    per cell on the bounded dense table (T^2 pairs per cell, T ~ 6)."""
    from .spatial.trajectory import _coords_sql

    lon, lat = _coords_sql()
    cell = grid.cell_sql("lon", "lat", COARSE_RES, dialect)
    if dialect == "spark":
        us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    else:
        us = "epoch_us(ts)"
    tb = grid._idiv(us, str(432_000 * 1_000_000), dialect)  # 5-day bins
    if dialect == "spark":
        # Spark formulation: per-cell bin MAP + one 1-row global bins
        # attach, zero-densify and pair-fold MAP-SIDE over the bounded
        # array (T ~ 6 bins).  A dense self-join would duplicate the
        # densify cross under CTE inlining (2 BNLJs + 4 corpus scans);
        # this shape is ONE corpus aggregate + one allowed 1-row attach.
        # The DuckDB oracle keeps the independent pair-join formulation.
        sgn = (
            "CASE WHEN element_at(ns, j + 1) > element_at(ns, i + 1) THEN 1 "
            "WHEN element_at(ns, j + 1) < element_at(ns, i + 1) THEN -1 ELSE 0 END"
        )
        pair_fold = (
            f"aggregate(sequence(0, size(ns) - 2), CAST(0 AS BIGINT), (acc, i) -> "
            f"acc + aggregate(sequence(i + 1, size(ns) - 1), CAST(0 AS BIGINT), "
            f"(a2, j) -> a2 + {sgn}))"
        )
        return f"""
WITH ev AS (
  SELECT {cell} AS cell, {tb} AS tb
  FROM (SELECT *, {lon} AS lon, {lat} AS lat FROM events)
),
cb0 AS (SELECT cell, tb, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1, 2),
bins AS (SELECT array_sort(collect_set(tb)) AS bs FROM cb0),
cellmaps AS (
  SELECT cell, map_from_entries(collect_list(struct(tb, n))) AS m FROM cb0
  GROUP BY cell
),
dense AS (
  SELECT cell,
         transform(bs, b -> coalesce(element_at(m, b), CAST(0 AS BIGINT))) AS ns
  FROM cellmaps CROSS JOIN bins
),
scored AS (
  SELECT cell,
         CASE WHEN size(ns) < 2 THEN CAST(0 AS BIGINT) ELSE {pair_fold} END AS s_stat,
         CAST(size(ns) * (size(ns) - 1) DIV 2 AS BIGINT) AS n_pairs
  FROM dense
)
SELECT cell, s_stat, n_pairs,
       CASE WHEN s_stat > 0 THEN 'rising'
            WHEN s_stat < 0 THEN 'falling' ELSE 'flat' END AS trend
FROM scored
"""
    return f"""
WITH ev AS (
  SELECT {cell} AS cell, {tb} AS tb
  FROM (SELECT *, {lon} AS lon, {lat} AS lat FROM events)
),
cb0 AS (SELECT cell, tb, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1, 2),
cells AS (SELECT DISTINCT cell FROM cb0),
bins AS (SELECT DISTINCT tb FROM cb0),
dense AS (
  SELECT c.cell, b.tb, coalesce(cb0.n, CAST(0 AS BIGINT)) AS n
  FROM cells c CROSS JOIN bins b
  LEFT JOIN cb0 ON cb0.cell = c.cell AND cb0.tb = b.tb
),
pairs AS (
  SELECT a.cell,
         CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sgn
  FROM dense a JOIN dense b ON a.cell = b.cell AND a.tb < b.tb
)
SELECT cell, CAST(sum(sgn) AS BIGINT) AS s_stat,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CASE WHEN sum(sgn) > 0 THEN 'rising'
            WHEN sum(sgn) < 0 THEN 'falling' ELSE 'flat' END AS trend
FROM pairs GROUP BY cell
"""


def q_tile_trend(spark, sf_dir):
    """Emerging-hotspot analysis: per-cell Mann–Kendall trend of event
    volume over time bins (the temporal sibling of tile_hotspot's static
    Getis-Ord)."""
    _load_events(spark, sf_dir)
    return spark.sql(_tile_trend_sql("spark"))


def _tile_decay_sql(dialect: str) -> str:
    """Time-decayed tile heat with a 5-day half-life, EXACT: the decay
    weight is 2^(-age_bins) — a dyadic rational — summed in 1/2^20
    fixed-point BIGINT (ages clamped at 21 half-lives, where the shifted
    weight 1048576 >> 21 is exactly 0 — events past the horizon truly
    stop contributing, no permanent floor), so the decayed score is
    bit-identical
    across engines and partitionings; no float enters until never.
    The freshness operator every 'current hotness' map needs, in the
    same one-aggregate shape as tile_agg."""
    from .spatial.trajectory import _coords_sql

    lon, lat = _coords_sql()
    cell = grid.cell_sql("lon", "lat", COARSE_RES, dialect)
    if dialect == "spark":
        us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        shiftr = "shiftright(1048576, CAST(age AS INT))"
    else:
        us = "epoch_us(ts)"
        shiftr = "(1048576 >> CAST(age AS INT))"
    tb = grid._idiv(us, str(432_000 * 1_000_000), dialect)
    return f"""
WITH ev AS (
  SELECT {cell} AS cell, {tb} AS tb
  FROM (SELECT *, {lon} AS lon, {lat} AS lat FROM events)
),
mx AS (SELECT max(tb) AS now_tb FROM ev),
aged AS (
  SELECT cell, LEAST(now_tb - tb, 21) AS age FROM ev, mx
)
SELECT cell,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({shiftr}) AS BIGINT) AS heat_fp20
FROM aged GROUP BY cell
"""


def _tile_changepoint_sql(dialect: str) -> str:
    """Changepoint location per coarse cell over 5-day bins by exact
    integer CUSUM: with T bins and total N, the statistic at bin t is
    S_t = T * prefix_t − t * N (the mean-centered prefix sum scaled by T,
    so it stays BIGINT — no division); the changepoint is the bin
    maximizing |S_t| with deterministic ties (earliest bin).  Densified
    zeros ride the same (cell, bin) aggregate as tile_trend; the window
    prefix runs on one cell-keyed shuffle."""
    from .spatial.trajectory import _coords_sql

    lon, lat = _coords_sql()
    cell = grid.cell_sql("lon", "lat", COARSE_RES, dialect)
    if dialect == "spark":
        us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    else:
        us = "epoch_us(ts)"
    tb = grid._idiv(us, str(432_000 * 1_000_000), dialect)
    return f"""
WITH ev AS (
  SELECT {cell} AS cell, {tb} AS tb
  FROM (SELECT *, {lon} AS lon, {lat} AS lat FROM events)
),
cb0 AS (SELECT cell, tb, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1, 2),
cells AS (SELECT DISTINCT cell FROM cb0),
bins AS (SELECT DISTINCT tb FROM cb0),
dense AS (
  SELECT c.cell, b.tb, coalesce(cb0.n, CAST(0 AS BIGINT)) AS n
  FROM cells c CROSS JOIN bins b
  LEFT JOIN cb0 ON cb0.cell = c.cell AND cb0.tb = b.tb
),
pre AS (
  SELECT cell, tb, n,
         sum(n) OVER (PARTITION BY cell ORDER BY tb) AS pf,
         sum(n) OVER (PARTITION BY cell) AS total,
         count(*) OVER (PARTITION BY cell) AS t_bins,
         row_number() OVER (PARTITION BY cell ORDER BY tb) AS t
  FROM dense
),
scored AS (
  SELECT cell, tb,
         CAST(t_bins * pf - t * total AS BIGINT) AS s_t
  FROM pre WHERE t < t_bins
)
SELECT cell, tb AS change_tb, s_t,
       CASE WHEN s_t > 0 THEN 'drop_after' WHEN s_t < 0 THEN 'rise_after'
            ELSE 'none' END AS direction
FROM (
  SELECT cell, tb, s_t,
         row_number() OVER (
           PARTITION BY cell ORDER BY abs(s_t) DESC, tb ASC
         ) AS rk
  FROM scored
) WHERE rk = 1
"""


def q_tile_changepoint(spark, sf_dir):
    """Per-cell changepoint (exact integer CUSUM argmax) — where a cell's
    event rate shifted, the siblings of tile_trend's monotone test."""
    _load_events(spark, sf_dir)
    return spark.sql(_tile_changepoint_sql("spark"))


def q_tile_decay(spark, sf_dir):
    """Half-life-decayed tile heat: dyadic 2^-age weights summed in exact
    fixed point — deterministic 'current hotness' with zero float ops."""
    _load_events(spark, sf_dir)
    return spark.sql(_tile_decay_sql("spark"))


def _layer_corr_sql(dialect: str) -> str:
    """Cross-layer density correlation: Pearson r between the document-
    span layer and the event layer on the shared coarse grid, zero-filled
    on either side's empty cells (absence is signal).  Every moment sum is
    exact BIGINT; the only float is the single final r expression (shared
    text, deterministic IEEE).  The 'do people go where the content is'
    statistic — one bounded aggregate per layer + a grid-sized outer
    join."""
    from .spatial.trajectory import _coords_sql

    span_cell = grid.cell_sql("lon", "lat", COARSE_RES, dialect)
    elon, elat = _coords_sql()
    ev_cell = grid.cell_sql("lon", "lat", COARSE_RES, dialect)
    fs = synth.flat_spans_sql(dialect)
    return f"""
WITH a AS (
  SELECT {span_cell} AS cell, CAST(count(*) AS BIGINT) AS a FROM ({fs}) GROUP BY 1
),
b AS (
  SELECT {ev_cell} AS cell, CAST(count(*) AS BIGINT) AS b
  FROM (SELECT *, {elon} AS lon, {elat} AS lat FROM events) GROUP BY 1
),
j AS (
  SELECT coalesce(a.a, 0) AS av, coalesce(b.b, 0) AS bv
  FROM a FULL OUTER JOIN b ON a.cell = b.cell
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(av) AS BIGINT) AS sa, CAST(sum(bv) AS BIGINT) AS sb,
         CAST(sum(av * av) AS BIGINT) AS saa,
         CAST(sum(bv * bv) AS BIGINT) AS sbb,
         CAST(sum(av * bv) AS BIGINT) AS sab
  FROM j
)
SELECT n, sa, sb, saa, sbb, sab,
       (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
       / sqrt(
           (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
            - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
              - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
         ) AS pearson_r
FROM s
"""


def q_layer_corr(spark, sf_dir):
    """Pearson correlation between the content-density and event-activity
    layers on the shared grid (exact BIGINT moments, one final double)."""
    load_documents(spark, sf_dir)
    _load_events(spark, sf_dir)
    return spark.sql(_layer_corr_sql("spark"))


def _tile_gini_sql(dialect: str) -> str:
    """Spatial concentration of event activity: the Gini coefficient of
    per-cell counts over occupied cells — num = 2*sum(i*x_(i)) - (n+1)*sum(x)
    and den = n*sum(x) are exact BIGINT from one rank window over the
    sorted cells.  Ties cannot perturb the sums: a block of equal x
    occupies a fixed SET of ranks whatever its internal order, and the
    rank-weighted sum over that block depends only on the set — the cell
    tie-break just makes the per-row sequence a deterministic total
    order too.  The coefficient is one final division.  'Is activity a
    few hotspots or spread thin' — the inequality statistic area
    planners read."""
    from .spatial.trajectory import _coords_sql

    lon, lat = _coords_sql()
    cell = grid.cell_sql("lon", "lat", COARSE_RES, dialect)
    return f"""
WITH cb AS (
  SELECT {cell} AS cell, CAST(count(*) AS BIGINT) AS x
  FROM (SELECT *, {lon} AS lon, {lat} AS lat FROM events) GROUP BY 1
),
rk AS (
  SELECT x, CAST(row_number() OVER (ORDER BY x, cell) AS BIGINT) AS i FROM cb
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(i * x) AS BIGINT) AS six
  FROM rk
)
SELECT n, sx,
       CAST(2 * six - (n + 1) * sx AS BIGINT) AS num,
       CAST(n * sx AS BIGINT) AS den,
       CAST(2 * six - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE) AS gini
FROM s
"""


def _tile_pareto_sql(dialect: str) -> str:
    """Pareto coverage of activity: how many cells (densest first) cover
    80% of all events, and what share the top 10 cells hold — the
    operational twin of tile_gini (capacity planning reads 'k cells for
    80%', not a coefficient).  One rank window over the bounded cell
    aggregate; thresholds compared in exact cross-multiplied integers
    (cum*5 >= total*4 ⇔ cum >= 0.8·total), shares in basis points."""
    from .spatial.trajectory import _coords_sql

    lon, lat = _coords_sql()
    cell = grid.cell_sql("lon", "lat", COARSE_RES, dialect)
    idiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH cb AS (
  SELECT {cell} AS cell, CAST(count(*) AS BIGINT) AS x
  FROM (SELECT *, {lon} AS lon, {lat} AS lat FROM events) GROUP BY 1
),
rk AS (
  SELECT x,
         CAST(row_number() OVER (ORDER BY x DESC, cell) AS BIGINT) AS i,
         CAST(sum(x) OVER (ORDER BY x DESC, cell) AS BIGINT) AS cum
  FROM cb
),
tot AS (SELECT CAST(sum(x) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_cells FROM cb)
SELECT t.n_cells, t.total,
       CAST(min(CASE WHEN r.cum * 5 >= t.total * 4 THEN r.i END) AS BIGINT)
         AS cells_for_80pct,
       CAST(max(CASE WHEN r.i <= 10 THEN r.cum END) * 10000 {idiv} t.total
            AS BIGINT) AS top10_share_bp
FROM rk r, tot t
GROUP BY 1, 2
"""


def q_tile_pareto(spark, sf_dir):
    """Cells-for-80% and top-10 share of event activity (exact integer
    thresholds; the capacity-planning view of spatial concentration)."""
    _load_events(spark, sf_dir)
    return spark.sql(_tile_pareto_sql("spark"))


def q_tile_gini(spark, sf_dir):
    """Gini concentration of event counts across occupied cells (exact
    integer numerator/denominator, one final division)."""
    _load_events(spark, sf_dir)
    return spark.sql(_tile_gini_sql("spark"))


def q_tile_rollup(spark, sf_dir):
    """Zoom-out re-aggregation: tile level 8 -> 4 via parent cells — the
    hypertable-rollup analogue (grouping-set rollup over the hierarchy)."""
    tiles = q_tile_agg(spark, sf_dir)
    return (
        tiles.withColumn("cell4", F.expr(grid.parent_sql("cell", TILE_RES, COARSE_RES, "spark")))
        .groupBy("cell4")
        .agg(
            F.sum("n").alias("n"),
            F.sum("w_sumw").alias("w_sumw"),
            F.sum("w_sumw2").alias("w_sumw2"),
        )
    )


O_TILE_ROLLUP = f"""
SELECT {grid.parent_sql('cell', TILE_RES, COARSE_RES, 'duck')} AS cell4,
       CAST(sum(n) AS BIGINT) AS n, sum(w_sumw) AS w_sumw, sum(w_sumw2) AS w_sumw2
FROM ({O_TILE_AGG})
GROUP BY 1
"""


def _cell_bounds_sql(dialect: str) -> str:
    """(cell) -> west/south/east/north of the cell rectangle, pure integer
    + double arithmetic on the packed id (H3 cell_to_boundary analogue)."""
    n = 1 << TILE_RES
    x = grid.unpack_x_sql("cell", dialect)
    y = grid.unpack_y_sql("cell", dialect)
    return (
        f"CAST({x} AS DOUBLE) / {float(n)!r} * 360.0 - 180.0 AS west, "
        f"CAST({y} AS DOUBLE) / {float(n)!r} * 180.0 - 90.0 AS south, "
        f"CAST(({x}) + 1 AS DOUBLE) / {float(n)!r} * 360.0 - 180.0 AS east, "
        f"CAST(({y}) + 1 AS DOUBLE) / {float(n)!r} * 180.0 - 90.0 AS north"
    )


def q_cell_bounds(spark, sf_dir):
    """Boundary rectangles of every occupied tile (the vector-tile export
    step: cell id -> geometry)."""
    tiles = q_tile_agg(spark, sf_dir).select("cell", "n")
    tiles.createOrReplaceTempView("_tiles_for_bounds")
    return spark.sql(
        f"SELECT cell, n, {_cell_bounds_sql('spark')} FROM _tiles_for_bounds"
    )


O_CELL_BOUNDS = f"""
SELECT cell, n, {_cell_bounds_sql('duck')} FROM ({O_TILE_AGG})
"""


def q_tile_quantiles(spark, sf_dir):
    """Per-tile exact quantiles of the span weight (median + p90): Spark's
    exact `percentile` and DuckDB's `quantile_cont` both linearly
    interpolate on the sorted values, so results are bit-identical."""
    spans = flat_spans(spark, sf_dir)
    return (
        spans.withColumn("cell", F.expr(grid.cell_sql("lon", "lat", TILE_RES, "spark")))
        .groupBy("cell")
        .agg(
            F.expr("percentile(w, 0.5)").alias("w_med"),
            F.expr("percentile(w, 0.9)").alias("w_p90"),
            F.count(F.lit(1)).alias("n"),
        )
    )


O_TILE_QUANTILES = f"""
SELECT {grid.cell_sql('lon', 'lat', TILE_RES, 'duck')} AS cell,
       quantile_cont(w, 0.5) AS w_med, quantile_cont(w, 0.9) AS w_p90,
       count(*) AS n
FROM ({O_SPANS_FLAT}) GROUP BY 1
"""


PYRAMID_KW = dict(res_max=TILE_RES, res_min=COARSE_RES, threshold=16)


def q_tile_pyramid(spark, sf_dir):
    """Adaptive quadtree pyramid: split cells while they hold > threshold
    points — variable-resolution tiling (dense regions fine, sparse coarse),
    each point covered by exactly one leaf."""
    from .spatial.pyramid import tile_pyramid

    return tile_pyramid(flat_spans(spark, sf_dir), **PYRAMID_KW)


def _pyramid_oracle():
    from .spatial.pyramid import tile_pyramid_oracle_sql

    return tile_pyramid_oracle_sql(O_SPANS_FLAT, **PYRAMID_KW)


O_TILE_PYRAMID = _pyramid_oracle()


# ---------------------------------------------------------------------------
# 3. Define (P1-P5) + jagged reductions (R1-R9)
# ---------------------------------------------------------------------------


def _load_events(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    df.createOrReplaceTempView("events")
    return df


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

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


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
    from .spatial.trajectory import _coords_sql

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
    from .spatial.trajectory import _coords_sql

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
    from .functions import sketch as _sketch

    for t in ["orders", "customer"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return _sketch.cms_join_size(spark)


def _o_join_size_cms() -> str:
    from .functions import sketch as _sketch

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
    from .spatial.trajectory import _coords_sql

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
    from .functions.interval import overlap_count

    sess = q_events_sessionize(spark, sf_dir).select(
        "user_id", "session_id", "sess_start_us", "sess_end_us"
    )
    return overlap_count(sess, bin_us=OVERLAP_BIN_US)


def _o_sessions_overlap() -> str:
    from .functions.interval import overlap_count_oracle_sql

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
        from .expressions import compile_expression

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
        from .expressions import compile_expression

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
        from .expressions import compile_expression

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


# ---------------------------------------------------------------------------
# 5. spatial join (cell cover + PIP refine), kNN, raster<->vector
# ---------------------------------------------------------------------------


def q_pip_join(spark, sf_dir):
    df = flat_spans(spark, sf_dir)
    stage = SpatialJoinStage(name="sj", polygons=synth.polygons())
    out = stage.apply(df)
    return out.select("doc_id", "span_offset", "poly_id", "region")


O_PIP_JOIN = pip_oracle_sql(
    O_SPANS_FLAT, synth.polygons_values_sql("duck"),
    point_keys="doc_id, span_offset", extra_poly_cols="region",
)


def q_pip_join_salted(spark, sf_dir):
    """Skew-stress twin of pip_join: the salted shuffle-join strategy on the
    same input (which deliberately contains hot clustered cells).  The salt
    column spreads each hot cover cell over ``nsalt`` shuffle keys so no
    single reducer owns a hot tile; result is identical to the broadcast
    plan, so it shares pip_join's oracle."""
    df = flat_spans(spark, sf_dir)
    stage = SpatialJoinStage(name="sj", polygons=synth.polygons(), strategy="salted")
    out = stage.apply(df)
    return out.select("doc_id", "span_offset", "poly_id", "region")


def q_pip_anti(spark, sf_dir):
    """Documents whose spans match NO polygon (anti-join complement)."""
    df = flat_spans(spark, sf_dir)
    stage = SpatialJoinStage(name="sj", polygons=synth.polygons())
    matched = stage.apply(df).select("doc_id").distinct()
    return df.select("doc_id").distinct().join(matched, "doc_id", "left_anti")


O_PIP_ANTI = f"""
SELECT DISTINCT doc_id FROM ({O_SPANS_FLAT})
WHERE doc_id NOT IN (SELECT doc_id FROM ({O_PIP_JOIN}))
"""


def q_pip_tile_agg(spark, sf_dir):
    """FLAGSHIP: spatial join -> per (region, tile) weighted aggregation.
    Pair weight = doc weight x polygon weight (exact binary fractions)."""
    df = flat_spans(spark, sf_dir)
    stage = SpatialJoinStage(name="sj", polygons=synth.polygons())
    joined = stage.apply(df).withColumn(
        "cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark"))
    ).withColumn("pw", F.col("w") * F.col("weight"))
    agg = BinnedDataframeStage(
        name="tiles", binning=[{"in": "region"}, {"in": "cell"}], weights={"pw": "pw"}
    )
    return agg.apply(joined)


O_PIP_TILE_AGG = f"""
WITH pairs AS (
  SELECT p.doc_id, p.span_offset, p.lon, p.lat, p.w, e.poly_id, e.region, e.weight
  FROM ({O_SPANS_FLAT}) p, (
    SELECT poly_id, region, weight,
           list_extract(ring_lon, i) AS x1, list_extract(ring_lat, i) AS y1,
           list_extract(ring_lon, 1 + i % len(ring_lon)) AS x2,
           list_extract(ring_lat, 1 + i % len(ring_lon)) AS y2
    FROM (SELECT *, unnest(range(1, len(ring_lon) + 1)) AS i FROM {synth.polygons_values_sql('duck')})
  ) e
  GROUP BY ALL
  HAVING SUM(CASE WHEN ((y1 > lat) != (y2 > lat))
                   AND (lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1)
             THEN 1 ELSE 0 END) % 2 = 1
)
SELECT region, {grid.cell_sql('lon', 'lat', REGION_RES, 'duck')} AS cell,
       count(*) AS n, sum(w * weight) AS pw_sumw,
       sum((w * weight) * (w * weight)) AS pw_sumw2
FROM pairs
GROUP BY 1, 2
"""


RADIUS_DEG = 12.0


def q_radius_join(spark, sf_dir):
    """Distance (DWithin) self-join: document pairs whose representative
    points lie within RADIUS_DEG planar degrees — cell-ring candidates +
    exact refine (includes the deliberately hot clustered docs)."""
    pts = flat_spans(spark, sf_dir).filter("span_idx = 0").select("doc_id", "lon", "lat")
    return radius_join(pts, radius=RADIUS_DEG)


O_RADIUS_JOIN = radius_join_oracle_sql(
    f"SELECT doc_id, lon, lat FROM ({O_SPANS_FLAT}) WHERE span_idx = 0",
    radius=RADIUS_DEG,
)


GEO_RADIUS_KM = 800.0


def q_radius_join_geo(spark, sf_dir):
    """Geodesic (haversine) DWithin self-join: pole-crossing disks span all
    longitudes and antimeridian neighbours wrap — the candidate ring
    handles both; verified margin to the threshold is ~0.2 km (trig ulp
    divergence between engines is ~1e-15 rel, so membership is stable)."""
    from .spatial.knn import radius_join_geo

    pts = flat_spans(spark, sf_dir).filter("span_idx = 0").select("doc_id", "lon", "lat")
    return radius_join_geo(pts, radius_km=GEO_RADIUS_KM)


def _geo_oracle():
    from .spatial.knn import radius_join_geo_oracle_sql

    return radius_join_geo_oracle_sql(
        f"SELECT doc_id, lon, lat FROM ({O_SPANS_FLAT}) WHERE span_idx = 0",
        radius_km=GEO_RADIUS_KM,
    )


O_RADIUS_JOIN_GEO = _geo_oracle()


def q_knn_geo(spark, sf_dir):
    """Geodesic bounded kNN: k nearest by great-circle distance within
    GEO_RADIUS_KM, rank-only output (trig-ulp-safe; see knn_geo)."""
    from .spatial.knn import knn_geo

    pts = flat_spans(spark, sf_dir).filter("span_idx = 0").select("doc_id", "lon", "lat")
    return knn_geo(pts, radius_km=GEO_RADIUS_KM, k=3)


def _knn_geo_oracle():
    from .spatial.knn import knn_geo_oracle_sql

    return knn_geo_oracle_sql(
        f"SELECT doc_id, lon, lat FROM ({O_SPANS_FLAT}) WHERE span_idx = 0",
        radius_km=GEO_RADIUS_KM,
        k=3,
    )


O_KNN_GEO = _knn_geo_oracle()


def q_poly_overlap(spark, sf_dir):
    """Polygon-polygon overlay self-join over the polygon layer: pairs
    whose rings intersect (vertex containment or proper edge crossing),
    via a longitude-band equi join + bbox prefilter + exact refine."""
    from .spatial.overlay import polygon_overlap_join

    return polygon_overlap_join(synth.polygons_df(spark))


def _poly_overlap_oracle():
    from .spatial.overlay import polygon_overlap_oracle_sql

    return polygon_overlap_oracle_sql(synth.polygons_values_sql("duck"))


O_POLY_OVERLAP = _poly_overlap_oracle()


def q_poly_metrics(spark, sf_dir):
    """Shoelace area / centroid / winding per polygon — map-side only;
    pinned-order left folds make the doubles bit-identical across engines
    (see spatial/geom.py)."""
    from .spatial.geom import polygon_metrics_sql

    synth.polygons_df(spark).createOrReplaceTempView("polygons_v")
    return spark.sql(polygon_metrics_sql("polygons_v", "spark"))


def _o_poly_metrics() -> str:
    from .spatial.geom import polygon_metrics_sql

    return polygon_metrics_sql(synth.polygons_values_sql("duck"), "duck")


O_POLY_METRICS = _o_poly_metrics()


def _donut_holes() -> list[tuple]:
    """Concentric hole ring per polygon (outer scaled 0.5 toward its
    vertex centroid) — computed ONCE in Python so both engines consume
    identical double literals."""
    holes = []
    for d in synth.polygons():
        xs, ys = d["ring_lon"], d["ring_lat"]
        cx, cy = sum(xs) / len(xs), sum(ys) / len(ys)
        holes.append(
            (
                d["poly_id"],
                [cx + 0.5 * (x - cx) for x in xs],
                [cy + 0.5 * (y - cy) for y in ys],
            )
        )
    return holes


def q_pip_holes(spark, sf_dir):
    """Polygon-with-holes containment (donut polygons): candidates from
    the OUTER-ring cell-cover join, then an anti-refine on the broadcast
    hole ring — inside = outer-parity AND NOT hole-parity (the even-odd
    rule decomposed so the hole test only touches outer-matched
    candidates).  Per-polygon count of span points in the annulus."""
    from .spatial.pip import pip_condition_sql

    from pyspark.sql import types as T

    df = flat_spans(spark, sf_dir)
    stage = SpatialJoinStage(name="holes", polygons=synth.polygons())
    cand = stage.apply(df)
    schema = T.StructType(
        [
            T.StructField("poly_id", T.StringType(), False),
            T.StructField("hole_lon", T.ArrayType(T.DoubleType(), False), False),
            T.StructField("hole_lat", T.ArrayType(T.DoubleType(), False), False),
        ]
    )
    holes = spark.createDataFrame(_donut_holes(), schema)
    inhole = pip_condition_sql("lon", "lat", "hole_lon", "hole_lat", "spark")
    return (
        cand.join(F.broadcast(holes), "poly_id")
        .filter(F.expr(f"NOT ({inhole})"))
        .groupBy("poly_id")
        .agg(F.count(F.lit(1)).alias("n_pts"))
    )


def _o_pip_holes() -> str:
    from .spatial.pip import pip_condition_sql

    pts = f"SELECT doc_id, span_offset, lon, lat FROM ({O_SPANS_FLAT})"
    outer = pip_oracle_sql(
        pts,
        synth.polygons_values_sql("duck"),
        point_keys="doc_id, span_offset, lon, lat",
    )
    rows = ",\n ".join(
        f"('{pid}', {synth._arr(hx, 'duck')}, {synth._arr(hy, 'duck')})"
        for pid, hx, hy in _donut_holes()
    )
    inhole = pip_condition_sql("lon", "lat", "hole_lon", "hole_lat", "duck")
    return f"""
WITH io AS ({outer}),
h AS (SELECT * FROM (VALUES {rows}) AS t(poly_id, hole_lon, hole_lat))
SELECT poly_id, count(*) AS n_pts
FROM io JOIN h USING (poly_id)
WHERE NOT ({inhole})
GROUP BY 1
"""


O_PIP_HOLES = _o_pip_holes()


DBSCAN_EPS, DBSCAN_MIN_PTS = 12.0, 4


def q_dbscan(spark, sf_dir):
    """Density-based clustering (DBSCAN) of document representative
    points: eps-pairs from the bounded cell-ring radius join, core test as
    a degree count, clusters as Pregel connected components over the
    core-core subgraph, borders tie-broken to the min core-neighbour
    label.  See spatial/cluster.py for the 100 TB decomposition."""
    from .spatial.cluster import dbscan

    pts = flat_spans(spark, sf_dir).filter("span_idx = 0").select("doc_id", "lon", "lat")
    return dbscan(pts, eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS)


def _dbscan_oracle():
    from .spatial.cluster import dbscan_oracle_sql

    return dbscan_oracle_sql(
        f"SELECT doc_id, lon, lat FROM ({O_SPANS_FLAT}) WHERE span_idx = 0",
        eps=DBSCAN_EPS,
        min_pts=DBSCAN_MIN_PTS,
    )


O_DBSCAN = _dbscan_oracle()


SEG_RADIUS = 6.0


def _event_segments_sql(dialect: str) -> str:
    """(user_id, seg_idx, ax, ay, bx, by) — consecutive event-point
    segments per user, shared text both engines."""
    from .spatial.trajectory import _coords_sql

    lon, lat = _coords_sql()
    return f"""
SELECT user_id, seg_idx, ax, ay, bx, by FROM (
  SELECT user_id,
         lag({lon}) OVER w AS ax, lag({lat}) OVER w AS ay,
         {lon} AS bx, {lat} AS by,
         row_number() OVER w - 2 AS seg_idx
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
) t WHERE ax IS NOT NULL
"""


def q_segment_join(spark, sf_dir):
    """Nearest-trajectory-segment join (the map-matching primitive): each
    doc representative point snaps to the closest event-trajectory SEGMENT
    within SEG_RADIUS planar degrees — exact point-to-segment distance,
    candidates from point-ring × segment-bbox-cover cell join
    (spatial/segment.py)."""
    from .spatial.segment import nearest_segment_join

    _load_events(spark, sf_dir)
    pts = flat_spans(spark, sf_dir).filter("span_idx = 0").select("doc_id", "lon", "lat")
    segs = spark.sql(_event_segments_sql("spark"))
    return nearest_segment_join(pts, segs, radius=SEG_RADIUS)


def _o_segment_join() -> str:
    from .spatial.segment import nearest_segment_oracle_sql

    return nearest_segment_oracle_sql(
        f"SELECT doc_id, lon, lat FROM ({O_SPANS_FLAT}) WHERE span_idx = 0",
        _event_segments_sql("duck"),
        radius=SEG_RADIUS,
    )


O_SEGMENT_JOIN = _o_segment_join()


def q_poly_regions(spark, sf_dir):
    """Merged-region labelling: connected components over the polygon
    overlay graph (polygons whose rings intersect belong to one region) —
    the dissolve/union precursor, third reuse of the shared Pregel loop."""
    from .functions.graph import connected_components
    from .spatial.overlay import polygon_overlap_join

    pairs = polygon_overlap_join(synth.polygons_df(spark)).select("poly_a", "poly_b")
    edges = pairs.selectExpr("poly_a AS src", "poly_b AS dst").union(
        pairs.selectExpr("poly_b AS src", "poly_a AS dst")
    )
    nodes = synth.polygons_df(spark).select(F.col("poly_id").alias("node"))
    return (
        connected_components(nodes, edges, node_col="node")
        .withColumnRenamed("node", "poly_id")
        .withColumnRenamed("cluster_id", "region_id")
    )


def _o_poly_regions() -> str:
    from .functions.graph import reach_cte_sql

    ov = O_POLY_OVERLAP.strip()
    cte = reach_cte_sql(
        f"SELECT poly_a AS src, poly_b AS dst FROM ({ov}) "
        f"UNION ALL SELECT poly_b, poly_a FROM ({ov})",
        f"SELECT poly_id AS node FROM {synth.polygons_values_sql('duck')}",
        "node",
    )
    return (
        f"WITH RECURSIVE {cte} "
        "SELECT node AS poly_id, cluster_id AS region_id FROM cl"
    )


O_POLY_REGIONS = _o_poly_regions()


KNN_RES, KNN_RING, KNN_K = 5, 1, 3


def q_knn(spark, sf_dir):
    """Bounded-ring kNN over doc representative points (first span)."""
    pts = flat_spans(spark, sf_dir).filter("span_idx = 0").select("doc_id", "lon", "lat")
    return knn_bounded(pts, res=KNN_RES, ring=KNN_RING, k=KNN_K)


O_KNN = knn_oracle_sql(
    f"SELECT doc_id, lon, lat FROM ({O_SPANS_FLAT}) WHERE span_idx = 0",
    res=KNN_RES, ring=KNN_RING, k=KNN_K,
)


def q_knn_mutual(spark, sf_dir):
    """Mutual-kNN graph clustering: an edge only where BOTH points rank
    each other in their top-k (the density-robust graph used for spectral
    / agglomerative pipelines), then Pregel components label the clusters.
    Mutuality = one self-join of the directed kNN edge set on the swapped
    key pair; the mutual set is symmetric by construction."""
    from .functions.graph import connected_components

    kn = q_knn(spark, sf_dir).select("doc_id", "neighbor_id").localCheckpoint()
    rev = kn.select(
        F.col("neighbor_id").alias("doc_id"), F.col("doc_id").alias("neighbor_id")
    )
    mutual = kn.join(rev, ["doc_id", "neighbor_id"]).select(
        F.col("doc_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    pts = flat_spans(spark, sf_dir).filter("span_idx = 0").select(
        F.col("doc_id").alias("node")
    )
    return (
        connected_components(pts, mutual, node_col="node")
        .withColumnRenamed("node", "doc_id")
    )


def _o_knn_mutual() -> str:
    from .functions.graph import reach_cte_sql

    kn = O_KNN.strip()
    edges = (
        f"SELECT a.doc_id AS src, a.neighbor_id AS dst FROM ({kn}) a "
        f"JOIN ({kn}) b ON a.doc_id = b.neighbor_id AND a.neighbor_id = b.doc_id"
    )
    nodes = f"SELECT doc_id AS node FROM ({O_SPANS_FLAT}) WHERE span_idx = 0"
    cte = reach_cte_sql(edges, nodes, "node")
    return f"WITH RECURSIVE {cte} SELECT node AS doc_id, cluster_id FROM cl"


O_KNN_MUTUAL = _o_knn_mutual()


def q_knn_kdist(spark, sf_dir):
    """k-distance diagnostic (the DBSCAN eps-selection curve): each
    point's k-th-NN squared distance, bucketed into a decile histogram by
    sorted rank — rides the bounded-ring kNN (points whose ring holds
    < k neighbours are absent, as in the standard plot)."""
    from pyspark.sql import Window as W

    kd = (
        q_knn(spark, sf_dir)
        .filter(F.col("rank") == KNN_K)
        .select("doc_id", "dist2")
    )
    w = W.orderBy("dist2", "doc_id")
    # NB: the global sort is the PLOT's semantics (a one-dimensional
    # ordered curve); the decile bucket keeps the output tiny
    return (
        kd.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(kd.agg(F.count(F.lit(1)).alias("n_pts"))))
        .withColumn("decile", F.expr("CAST((rn - 1) * 10 DIV n_pts AS BIGINT)"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("dist2").alias("d2_min"),
            F.max("dist2").alias("d2_max"),
        )
    )


O_KNN_KDIST = f"""
WITH kd AS (
  SELECT doc_id, dist2 FROM ({O_KNN.strip()}) WHERE rank = {KNN_K}
),
r AS (
  SELECT dist2, row_number() OVER (ORDER BY dist2, doc_id) AS rn,
         count(*) OVER () AS n_pts
  FROM kd
)
SELECT (rn - 1) * 10 // n_pts AS decile, count(*) AS n,
       min(dist2) AS d2_min, max(dist2) AS d2_max
FROM r GROUP BY 1
"""


def q_knn_local(spark, sf_dir):
    """Scale-path kNN (per-cell local search via applyInPandas) — same
    semantics and oracle as q_knn."""
    from .spatial.knn import knn_local

    pts = flat_spans(spark, sf_dir).filter("span_idx = 0").select("doc_id", "lon", "lat")
    return knn_local(pts, res=KNN_RES, ring=KNN_RING, k=KNN_K)


def q_raster_focal(spark, sf_dir):
    """Focal 3×3 raster statistics (map-algebra focal max/min/sum) over
    the generated raster grid — exact channels (values are binary
    fractions), one constant explode + re-aggregation."""
    from .spatial.raster import focal_stats

    return focal_stats(spark, res=6)


def _o_raster_focal() -> str:
    from .spatial.raster import focal_stats_oracle_sql

    return focal_stats_oracle_sql(res=6)


O_RASTER_FOCAL = _o_raster_focal()


def q_idw_interp(spark, sf_dir):
    """Inverse-distance-weighted interpolation of the span density field
    onto empty cells (gap filling): integer weights 40/d2 make both sums
    exact BIGINT; the estimate is one double division.  Constant 24-way
    map-side spread + grid-bounded aggregate + emptiness anti-join."""
    from .spatial.raster import idw_sql

    load_documents(spark, sf_dir)
    return spark.sql(idw_sql(synth.flat_spans_sql("spark"), "spark"))


def _o_idw_interp() -> str:
    from .spatial.raster import idw_sql

    return idw_sql(synth.flat_spans_sql("duck"), "duck")


O_IDW_INTERP = _o_idw_interp()


def _skyline_sql() -> str:
    """Pareto frontier (skyline) of documents maximizing (n_spans,
    n_chars): docs not dominated by any other on both axes.

    Shared-text algorithm for BOTH engines: group to per-x max-y (x =
    n_spans has BOUNDED cardinality — 8 values by construction — so the
    global-ordered window rides a tiny aggregate, the bin-edge-densify
    pattern, never a corpus-sized single-partition sort), running max
    over strictly-greater x, then one equi join back.  A doc survives iff
    it attains its x-group's max y AND beats every greater-x group's max
    (strict: an equal y at greater x dominates).  The DuckDB oracle is
    the INDEPENDENT quadratic NOT EXISTS dominance definition, so the
    window algebra is proven against first-principles semantics."""
    return f"""
WITH feat AS (
  SELECT doc_id, CAST({synth.n_spans_sql()} AS BIGINT) AS n_spans, n_chars
  FROM documents
),
gx AS (
  SELECT n_spans, max(n_chars) AS my FROM feat GROUP BY 1
),
run AS (
  SELECT n_spans, my,
         max(my) OVER (ORDER BY n_spans DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mgt
  FROM gx
)
SELECT f.doc_id, f.n_spans, f.n_chars
FROM feat f JOIN run r ON f.n_spans = r.n_spans
WHERE f.n_chars = r.my AND (r.mgt IS NULL OR f.n_chars > r.mgt)
"""


def q_skyline(spark, sf_dir):
    """Skyline / Pareto-frontier query via the bounded-group window
    algorithm (see _skyline_sql) — the multi-criteria 'best documents'
    primitive (longest AND most-interleaved), O(n) + a tiny window where
    the textbook definition is an O(n^2) self-anti-join."""
    load_documents(spark, sf_dir)
    return spark.sql(_skyline_sql())


def _o_skyline() -> str:
    # independent first-principles oracle: quadratic NOT EXISTS dominance
    return f"""
WITH feat AS (
  SELECT doc_id, CAST({synth.n_spans_sql()} AS BIGINT) AS n_spans, n_chars
  FROM documents
)
SELECT b.doc_id, b.n_spans, b.n_chars FROM feat b
WHERE NOT EXISTS (
  SELECT 1 FROM feat a
  WHERE a.n_spans >= b.n_spans AND a.n_chars >= b.n_chars
    AND (a.n_spans > b.n_spans OR a.n_chars > b.n_chars)
)
"""


O_SKYLINE = _o_skyline()


def q_raster_join(spark, sf_dir):
    df = flat_spans(spark, sf_dir).select("doc_id", "span_idx", "lon", "lat")
    return raster_vector_join(df, res=REGION_RES).select(
        "doc_id", "span_idx", "tile_id", "tile_value"
    )


O_RASTER_JOIN = f"""
SELECT p.doc_id, p.span_idx, r.tile_id, r.tile_value
FROM ({O_SPANS_FLAT}) p
JOIN ({synth.raster_sql('duck', REGION_RES)}) r
  ON {grid.cell_sql('p.lon', 'p.lat', REGION_RES, 'duck')} = r.tile_id
"""


# ---------------------------------------------------------------------------
# 6. classic BinnedDataframe on a scalar column + systematics + skim
# ---------------------------------------------------------------------------

_NCHARS_DIM = {"in": "n_chars", "out": "nchars_bin",
               "bins": {"nbins": 10, "low": 0.0, "high": 500.0}}


def q_binned_1d(spark, sf_dir):
    df = load_documents(spark, sf_dir).withColumn(
        "w", F.expr(synth.doc_weight_sql())
    )
    stage = BinnedDataframeStage(name="hist", binning=[_NCHARS_DIM], weights={"w": "w"})
    return stage.apply(df)


_dim = Dimension.from_config(_NCHARS_DIM)
O_BINNED_1D = f"""
WITH base AS (
  SELECT *, {synth.doc_weight_sql()} AS w,
         {_dim.index_sql('duck')} AS nchars_bin
  FROM documents
)
SELECT nchars_bin, count(*) AS n, sum(w) AS w_sumw, sum(w * w) AS w_sumw2,
       {_dim.lo_hi_sql('nchars_bin', 'duck')[0]} AS nchars_bin_lo,
       {_dim.lo_hi_sql('nchars_bin', 'duck')[1]} AS nchars_bin_hi
FROM base GROUP BY nchars_bin
"""


def q_binned_1d_padded(spark, sf_dir):
    """pad_missing densify (A6): every bin index appears, empty bins carry
    n=0 / sumw=0 (ref: binned_dataframe.py:103-114 densify_dataframe —
    reindex to the full product of bin edges)."""
    df = load_documents(spark, sf_dir).withColumn("w", F.expr(synth.doc_weight_sql()))
    stage = BinnedDataframeStage(
        name="hist", binning=[_NCHARS_DIM], weights={"w": "w"}, pad_missing=True
    )
    return stage.apply(df)


O_BINNED_1D_PADDED = f"""
WITH idxs AS (
  SELECT unnest(range(0, {len(_dim.edges) - 1})) AS nchars_bin
),
obs AS ({O_BINNED_1D})
SELECT i.nchars_bin,
       coalesce(o.n, 0) AS n,
       coalesce(o.w_sumw, 0.0) AS w_sumw,
       coalesce(o.w_sumw2, 0.0) AS w_sumw2,
       {_dim.lo_hi_sql('i.nchars_bin', 'duck')[0]} AS nchars_bin_lo,
       {_dim.lo_hi_sql('i.nchars_bin', 'duck')[1]} AS nchars_bin_hi
FROM idxs i LEFT JOIN obs o ON i.nchars_bin = o.nchars_bin
"""


def q_csv_roundtrip(spark, sf_dir):
    """K1 sink fidelity at driver grain: the binned histogram is exported
    through the CLI's ``%.17g`` CSV writer (ref: fast-carpenter's
    to_csv float_format, summary/binned_dataframe.py:14-51) and read BACK
    under the original schema.  17 significant digits round-trips IEEE754
    doubles exactly — including the ±inf open-ended bin edges — so the
    oracle is the same as binned_1d's: any loss in the sink breaks the
    value hash."""
    import os
    import tempfile

    res = q_binned_1d(spark, sf_dir)
    schema = res.schema
    pdf = res.toPandas()  # sink parity check: result is O(n_bins) rows
    path = os.path.join(
        tempfile.gettempdir(), f"fcs_csv_rt_{_source_fingerprint_tag(sf_dir)}.csv"
    )
    pdf.to_csv(path, index=False, float_format="%.17g")
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("positiveInf", "inf")
        .option("negativeInf", "-inf")
        .csv(path)
    )


def q_systematics(spark, sf_dir):
    df = load_documents(spark, sf_dir).withColumn("w", F.expr(synth.doc_weight_sql()))
    stage = SystematicWeightsStage(
        name="syst",
        weights={
            "scale": {"nominal": "w", "up": "w * 1.25", "down": "w * 0.75"},
            "trig": {"nominal": "CAST(1.0 AS DOUBLE)", "up": "CAST(1.0625 AS DOUBLE)"},
        },
    )
    return stage.apply(df).select(
        "doc_id", "weight_nominal", "weight_scale_up", "weight_scale_down", "weight_trig_up"
    )


O_SYSTEMATICS = f"""
SELECT doc_id,
       ({synth.doc_weight_sql()}) * 1.0 AS weight_nominal,
       (({synth.doc_weight_sql()}) * 1.25) * 1.0 AS weight_scale_up,
       (({synth.doc_weight_sql()}) * 0.75) * 1.0 AS weight_scale_down,
       ({synth.doc_weight_sql()}) * 1.0625 AS weight_trig_up
FROM documents
"""


def q_systematics_binned(spark, sf_dir):
    """Reference end-to-end workflow: systematic weight variations feeding
    the binned dataframe — per-(region-cell) sumw for nominal and each
    variation in ONE aggregation pass (ref: define/systematics.py:61-94
    building variations consumed by summary/binned_dataframe.py weights)."""
    df = flat_spans(spark, sf_dir)
    df = SystematicWeightsStage(
        name="syst",
        weights={"scale": {"nominal": "w", "up": "w * 1.25", "down": "w * 0.75"}},
    ).apply(df)
    df = df.withColumn("cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")))
    return BinnedDataframeStage(
        name="tiles",
        binning=[{"in": "cell"}],
        weights={
            "nominal": "weight_nominal",
            "scale_up": "weight_scale_up",
            "scale_down": "weight_scale_down",
        },
    ).apply(df)


O_SYSTEMATICS_BINNED = f"""
SELECT {grid.cell_sql('lon', 'lat', REGION_RES, 'duck')} AS cell,
       count(*) AS n,
       sum(w * 1.0) AS nominal_sumw,
       sum((w * 1.0) * (w * 1.0)) AS nominal_sumw2,
       sum((w * 1.25) * 1.0) AS scale_up_sumw,
       sum(((w * 1.25) * 1.0) * ((w * 1.25) * 1.0)) AS scale_up_sumw2,
       sum((w * 0.75) * 1.0) AS scale_down_sumw,
       sum(((w * 0.75) * 1.0) * ((w * 0.75) * 1.0)) AS scale_down_sumw2
FROM ({O_SPANS_FLAT})
GROUP BY 1
"""


def q_skim(spark, sf_dir):
    """Event-level skim (A10): masked projection of span collections."""
    from .operators.skim import EventByEventDataframeStage

    df = flat_spans(spark, sf_dir)
    stage = EventByEventDataframeStage(
        name="skim",
        collections=["doc_id", "span_idx", "kind", "n_chars"],
        mask="n_chars > 300",
        flatten=False,
    )
    return stage.apply(df)


O_SKIM = f"""
SELECT doc_id, span_idx, kind, n_chars FROM ({O_SPANS_FLAT}) WHERE n_chars > 300
"""


# ---------------------------------------------------------------------------
# 7. training-data ops: dedup / similarity / text analysis / multimodal
# ---------------------------------------------------------------------------

from .functions import ann as _ann  # noqa: E402
from .functions import dedup as _dedup  # noqa: E402
from .functions import text as _text  # noqa: E402
from .functions.media import decode_media_oracle_sql, decode_media_spans  # noqa: E402


TOKEN_TOPK = 10


def q_token_topk(spark, sf_dir):
    """Heavy hitters: top-k most frequent tokens per language tag — the
    corpus-statistics pass of a training-data pipeline (vocabulary audit,
    stopword discovery).  Explode -> two-level partial agg -> per-group
    top-k via WindowGroupLimit."""
    from pyspark.sql import Window as W

    docs = load_documents(spark, sf_dir)
    toks = docs.select(
        "lang", F.explode(F.expr(_text.tokens_sql("text", "spark"))).alias("token")
    )
    counts = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOKEN_TOPK)
        .select("lang", "token", "n", "rank")
    )


O_TOKEN_TOPK = f"""
SELECT lang, token, n, CAST(rank AS INT) AS rank FROM (
  SELECT lang, token, count(*) AS n,
         row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, token) AS rank
  FROM (SELECT lang, unnest({_text.tokens_sql('text', 'duck')}) AS token FROM documents)
  GROUP BY lang, token
) WHERE rank <= {TOKEN_TOPK}
"""


def q_modality_profile(spark, sf_dir):
    """Document modality-mix histogram (interleaved-format structure): per
    doc the (text, image, audio, table) span counts, then how many docs
    share each exact mix — one conditional-aggregate pass + a tiny
    profile-keyed aggregate."""
    df = flat_spans(spark, sf_dir)
    per_doc = df.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("kind") == k, 1).otherwise(0)).alias(f"n_{k}")
            for k in ["text", "image", "audio", "table"]
        ]
    )
    return per_doc.groupBy("n_text", "n_image", "n_audio", "n_table").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


O_MODALITY_PROFILE = f"""
WITH per_doc AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
         CAST(sum(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT) AS n_image,
         CAST(sum(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END) AS BIGINT) AS n_audio,
         CAST(sum(CASE WHEN kind = 'table' THEN 1 ELSE 0 END) AS BIGINT) AS n_table
  FROM ({O_SPANS_FLAT})
  GROUP BY doc_id
)
SELECT n_text, n_image, n_audio, n_table, count(*) AS n_docs
FROM per_doc GROUP BY 1, 2, 3, 4
"""


BIGRAM_TOPK = 20


def q_bigram_topk(spark, sf_dir):
    """Corpus-level top-K bigram STRINGS (collocation audit — the n>1
    companion of the token heavy-hitters): adjacent-token pairs via an
    indexed transform over each doc's token array (map-side), then one
    partial-agg'd count + global top-K with (count desc, bigram asc)
    tie-break."""
    toks = _text.tokens_sql("text", "spark")
    bigrams = (
        f"transform(sequence(1, size({toks}) - 1), i -> "
        f"concat(element_at({toks}, i), ' ', element_at({toks}, i + 1)))"
    )
    docs = load_documents(spark, sf_dir).filter(f"size({toks}) >= 2")
    from pyspark.sql import Window as W

    counts = (
        docs.select(F.explode(F.expr(bigrams)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= BIGRAM_TOPK)
    )


def _o_bigram_topk() -> str:
    toks = _text.tokens_sql("text", "duck")
    bigrams = (
        f"list_transform(range(1, len({toks})), i -> "
        f"list_extract({toks}, i) || ' ' || list_extract({toks}, i + 1))"
    )
    return f"""
SELECT bigram, n, CAST(rank AS INT) AS rank FROM (
  SELECT bigram, count(*) AS n,
         row_number() OVER (ORDER BY count(*) DESC, bigram) AS rank
  FROM (SELECT unnest({bigrams}) AS bigram FROM documents WHERE len({toks}) >= 2)
  GROUP BY bigram
) WHERE rank <= {BIGRAM_TOPK}
"""


O_BIGRAM_TOPK = _o_bigram_topk()


def q_dedup_exact(spark, sf_dir):
    return _dedup.exact_dedup(load_documents(spark, sf_dir))


O_DEDUP_EXACT = f"""
SELECT {_text.text_hash_sql('text', 'duck')} AS fingerprint,
       min(doc_id) AS canonical_doc_id, count(*) AS n_dups
FROM documents GROUP BY 1
"""


def q_dedup_pipeline(spark, sf_dir):
    """The curation pipeline as CONFIG (round-3 DedupStage at driver
    grain): Dedup(exact, keep min doc_id per fingerprint) → CutFlow
    (n_chars >= 256) → BinnedDataframe per lang — the YAML shape a user
    writes for dedupe-then-select-then-summarize, executed through the
    same Pipeline.from_config path as the reference demo config."""
    from .plans.pipeline import Pipeline

    docs = load_documents(spark, sf_dir)
    pipe = Pipeline.from_config(
        {
            "stages": [
                {"dedup": {"method": "exact"}},
                {"cutflow": {"selection": "n_chars >= 256"}},
                {
                    "binned_dataframe": {
                        "binning": [{"in": "lang"}],
                        "weights": {},
                    }
                },
            ]
        }
    )
    return pipe.apply(docs)


def _o_dedup_pipeline() -> str:
    return f"""
WITH canon AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, {_text.text_hash_sql('text', 'duck')} AS fp FROM documents)
  GROUP BY fp
),
kept AS (SELECT d.* FROM documents d JOIN canon USING (doc_id)),
filt AS (SELECT * FROM kept WHERE n_chars >= 256)
SELECT lang, CAST(count(*) AS BIGINT) AS n FROM filt GROUP BY 1
"""


def q_minhash_lsh(spark, sf_dir):
    return _dedup.minhash_lsh_pairs(load_documents(spark, sf_dir))


def _o_minhash() -> str:
    sig = _dedup.minhash_signature_sql("text", "duck")
    keys = _dedup.band_keys_sql(f"({sig})", "duck")
    tokset = f"list_distinct({_text.token_hashes_sql('text', 'duck')})"
    return f"""
WITH wk AS (
  SELECT doc_id, {tokset} AS tokset, {keys} AS keys FROM documents
),
banded AS (
  SELECT doc_id, tokset, b.b AS band, list_extract(keys, b.b + 1) AS band_key
  FROM wk, (SELECT unnest(range(0, {_dedup.N_BANDS})) AS b) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.tokset AS tok_a, b.tokset AS tok_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)
SELECT DISTINCT doc_a, doc_b,
       CAST(len(list_intersect(tok_a, tok_b)) AS DOUBLE) /
       CAST(len(list_distinct(list_concat(tok_a, tok_b))) AS DOUBLE) AS jaccard
FROM pairs
"""


O_MINHASH_LSH = _o_minhash()


def q_simhash(spark, sf_dir):
    return _dedup.simhash_fingerprints(load_documents(spark, sf_dir))


O_SIMHASH = f"""
SELECT doc_id, {_dedup.simhash_sql('text', 'duck')} AS simhash FROM documents
"""


def q_simhash_pairs(spark, sf_dir):
    """Hamming<=3 near-dup pairs via pigeonhole banding (4x8-bit bands ->
    band-key self-join -> bit_count(xor) refine).  The banding is COMPLETE
    for radius n_bands-1, so the oracle can be the quadratic scan and the
    match is exact, not approximate."""
    return _dedup.simhash_pairs(load_documents(spark, sf_dir))


O_SIMHASH_PAIRS = f"""
WITH fp AS (
  SELECT doc_id, {_dedup.simhash_sql('text', 'duck')} AS simhash FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_dedup.SIMHASH_K}
"""


def q_ngram_jaccard(spark, sf_dir):
    return _dedup.ngram_jaccard_pairs(load_documents(spark, sf_dir), threshold=0.2)


O_NGRAM_JACCARD = f"""
WITH sh AS (
  SELECT doc_id, list_distinct({_text.ngram_hashes_sql('text', 3, 'duck')}) AS sh
  FROM documents
), nz AS (SELECT doc_id, sh, len(sh) AS n_sh FROM sh WHERE len(sh) > 0)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       CAST(a.n_sh + b.n_sh - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
FROM nz a JOIN nz b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) > 0
  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      CAST(a.n_sh + b.n_sh - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.2
"""


def _langid_confusion_sql(dialect: str) -> str:
    """Language-ID evaluation as a confusion matrix: (true, predicted)
    counts plus the per-cell share of the true language's documents in
    exact basis points — the classifier-quality report the langid
    heuristic needs before anyone trusts its routing.  Bounded output
    (|langs|²); one aggregate."""
    pred = _text.langid_pred_sql("text", dialect)
    return f"""
WITH p AS (SELECT lang AS lang_true, {pred} AS lang_pred FROM documents),
m AS (
  SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n
  FROM p GROUP BY 1, 2
),
t AS (SELECT lang_true, CAST(sum(n) AS BIGINT) AS tot FROM m GROUP BY 1)
SELECT m.lang_true, m.lang_pred, m.n,
       CAST(m.n * 10000 {'DIV' if dialect == 'spark' else '//'} t.tot AS BIGINT)
         AS share_bp
FROM m JOIN t ON t.lang_true = m.lang_true
"""


def q_langid_confusion(spark, sf_dir):
    """Confusion matrix + exact basis-point shares for the langid
    heuristic against the labeled corpus."""
    load_documents(spark, sf_dir)
    return spark.sql(_langid_confusion_sql("spark"))


def _token_budget_sql(dialect: str) -> str:
    """Training-mixture accounting: total tokens per (source, lang) with
    the corpus share in exact basis points — the table a mixture-weight
    decision reads before any sampling happens.  One aggregate + a 1-row
    total attach."""
    toks = _text.tokens_sql("text", dialect)
    n_tok = f"size({toks})" if dialect == "spark" else f"len({toks})"
    idiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH per AS (
  SELECT source, lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({n_tok}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM per)
SELECT p.source, p.lang, p.n_docs, p.n_tokens,
       CAST(p.n_tokens * 10000 {idiv} t.total_tokens AS BIGINT) AS share_bp
FROM per p, tot t
"""


def q_token_budget(spark, sf_dir):
    """Token budget per (source, lang) with exact corpus shares."""
    load_documents(spark, sf_dir)
    return spark.sql(_token_budget_sql("spark"))


def _length_histogram_sql(dialect: str) -> str:
    """Document-length distribution in log2 buckets (bucket = number of
    bits of the token count — exact via length(bin(n))), per language:
    the shape report packing/curriculum decisions read.  Bounded output;
    one aggregate."""
    toks = _text.tokens_sql("text", dialect)
    n_tok = f"size({toks})" if dialect == "spark" else f"len({toks})"
    return f"""
SELECT lang,
       CAST(length(bin({n_tok})) AS INT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min({n_tok}) AS BIGINT) AS min_tokens,
       CAST(max({n_tok}) AS BIGINT) AS max_tokens
FROM documents
WHERE {n_tok} > 0
GROUP BY 1, 2
"""


def q_length_histogram(spark, sf_dir):
    """Per-language log2 token-length histogram (exact integer buckets)."""
    load_documents(spark, sf_dir)
    return spark.sql(_length_histogram_sql("spark"))


def q_text_features(spark, sf_dir):
    """Language-ID + quality score + token stats per document."""
    df = load_documents(spark, sf_dir)
    return df.withColumn("fingerprint", _text.doc_hash_column("text")).selectExpr(
        "doc_id",
        "lang AS lang_true",
        f"{_text.langid_pred_sql('text', 'spark')} AS lang_pred",
        f"{_text.quality_score_sql('text', 'spark')} AS quality",
        f"size({_text.tokens_sql('text', 'spark')}) AS n_tokens",
        f"CAST({_text.subword_count_sql('text', 'spark')} AS BIGINT) AS n_subwords",
        "fingerprint",
    )


O_TEXT_FEATURES = f"""
SELECT doc_id, lang AS lang_true,
       {_text.langid_pred_sql('text', 'duck')} AS lang_pred,
       {_text.quality_score_sql('text', 'duck')} AS quality,
       CAST(len({_text.tokens_sql('text', 'duck')}) AS INT) AS n_tokens,
       {_text.subword_count_sql('text', 'duck')} AS n_subwords,
       {_text.text_hash_sql('text', 'duck')} AS fingerprint
FROM documents
"""


def _load_embeddings(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.createOrReplaceTempView("embeddings")
    return df


def q_ann_cosine(spark, sf_dir):
    return _ann.cosine_topk(_load_embeddings(spark, sf_dir))


O_ANN_COSINE = _ann.cosine_topk_oracle_sql()


def q_ann_lsh_bucket(spark, sf_dir):
    return _ann.lsh_buckets(_load_embeddings(spark, sf_dir))


O_ANN_LSH_BUCKET = _ann.lsh_bucket_oracle_sql()


def q_ann_lsh_topk(spark, sf_dir):
    return _ann.lsh_cosine_topk(_load_embeddings(spark, sf_dir))


O_ANN_LSH_TOPK = _ann.lsh_cosine_topk_oracle_sql()


def q_ann_lsh_rerank(spark, sf_dir):
    """Multi-probe LSH candidates (equi join on probe key) + exact rerank."""
    return _ann.lsh_rerank_topk(_load_embeddings(spark, sf_dir))


O_ANN_LSH_RERANK = _ann.lsh_rerank_oracle_sql()


def q_ann_rerank_recall(spark, sf_dir):
    """Recall@k of the rerank path vs the exact brute-force baseline."""
    return _ann.rerank_recall(_load_embeddings(spark, sf_dir))


O_ANN_RERANK_RECALL = _ann.rerank_recall_oracle_sql()


def q_ann_ivf_assign(spark, sf_dir):
    """IVF coarse quantizer: nearest-centroid inverted-list assignment."""
    return _ann.ivf_assign(_load_embeddings(spark, sf_dir))


O_ANN_IVF_ASSIGN = _ann.ivf_assign_oracle_sql()


def q_ann_ivf_centroids(spark, sf_dir):
    """Exact k-means M-step for the IVF lists: per (list, dim) member
    count + fixed-point centroid numerator (floor-scaled BIGINT sums —
    order-insensitive, restartable)."""
    return _ann.ivf_centroid_update(_load_embeddings(spark, sf_dir))


O_ANN_IVF_CENTROIDS = _ann.ivf_centroid_update_oracle_sql()


def q_ann_ivf_reassign(spark, sf_dir):
    """One full exact k-means round (M-step centroids → E-step nearest-
    centroid reassignment) — iterative ML training as oracle-exact Spark
    jobs (pinned-fold distances, integer-ratio centroids)."""
    return _ann.ivf_reassign(_load_embeddings(spark, sf_dir))


O_ANN_IVF_REASSIGN = _ann.ivf_reassign_oracle_sql()


def q_ann_label_purity(spark, sf_dir):
    """Per-IVF-list majority label + counts — the quantizer-quality
    diagnostic (purity = top_n/total), deterministic tie-break."""
    return _ann.ivf_label_purity(_load_embeddings(spark, sf_dir))


O_ANN_LABEL_PURITY = _ann.ivf_label_purity_oracle_sql()


def q_ann_ivf_topk(spark, sf_dir):
    """IVF n_probe nearest-list probe + exact cosine rerank."""
    return _ann.ivf_topk(_load_embeddings(spark, sf_dir))


O_ANN_IVF_TOPK = _ann.ivf_topk_oracle_sql()


def q_ann_ivf_recall(spark, sf_dir):
    """Recall@k of the IVF probe path vs the exact baseline."""
    return _ann.ivf_recall(_load_embeddings(spark, sf_dir))


O_ANN_IVF_RECALL = _ann.ivf_recall_oracle_sql()


def _load_clustered(spark, sf_dir):
    """Deterministic Gaussian-mixture-style embeddings derived from
    (vec_id, label) — pure integer-hash arithmetic, so Spark and the DuckDB
    oracle generate bit-identical vectors (see ann.clustered_vec_sql)."""
    return _ann.clustered_embeddings(_load_embeddings(spark, sf_dir))


def q_embed_clustered(spark, sf_dir):
    """The clustered synthetic embedding table itself, summarized per
    vector (first/middle component + exact norm): proves both engines
    derive identical mixture vectors before any ANN query consumes them."""
    ce = _load_clustered(spark, sf_dir)
    return ce.select(
        "vec_id",
        "label",
        F.expr("element_at(embedding, 1)").alias("c0"),
        F.expr("element_at(embedding, 33)").alias("c32"),
        F.expr(_ann.norm_sql("embedding", "spark")).alias("norm"),
    )


O_EMBED_CLUSTERED = f"""
WITH {_ann.clustered_table_cte()}
SELECT vec_id, label,
       list_extract(embedding, 1) AS c0,
       list_extract(embedding, 33) AS c32,
       {_ann.norm_sql('embedding', 'duck')} AS norm
FROM embeddings_c
"""


def q_ann_ivf_recall_clustered(spark, sf_dir):
    """IVF recall@5 on CLUSTERED embeddings: same machinery as
    ann_ivf_recall, but measured on a corpus with real cluster structure —
    the honest recall number (near-uniform vectors bound recall at ~0.5
    no matter the probe settings; clustered corpora are what IVF is for)."""
    return _ann.ivf_recall(_load_clustered(spark, sf_dir))


O_ANN_IVF_RECALL_CLUSTERED = _ann.ivf_recall_oracle_sql(
    table="embeddings_c", extra_cte=_ann.clustered_table_cte() + ", "
)


def q_ann_rerank_recall_clustered(spark, sf_dir):
    """Multi-probe LSH rerank recall@5 on CLUSTERED embeddings — the
    LSH-family twin of ann_ivf_recall_clustered."""
    return _ann.rerank_recall(_load_clustered(spark, sf_dir))


O_ANN_RERANK_RECALL_CLUSTERED = _ann.rerank_recall_oracle_sql(
    table="embeddings_c", extra_cte=_ann.clustered_table_cte() + ", "
)


def q_ann_pq_codes(spark, sf_dir):
    """Product-quantization encode: every vector compressed to 8 nibble
    codes (nearest deterministic sub-centroid per 8-dim subspace), emitted
    in the join-ready exploded (vec_id, m, code) layout — 4 bytes standing
    in for 256 bytes of floats, the compression that makes 10^12-vector
    candidate scans feasible."""
    from .functions import pq as _pq

    return _pq.pq_codes(_load_embeddings(spark, sf_dir))


def _o_ann_pq_codes() -> str:
    from .functions import pq as _pq

    return _pq.pq_codes_oracle_sql()


def q_ann_pq_topk(spark, sf_dir):
    """PQ asymmetric-distance top-k via the ADC lookup-table join: a
    128-row per-query LUT broadcast against the exploded code table, ONE
    equi join on (m, code) + a groupBy sum — never a cross join against
    raw vectors.  Runs on the clustered table so every distance and
    partial sum is an exact integer (order-insensitive)."""
    from .functions import pq as _pq

    return _pq.pq_adc_topk(_load_clustered(spark, sf_dir))


def _o_ann_pq_topk() -> str:
    from .functions import pq as _pq

    return _pq.pq_adc_topk_oracle_sql(
        table="embeddings_c", extra_cte=_ann.clustered_table_cte() + ", "
    )


def q_ann_pq_recall(spark, sf_dir):
    """Recall@5 of the PQ/ADC path vs exact L2 on the clustered table —
    the third ANN family's recall row next to ann_ivf_recall_clustered
    and ann_rerank_recall_clustered."""
    from .functions import pq as _pq

    return _pq.pq_recall(_load_clustered(spark, sf_dir))


def _o_ann_pq_recall() -> str:
    from .functions import pq as _pq

    return _pq.pq_recall_oracle_sql(
        table="embeddings_c", extra_cte=_ann.clustered_table_cte() + ", "
    )


def q_ann_pq_rerank_recall(spark, sf_dir):
    """Recall@5 of the PRODUCTION PQ shape — ADC shortlist (top-50 by
    code-estimated distance, raw vectors untouched) + exact L2 rerank of
    the shortlist only.  Raw ADC recall is floored by untrained codebooks
    (a tight cluster shares codes, distances tie — see ann_pq_recall, the
    honest quantization-resolution diagnostic); the shortlist absorbs the
    ties and the rerank touches ~shortlist/corpus of the vectors."""
    from .functions import pq as _pq

    return _pq.pq_rerank_recall(_load_clustered(spark, sf_dir))


def _o_ann_pq_rerank_recall() -> str:
    from .functions import pq as _pq

    return _pq.pq_rerank_recall_oracle_sql(
        table="embeddings_c", extra_cte=_ann.clustered_table_cte() + ", "
    )


def q_ann_ivfpq_codes(spark, sf_dir):
    """IVF-PQ index entries: coarse inverted-list assignment + PQ codes of
    the RESIDUAL v - C[list] — the composed FAISS-style billion-scale
    index layout (4-byte code spends its resolution on the within-list
    displacement)."""
    from .functions import pq as _pq

    return _pq.ivfpq_codes(_load_clustered(spark, sf_dir))


def _o_ann_ivfpq_codes() -> str:
    from .functions import pq as _pq

    return _pq.ivfpq_codes_oracle_sql(
        table="embeddings_c", extra_cte=_ann.clustered_table_cte() + ", "
    )


def q_ann_ivfpq_recall(spark, sf_dir):
    """Recall@5 of the FULL IVF-PQ path — probe 4 lists, per-probe
    residual ADC LUT join on (list, m, code), shortlist 50, exact rerank —
    vs exact L2.  Inverted-list pruning and code compression compose in
    one equi-join plan; candidates outside probed lists never join."""
    from .functions import pq as _pq

    return _pq.ivfpq_recall(_load_clustered(spark, sf_dir))


def _o_ann_ivfpq_recall() -> str:
    from .functions import pq as _pq

    return _pq.ivfpq_recall_oracle_sql(
        table="embeddings_c", extra_cte=_ann.clustered_table_cte() + ", "
    )


def q_ann_index_delta(spark, sf_dir):
    """ANN index MAINTENANCE at O(delta): the embedding corpus lives in a
    snapshot (A = 3/4 of vectors, B = append commit of the rest); when B
    lands, only B's data files are opened (manifest diff) and only those
    vectors are IVF-PQ encoded — the appended index rows to union with
    A's already-built codes.  Index upkeep cost scales with the append,
    not the table (the property that keeps a 10^12-vector index
    maintainable).  Output: the delta's (vec_id, list_id, m, code)."""
    import os
    import tempfile

    from .functions import pq as _pq
    from .sources.snapshot import SnapshotReader, list_snapshots, write_snapshot

    tdir = os.path.join(
        tempfile.gettempdir(), f"fcs_annidx_snap_{_source_fingerprint_tag(sf_dir)}"
    )
    if not (os.path.isdir(tdir) and len(list_snapshots(tdir)) >= 2):
        ce = _load_clustered(spark, sf_dir)
        base = write_snapshot(
            ce.filter("vec_id % 4 < 3").repartition(2, "vec_id"),
            tdir,
            snapshot_id="snap-a",
        )
        write_snapshot(
            ce.filter("vec_id % 4 = 3").repartition(2, "vec_id"),
            tdir,
            snapshot_id="snap-b",
            base=base,
        )
    delta = SnapshotReader(tdir, "snap-b").load_incremental(spark, "snap-a")
    return _pq.ivfpq_codes(delta)


def _o_ann_index_delta() -> str:
    from .functions import pq as _pq

    cte = _ann.clustered_table_cte(name="embeddings_c0")
    return _pq.ivfpq_codes_oracle_sql(
        table="embeddings_c",
        extra_cte=(
            cte
            + ", embeddings_c AS (SELECT * FROM embeddings_c0 WHERE vec_id % 4 = 3), "
        ),
    )


def q_tile_agg_delta(spark, sf_dir):
    """Incremental MATERIALIZED-AGGREGATE maintenance at O(delta): the
    corpus lives in a snapshot (A = 3/4 of docs, B = append commit of the
    rest); the per-cell tile aggregate is kept up to date by aggregating
    ONLY B's data files (manifest diff, `load_incremental`) and merging the
    delta partial into the already-materialized table with one associative
    coalesce-sum — never re-scanning A.  At 10^12 docs this is the daily
    rollup-refresh path: cost scales with the append, and the merge is a
    cell-keyed join against a table bounded by grid size, not corpus size.
    Exactness: counts are BIGINT and weights are dyadic rationals (k/64),
    so partial-sum + merge is bit-identical to the full recompute the
    oracle performs (same law the checkpoint partial-merge relies on).
    Spiritual parity: ref fast_carpenter/summary/binned_dataframe.py
    Collector.collect (pandas add across chunk results), re-expressed as
    snapshot-delta maintenance."""
    import os
    import tempfile

    from .sources.snapshot import SnapshotReader, list_snapshots, write_snapshot

    tdir = os.path.join(
        tempfile.gettempdir(), f"fcs_tiledelta_snap_{_source_fingerprint_tag(sf_dir)}"
    )
    if not (os.path.isdir(tdir) and len(list_snapshots(tdir)) >= 2):
        docs = load_documents(spark, sf_dir)
        base = write_snapshot(
            docs.filter("doc_id % 4 < 3").repartition(2, "doc_id"),
            tdir,
            snapshot_id="snap-a",
        )
        write_snapshot(
            docs.filter("doc_id % 4 = 3").repartition(2, "doc_id"),
            tdir,
            snapshot_id="snap-b",
            base=base,
        )
    materialized = tile_partial_agg(
        spark, SnapshotReader(tdir, "snap-a").load(spark), "docs_tiledelta_base"
    )
    delta = tile_partial_agg(
        spark,
        SnapshotReader(tdir, "snap-b").load_incremental(spark, "snap-a"),
        "docs_tiledelta_inc",
    )
    m = materialized.select(
        "cell",
        F.col("n").alias("n_a"),
        F.col("w_sumw").alias("sw_a"),
        F.col("w_sumw2").alias("sw2_a"),
    )
    d = delta.select(
        "cell",
        F.col("n").alias("n_b"),
        F.col("w_sumw").alias("sw_b"),
        F.col("w_sumw2").alias("sw2_b"),
    )
    return (
        m.join(d, "cell", "full_outer")
        .select(
            "cell",
            (F.coalesce("n_a", F.lit(0)) + F.coalesce("n_b", F.lit(0))).alias("n"),
            (F.coalesce("sw_a", F.lit(0.0)) + F.coalesce("sw_b", F.lit(0.0))).alias(
                "w_sumw"
            ),
            (F.coalesce("sw2_a", F.lit(0.0)) + F.coalesce("sw2_b", F.lit(0.0))).alias(
                "w_sumw2"
            ),
        )
    )


def tile_partial_agg(spark, docs_df, view: str):
    """Per-cell (n, w_sumw, w_sumw2) partial over one snapshot slice —
    the mergeable unit tile_agg_delta composes."""
    docs_df.createOrReplaceTempView(view)
    flat = spark.sql(synth.flat_spans_sql("spark", docs=view))
    return (
        flat.withColumn("cell", F.expr(grid.cell_sql("lon", "lat", TILE_RES, "spark")))
        .groupBy("cell")
        .agg(
            F.count("*").alias("n"),
            F.sum("w").alias("w_sumw"),
            F.sum(F.col("w") * F.col("w")).alias("w_sumw2"),
        )
    )


def q_dedup_semantic(spark, sf_dir):
    """SEMANTIC dedup on the clustered mixture table: same LSH-bucketed
    pair join + canonical-min as dedup_embedding_cosine, but at tau=0.95 on
    vectors with real cluster structure — near-dup groups recover the
    mixture components (every member maps to its component's min id), the
    behavior semantic dedup is supposed to exhibit and the uniform base
    table cannot."""
    return _ann.embedding_near_dup(_load_clustered(spark, sf_dir), tau=0.95)


O_DEDUP_SEMANTIC = _ann.embedding_near_dup_oracle_sql(
    tau=0.95, table="embeddings_c", extra_cte=_ann.clustered_table_cte() + ", "
)


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup (LSH-bucketed pair join + canonical-min)."""
    return _ann.embedding_near_dup(_load_embeddings(spark, sf_dir))


O_DEDUP_EMBEDDING = _ann.embedding_near_dup_oracle_sql()


CONSENSUS_TAU = 0.4


def q_dedup_consensus(spark, sf_dir):
    """Multi-signal near-dup consensus: pairs flagged by BOTH the textual
    MinHash-LSH path (jaccard >= threshold) AND the embedding-cosine path
    (cos >= tau, same LSH bucket) — the high-precision keep-list a real
    dedup pipeline acts on (either signal alone over-fires on boilerplate
    / on topic-similar docs respectively).  One equi-join of the two pair
    sets on (doc_a, doc_b)."""
    from .functions.ann import cosine_sql, lsh_buckets

    mh = _dedup.minhash_lsh_pairs(load_documents(spark, sf_dir)).filter(
        f"jaccard >= {_dedup.CLUSTER_JACCARD}"
    )
    emb = _load_embeddings(spark, sf_dir)
    b = lsh_buckets(emb).join(emb, "vec_id")
    a = b.select(
        F.col("vec_id").alias("doc_a"), F.col("embedding").alias("qv"), "bucket"
    )
    c = b.select(
        F.col("vec_id").alias("doc_b"), F.col("embedding").alias("cv"), "bucket"
    )
    ep = (
        a.join(c, "bucket")
        .filter("doc_a < doc_b")
        .withColumn("cos", F.expr(cosine_sql("qv", "cv", "spark")))
        .filter(F.col("cos") >= CONSENSUS_TAU)
        .select("doc_a", "doc_b", "cos")
    )
    return mh.join(ep, ["doc_a", "doc_b"]).select("doc_a", "doc_b", "jaccard", "cos")


def _o_dedup_consensus() -> str:
    from .functions.ann import cosine_sql, lsh_bucket_sql

    cos = cosine_sql("a.embedding", "b.embedding", "duck")
    ba = lsh_bucket_sql("a.embedding", "duck")
    bb = lsh_bucket_sql("b.embedding", "duck")
    return f"""
WITH mh AS (
  SELECT doc_a, doc_b, jaccard FROM ({O_MINHASH_LSH.strip()})
  WHERE jaccard >= {_dedup.CLUSTER_JACCARD}
),
ep AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, {cos} AS cos
  FROM embeddings a JOIN embeddings b
    ON ({ba}) = ({bb}) AND a.vec_id < b.vec_id
  WHERE {cos} >= {CONSENSUS_TAU!r}
)
SELECT mh.doc_a, mh.doc_b, mh.jaccard, ep.cos
FROM mh JOIN ep USING (doc_a, doc_b)
"""


O_DEDUP_CONSENSUS = _o_dedup_consensus()


def q_tile_cooccur(spark, sf_dir):
    """Cross-source spatial co-occurrence: cells (COARSE_RES) where BOTH
    document spans and user-event trajectories land, with both counts —
    the two geo sources joined at tile grain (each side partial-agg'd
    before one co-partitioned cell join)."""
    from .spatial.trajectory import _coords_sql

    doc_cells = (
        flat_spans(spark, sf_dir)
        .groupBy(
            F.expr(grid.cell_sql("lon", "lat", COARSE_RES, "spark")).alias("cell")
        )
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )
    _load_events(spark, sf_dir)
    lon, lat = _coords_sql()
    ev_cells = spark.sql(
        f"SELECT {grid.cell_sql(lon, lat, COARSE_RES, 'spark')} AS cell, "
        "count(*) AS n_events FROM events GROUP BY 1"
    )
    return doc_cells.join(ev_cells, "cell")


def _o_tile_cooccur() -> str:
    from .spatial.trajectory import _coords_sql

    lon, lat = _coords_sql()
    return f"""
WITH dc AS (
  SELECT {grid.cell_sql('lon', 'lat', COARSE_RES, 'duck')} AS cell,
         count(*) AS n_spans
  FROM ({O_SPANS_FLAT}) GROUP BY 1
),
ec AS (
  SELECT {grid.cell_sql(lon, lat, COARSE_RES, 'duck')} AS cell,
         count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT cell, n_spans, n_events FROM dc JOIN ec USING (cell)
"""


O_TILE_COOCCUR = _o_tile_cooccur()


def q_media_decode(spark, sf_dir):
    return decode_media_spans(flat_spans(spark, sf_dir))


O_MEDIA_DECODE = decode_media_oracle_sql(O_SPANS_FLAT)


def q_media_text_align(spark, sf_dir):
    """Caption alignment for interleaved docs: each media span paired with
    the nearest preceding text span (one doc-keyed window, no join)."""
    from .functions.media import media_text_align

    return media_text_align(flat_spans(spark, sf_dir))


def _o_media_text_align() -> str:
    from .functions.media import media_text_align_oracle_sql

    return media_text_align_oracle_sql(O_SPANS_FLAT)


O_MEDIA_TEXT_ALIGN = _o_media_text_align()


def q_dedup_incremental(spark, sf_dir):
    """Incremental-ingest dedup: incoming batch (re-ingested copies + new
    content) anti-joined against the corpus fingerprint set."""
    return _dedup.incremental_new_docs(load_documents(spark, sf_dir))


O_DEDUP_INCREMENTAL = _dedup.incremental_new_docs_oracle_sql()


def q_media_resize(spark, sf_dir):
    """Aspect-preserving resize plan over decoded media (mapInPandas)."""
    from .functions.media import resize_media

    return resize_media(decode_media_spans(flat_spans(spark, sf_dir)))


def q_media_frames(spark, sf_dir):
    """Frame sampling: 1->N rows per media span (mapInPandas batch shape)."""
    from .functions.media import sample_frames

    return sample_frames(decode_media_spans(flat_spans(spark, sf_dir)))


def _media_oracles():
    from .functions.media import resize_media_oracle_sql, sample_frames_oracle_sql

    return (
        resize_media_oracle_sql(O_MEDIA_DECODE),
        sample_frames_oracle_sql(O_MEDIA_DECODE),
    )


O_MEDIA_RESIZE, O_MEDIA_FRAMES = _media_oracles()


def q_zonal_stats(spark, sf_dir):
    """Zonal statistics: per-polygon aggregate of raster tile values (tiles
    whose center passes the exact PIP against the polygon)."""
    from .spatial.raster import zonal_stats

    return zonal_stats(spark, synth.polygons(), res=REGION_RES)


def _zonal_oracle_sql(res: int = REGION_RES) -> str:
    n = 1 << res
    x = grid.unpack_x_sql("tile_id", "duck")
    y = grid.unpack_y_sql("tile_id", "duck")
    return f"""
WITH centers AS (
  SELECT tile_id, tile_value,
         (CAST({x} AS DOUBLE) + 0.5) / {float(n)!r} * 360.0 - 180.0 AS lon,
         (CAST({y} AS DOUBLE) + 0.5) / {float(n)!r} * 180.0 - 90.0 AS lat
  FROM ({synth.raster_sql('duck', res)})
),
edges AS (
  SELECT poly_id, region,
         list_extract(ring_lon, i) AS x1, list_extract(ring_lat, i) AS y1,
         list_extract(ring_lon, 1 + i % len(ring_lon)) AS x2,
         list_extract(ring_lat, 1 + i % len(ring_lon)) AS y2
  FROM (SELECT *, unnest(range(1, len(ring_lon) + 1)) AS i FROM {synth.polygons_values_sql('duck')})
),
inpoly AS (
  SELECT c.tile_id, c.tile_value, e.poly_id, e.region
  FROM centers c, edges e
  GROUP BY ALL
  HAVING SUM(CASE WHEN ((y1 > lat) != (y2 > lat))
                   AND (lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1)
             THEN 1 ELSE 0 END) % 2 = 1
)
SELECT poly_id, region, count(*) AS n_tiles,
       sum(tile_value) AS sum_value,
       sum(tile_value * tile_value) AS sum_value2
FROM inpoly GROUP BY 1, 2
"""


O_ZONAL_STATS = _zonal_oracle_sql()


# ---------------------------------------------------------------------------
# checkpoint / resume (north_rule: per-partition lineage + metrics)
# ---------------------------------------------------------------------------


def flagship_unit_job(spark):
    """Per-work-unit flagship pipeline for CheckpointedRun: documents-unit ->
    (partial (region, cell) aggregate, lineage metrics incl. cutflow
    counters).  Counter lineage mirrors the reference's per-chunk Counter
    protocol (ref: fast_carpenter/selection/filters.py:28-63)."""
    polys = synth.polygons()

    def job(df_unit):
        df_unit.createOrReplaceTempView("ckpt_unit_docs")
        spans = spark.sql(synth.flat_spans_sql("spark", docs="ckpt_unit_docs"))
        joined = (
            SpatialJoinStage(name="sj", polygons=polys).apply(spans)
            .withColumn("cell", F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")))
            .withColumn("pw", F.col("w") * F.col("weight"))
        )
        partial = BinnedDataframeStage(
            name="tiles", binning=[{"in": "region"}, {"in": "cell"}], weights={"pw": "pw"}
        ).apply(joined)
        ctr_rows = (
            CutFlowStage(name="cf", selection=CUTFLOW_SELECTION, weights=CUTFLOW_WEIGHTS)
            .counters(spans)
            .collect()
        )
        metrics = {
            "docs": df_unit.count(),
            "cutflow": {
                f"{r['cut']}|{r['count_type']}|{r['weight_name']}": r["value"]
                for r in ctr_rows
            },
        }
        return partial, metrics

    return job


def _source_fingerprint_tag(sf_dir: str) -> str:
    """Cache tag from the source parquet's (name, size, mtime) set so a
    regenerated testdata set can never hit a stale derived snapshot."""
    import hashlib
    import os

    src = f"{sf_dir}/documents.parquet"
    parts = []
    if os.path.isfile(src):
        st = os.stat(src)
        parts.append(f"documents.parquet:{st.st_size}:{int(st.st_mtime)}")
    else:
        for root, _, files in os.walk(src):
            for fn in sorted(files):
                st = os.stat(os.path.join(root, fn))
                parts.append(f"{fn}:{st.st_size}:{int(st.st_mtime)}")
    fp = hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]
    return f"{os.path.basename(os.path.normpath(sf_dir))}_{fp}"


def _hilbert_snapshot(spark, sf_dir):
    """Span points written as a Hilbert-range-partitioned snapshot with
    per-file hkey bounds — the north-star physical layout (range
    partitioning on Hilbert-ordered cell keys) materialized through the
    snapshot store.  Cached per source fingerprint like the other
    snapshot-backed queries."""
    import os
    import tempfile

    from .plans.pipeline import HilbertLayoutStage
    from .sources.snapshot import SnapshotReader, list_snapshots, write_snapshot

    tdir = os.path.join(
        tempfile.gettempdir(), f"fcs_hlb_snap_{_source_fingerprint_tag(sf_dir)}"
    )
    if not (os.path.isdir(tdir) and list_snapshots(tdir)):
        pts = flat_spans(spark, sf_dir).select(
            "doc_id", "span_idx", "lon", "lat", "w",
            F.expr(grid.cell_sql("lon", "lat", REGION_RES, "spark")).alias("cell"),
        )
        laid = HilbertLayoutStage(
            name="hl", res=REGION_RES, partitions=8, keep_col="hkey"
        ).apply(pts)
        write_snapshot(laid, tdir, snapshot_id="snap-hlb", bounds_cols=["hkey"])
    return SnapshotReader(tdir)


def _sw_quadrant_hkey_range() -> tuple[int, int]:
    """Exact hkey range of the x<n/2, y<n/2 quadrant at REGION_RES —
    Hilbert curves fill each top-level quadrant contiguously, so
    [min, max] over the quadrant's cells prunes to exactly its files."""
    import numpy as np

    n = 1 << REGION_RES
    xs, ys = np.meshgrid(np.arange(n // 2), np.arange(n // 2))
    hk = grid.hilbert_key(xs.ravel().astype("int64"), ys.ravel().astype("int64"), REGION_RES)
    return int(hk.min()), int(hk.max())


def q_snapshot_pruned_scan(spark, sf_dir):
    """Hilbert layout + manifest pruning end-to-end: span points live in a
    Hilbert-range-partitioned snapshot (per-file hkey bounds); a spatial
    quadrant query prunes at the MANIFEST level to the files whose hkey
    range intersects the quadrant's contiguous Hilbert interval, then
    applies the exact spatial residual filter.  Per-cell counts of the
    south-west quadrant; semantics = the residual filter (pruning is
    conservative), so the oracle reads the raw documents — the pruning
    itself (files actually skipped) is pinned by tests/test_snapshot.py."""
    reader = _hilbert_snapshot(spark, sf_dir)
    qlo, qhi = _sw_quadrant_hkey_range()
    n_half = (1 << REGION_RES) // 2
    pts = reader.load(spark, col="hkey", lo=qlo, hi=qhi)
    ux = grid.unpack_x_sql("cell", "spark")
    uy = grid.unpack_y_sql("cell", "spark")
    return (
        pts.filter(F.expr(f"({ux}) < {n_half} AND ({uy}) < {n_half}"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sumw"))
    )


def _o_snapshot_pruned_scan() -> str:
    n_half = (1 << REGION_RES) // 2
    cell = grid.cell_sql("lon", "lat", REGION_RES, "duck")
    ux = grid.unpack_x_sql("cell", "duck")
    uy = grid.unpack_y_sql("cell", "duck")
    return f"""
WITH fs AS ({{spans}}),
cells AS (SELECT {cell} AS cell, w FROM fs)
SELECT cell, count(*) AS n, sum(w) AS sumw
FROM cells
WHERE ({ux}) < {n_half} AND ({uy}) < {n_half}
GROUP BY cell
""".replace("{spans}", synth.flat_spans_sql("duck"))


def _ring_region():
    """A ring (box minus inner box) at REGION_RES — a query region whose
    Hilbert cover is deliberately NOT one contiguous interval (6 runs),
    unlike the curve-aligned SW quadrant."""
    n = 1 << REGION_RES
    return (n // 4, 3 * n // 4, 3 * n // 8, 5 * n // 8)


def _ring_pred_sql(ux: str, uy: str) -> str:
    o_lo, o_hi, i_lo, i_hi = _ring_region()
    return (
        f"(({ux}) >= {o_lo} AND ({ux}) < {o_hi} AND ({uy}) >= {o_lo} AND ({uy}) < {o_hi}) "
        f"AND NOT (({ux}) >= {i_lo} AND ({ux}) < {i_hi} AND ({uy}) >= {i_lo} AND ({uy}) < {i_hi})"
    )


def q_snapshot_multirange_scan(spark, sf_dir):
    """Multi-range Hilbert manifest pruning: a RING query region's cell
    cover decomposes into 6 contiguous Hilbert runs (hilbert_intervals,
    plan-time arithmetic on region cells — never data); files are pruned
    against ALL intervals, opening 4 of 8 files where the single [min,max]
    envelope would open 6 — the range-split planning an Iceberg scan does
    for non-curve-aligned regions, and the general form of the quadrant
    scan.  Exact residual filter after the pruned read; pruning wins and
    result-identity are pinned in tests/test_snapshot.py."""
    import numpy as np

    from .spatial.layout import hilbert_intervals

    reader = _hilbert_snapshot(spark, sf_dir)
    n = 1 << REGION_RES
    o_lo, o_hi, i_lo, i_hi = _ring_region()
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    x, y = xs.ravel(), ys.ravel()
    m = (
        (x >= o_lo) & (x < o_hi) & (y >= o_lo) & (y < o_hi)
        & ~((x >= i_lo) & (x < i_hi) & (y >= i_lo) & (y < i_hi))
    )
    hk = grid.hilbert_key(x[m].astype("int64"), y[m].astype("int64"), REGION_RES)
    intervals = hilbert_intervals(hk, max_intervals=8)
    pts = reader.load_ranges(spark, "hkey", intervals)
    ux = grid.unpack_x_sql("cell", "spark")
    uy = grid.unpack_y_sql("cell", "spark")
    return (
        pts.filter(F.expr(_ring_pred_sql(ux, uy)))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sumw"))
    )


def _o_snapshot_multirange_scan() -> str:
    cell = grid.cell_sql("lon", "lat", REGION_RES, "duck")
    ux = grid.unpack_x_sql("cell", "duck")
    uy = grid.unpack_y_sql("cell", "duck")
    return f"""
WITH fs AS ({{spans}}),
cells AS (SELECT {cell} AS cell, w FROM fs)
SELECT cell, count(*) AS n, sum(w) AS sumw
FROM cells
WHERE {_ring_pred_sql(ux, uy)}
GROUP BY cell
""".replace("{spans}", synth.flat_spans_sql("duck"))


def q_snapshot_schema_evolution(spark, sf_dir):
    """Schema evolution across commits: the base commit writes
    (doc_id, lang, n_chars); the append commit ADDS a `quality` column.
    Reading the latest snapshot applies the COMMIT's schema to every data
    file — pre-evolution files surface quality as NULL (Iceberg
    add-column semantics: no rewrite, no default backfill) — so the
    per-lang aggregate sees exact non-null counts splitting at the commit
    boundary.  The schema pin is what makes this work: parquet inference
    over mixed files would fail or widen types nondeterministically."""
    import os
    import tempfile

    from .sources.snapshot import SnapshotReader, list_snapshots, write_snapshot

    tdir = os.path.join(
        tempfile.gettempdir(), f"fcs_evo_snap_{_source_fingerprint_tag(sf_dir)}"
    )
    if not (os.path.isdir(tdir) and len(list_snapshots(tdir)) >= 2):
        docs = load_documents(spark, sf_dir)
        base = write_snapshot(
            docs.filter("doc_id % 3 != 0")
            .select("doc_id", "lang", "n_chars")
            .repartition(2, "doc_id"),
            tdir,
            snapshot_id="snap-v1",
        )
        write_snapshot(
            docs.filter("doc_id % 3 = 0")
            .selectExpr(
                "doc_id", "lang", "n_chars",
                "CAST(n_chars % 100 AS BIGINT) AS quality",
            )
            .repartition(2, "doc_id"),
            tdir,
            snapshot_id="snap-v2",
            base=base,
        )
    docs = SnapshotReader(tdir, "snap-v2").load(spark)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("quality").alias("n_with_quality"),
        F.sum(F.coalesce("quality", F.lit(0))).alias("quality_sum"),
        F.sum("n_chars").alias("chars_sum"),
    )


O_SNAPSHOT_SCHEMA_EVOLUTION = """
WITH evolved AS (
  SELECT doc_id, lang, n_chars,
         CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars % 100 AS BIGINT) END AS quality
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n,
       CAST(count(quality) AS BIGINT) AS n_with_quality,
       CAST(sum(coalesce(quality, 0)) AS BIGINT) AS quality_sum,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM evolved GROUP BY 1
"""


BLOOM_PROBE_IDS = (17, 130, 384)


def q_snapshot_bloom_scan(spark, sf_dir):
    """Point-lookup data skipping via manifest blooms: the corpus snapshot
    is HASH-partitioned on doc_id (8 files), so every file's [min,max]
    spans the whole id domain and range bounds prune nothing — the setting
    where Iceberg/Parquet bloom indexes earn their keep.  A 3-id probe
    opens only the files whose doc_id bloom hits (~1 file per id at 0.2%
    fpp), then the exact residual filter runs; files-opened and
    absent-key-pruning are pinned in tests/test_snapshot.py."""
    import os
    import tempfile

    from .sources.snapshot import SnapshotReader, list_snapshots, write_snapshot

    tdir = os.path.join(
        tempfile.gettempdir(), f"fcs_bloom_snap_{_source_fingerprint_tag(sf_dir)}"
    )
    if not (os.path.isdir(tdir) and list_snapshots(tdir)):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        write_snapshot(
            docs.repartition(8, "doc_id"),
            tdir,
            snapshot_id="snap-bloom",
            bloom_cols=["doc_id"],
        )
    reader = SnapshotReader(tdir)
    ids = list(BLOOM_PROBE_IDS)
    return (
        reader.load_bloom(spark, "doc_id", ids)
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", "lang", "source", "n_chars")
    )


def _o_snapshot_bloom_scan() -> str:
    ids = ", ".join(str(i) for i in BLOOM_PROBE_IDS)
    return f"""
SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id IN ({ids})
"""


def q_snapshot_incremental(spark, sf_dir):
    """Iceberg-style incremental scan: snapshot A holds 3/4 of the corpus,
    snapshot B is an APPEND commit of the remaining quarter (manifest =
    A's immutable files + the new ones).  The incremental read between A
    and B is a manifest diff — only the appended files are opened, so the
    cost is O(delta) regardless of table size — and this query tiles just
    that delta."""
    import os
    import tempfile

    from .sources.snapshot import SnapshotReader, list_snapshots, write_snapshot

    tdir = os.path.join(
        tempfile.gettempdir(), f"fcs_incr_snap_{_source_fingerprint_tag(sf_dir)}"
    )
    if not (os.path.isdir(tdir) and len(list_snapshots(tdir)) >= 2):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base = write_snapshot(
            docs.filter("doc_id % 4 < 3").repartition(2, "doc_id"),
            tdir,
            snapshot_id="snap-a",
        )
        write_snapshot(
            docs.filter("doc_id % 4 = 3").repartition(2, "doc_id"),
            tdir,
            snapshot_id="snap-b",
            base=base,
        )
    delta = SnapshotReader(tdir, "snap-b").load_incremental(spark, "snap-a")
    delta.createOrReplaceTempView("docs_incr")
    flat = spark.sql(synth.flat_spans_sql("spark", "docs_incr"))
    return (
        flat.withColumn("cell", F.expr(grid.cell_sql("lon", "lat", TILE_RES, "spark")))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("w_sumw"))
    )


def _o_snapshot_incremental() -> str:
    inner = synth.flat_spans_sql(
        "duck", "(SELECT * FROM documents WHERE doc_id % 4 = 3) docs_incr"
    )
    return f"""
SELECT {grid.cell_sql('lon', 'lat', TILE_RES, 'duck')} AS cell,
       count(*) AS n, sum(w) AS w_sumw
FROM ({inner})
GROUP BY 1
"""


O_SNAPSHOT_INCREMENTAL = _o_snapshot_incremental()


def _compact_table(spark, sf_dir):
    """Fragmented snapshot table for the compaction queries: snap-a holds
    3/4 of the corpus in ONE large file, snap-b appends the remaining
    quarter as EIGHT tiny files (a streaming-commit pattern), snap-c is
    the ``compact_snapshot`` REPLACE commit — the big file carried by
    reference, the eight small ones rewritten into one.  Built once per
    source fingerprint and reused across queries/runs."""
    import os
    import tempfile

    from .sources.snapshot import (
        SnapshotReader,
        compact_snapshot,
        list_snapshots,
        write_snapshot,
    )

    tdir = os.path.join(
        tempfile.gettempdir(), f"fcs_cmpct_snap_{_source_fingerprint_tag(sf_dir)}"
    )
    if not (os.path.isdir(tdir) and len(list_snapshots(tdir)) >= 3):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        big = docs.filter("doc_id % 4 < 3")
        small = docs.filter("doc_id % 4 = 3")
        n_big = big.count()
        base = write_snapshot(
            big.repartition(1), tdir, snapshot_id="snap-a", bounds_cols=["doc_id"]
        )
        appended = write_snapshot(
            small.repartition(8), tdir, snapshot_id="snap-b", base=base,
            bounds_cols=["doc_id"],
        )
        compact_snapshot(
            spark,
            tdir,
            # every snap-b file (~n_big/24 rows) is "small"; the snap-a
            # file is not — selective compaction, not a full rewrite
            min_rows=n_big,
            target_rows=n_big,
            snapshot_id="snap-c",
            base_snapshot_id=appended.snapshot_id,
        )
    return tdir


def q_snapshot_compact(spark, sf_dir):
    """Small-file compaction end-to-end (Iceberg rewrite_data_files): read
    the table THROUGH the compacted snapshot and tile it.  Semantics =
    identity on rows (compaction is pure layout), so the oracle reads the
    raw documents; the layout claim itself — 9 files before, 2 after, the
    large file untouched by path — is pinned in tests/test_snapshot.py."""
    from .sources.snapshot import SnapshotReader

    tdir = _compact_table(spark, sf_dir)
    docs = SnapshotReader(tdir, "snap-c").load(spark)
    docs.createOrReplaceTempView("docs_cmpct")
    flat = spark.sql(synth.flat_spans_sql("spark", "docs_cmpct"))
    return (
        flat.withColumn("cell", F.expr(grid.cell_sql("lon", "lat", TILE_RES, "spark")))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("w_sumw"))
    )


def _o_snapshot_compact() -> str:
    inner = synth.flat_spans_sql("duck")
    return f"""
SELECT {grid.cell_sql('lon', 'lat', TILE_RES, 'duck')} AS cell,
       count(*) AS n, sum(w) AS w_sumw
FROM ({inner})
GROUP BY 1
"""


def q_snapshot_time_travel(spark, sf_dir):
    """Time travel: read the table AS OF the pre-append snapshot (snap-a,
    3/4 of the corpus) even though snap-b and the snap-c compaction have
    since been committed — data files are immutable and manifests pin the
    member set, so an old snapshot id reproduces the exact old table."""
    from .sources.snapshot import SnapshotReader

    tdir = _compact_table(spark, sf_dir)
    docs = SnapshotReader(tdir, "snap-a").load(spark)
    docs.createOrReplaceTempView("docs_tt")
    flat = spark.sql(synth.flat_spans_sql("spark", "docs_tt"))
    return (
        flat.withColumn("cell", F.expr(grid.cell_sql("lon", "lat", TILE_RES, "spark")))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("w_sumw"))
    )


def _o_snapshot_time_travel() -> str:
    inner = synth.flat_spans_sql(
        "duck", "(SELECT * FROM documents WHERE doc_id % 4 < 3) docs_tt"
    )
    return f"""
SELECT {grid.cell_sql('lon', 'lat', TILE_RES, 'duck')} AS cell,
       count(*) AS n, sum(w) AS w_sumw
FROM ({inner})
GROUP BY 1
"""


def _merge_table(spark, sf_dir):
    """Snapshot table for the MERGE query: snap-base holds 4/5 of the
    corpus range-partitioned on doc_id (8 files with tight doc_id
    bounds), snap-m is the copy-on-write MERGE commit — updates flip
    lang to 'xx' for doc_id % 10 = 1 (matched rows) and insert the
    held-out doc_id % 5 = 4 fifth (unmatched rows).  Built once per
    source fingerprint and reused."""
    import os
    import tempfile

    from .sources.snapshot import list_snapshots, merge_snapshot, write_snapshot

    tdir = os.path.join(
        tempfile.gettempdir(), f"fcs_merge_snap_{_source_fingerprint_tag(sf_dir)}"
    )
    if not (os.path.isdir(tdir) and len(list_snapshots(tdir)) >= 2):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base_df = docs.filter("doc_id % 5 <> 4").select(
            "doc_id", "lang", "source", "n_chars"
        )
        write_snapshot(
            base_df.repartitionByRange(8, "doc_id"),
            tdir,
            snapshot_id="snap-base",
            bounds_cols=["doc_id"],
        )
        ups = (
            docs.filter("doc_id % 10 = 1")
            .select("doc_id", F.lit("xx").alias("lang"), "source", "n_chars")
            .unionByName(
                docs.filter("doc_id % 5 = 4").select(
                    "doc_id", "lang", "source", "n_chars"
                )
            )
        )
        merge_snapshot(
            spark, tdir, ups, "doc_id",
            snapshot_id="snap-m", base_snapshot_id="snap-base",
        )
    return tdir


def q_snapshot_merge(spark, sf_dir):
    """MERGE INTO (copy-on-write upsert) end-to-end: read the table
    THROUGH the merge commit and profile it per lang.  Matched keys
    (doc_id % 10 = 1) must show the updated lang 'xx'; unmatched keys
    (doc_id % 5 = 4) must appear as inserts; everything else must be the
    untouched base row.  The file-level CoW claim — only files containing
    a matched key rewritten, the rest carried by reference, manifest
    bounds pruning files whose doc_id range cannot match — is pinned in
    tests/test_snapshot.py."""
    from .sources.snapshot import SnapshotReader

    tdir = _merge_table(spark, sf_dir)
    docs = SnapshotReader(tdir, "snap-m").load(spark)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("id_sum"),
        F.sum("n_chars").alias("chars_sum"),
    )


O_SNAPSHOT_MERGE = """
WITH base AS (
  SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id % 5 <> 4
),
ups AS (
  SELECT doc_id, 'xx' AS lang, source, n_chars FROM documents WHERE doc_id % 10 = 1
  UNION ALL
  SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id % 5 = 4
),
merged AS (
  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM ups)
  UNION ALL
  SELECT * FROM ups
)
SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum, CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM merged GROUP BY 1
"""


def _mor_table(spark, sf_dir):
    """Snapshot table for the merge-on-read queries: base holds the full
    corpus range-partitioned on doc_id; snap-del is an equality-delete
    commit (doc_id % 7 = 3) that touches NO data file; snap-app appends
    rows AFTER the delete, re-inserting half the deleted keys with lang
    'yy' — the commit-sequence rule must keep them.  Built once per source
    fingerprint and reused."""
    import os
    import tempfile

    from .sources.snapshot import delete_snapshot, list_snapshots, write_snapshot

    tdir = os.path.join(
        tempfile.gettempdir(), f"fcs_mor_snap_{_source_fingerprint_tag(sf_dir)}"
    )
    if not (os.path.isdir(tdir) and len(list_snapshots(tdir)) >= 3):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base_df = docs.select("doc_id", "lang", "source", "n_chars")
        write_snapshot(
            base_df.repartitionByRange(8, "doc_id"),
            tdir,
            snapshot_id="snap-base",
            bounds_cols=["doc_id"],
        )
        delete_snapshot(
            spark, tdir, docs.filter("doc_id % 7 = 3").select("doc_id"),
            "doc_id", snapshot_id="snap-del", base_snapshot_id="snap-base",
        )
        reins = docs.filter("doc_id % 7 = 3 AND doc_id % 2 = 0").select(
            "doc_id", F.lit("yy").alias("lang"), "source", "n_chars"
        )
        write_snapshot(
            reins, tdir, snapshot_id="snap-app",
            bounds_cols=["doc_id"], base="snap-del",
        )
    return tdir


def q_snapshot_mor(spark, sf_dir):
    """Merge-on-read DELETE end-to-end: read THROUGH an equality-delete
    commit plus a later append that re-inserts half the deleted keys.
    Deleted keys (doc_id % 7 = 3) must be gone EXCEPT the re-inserted even
    ones (lang 'yy') — equality deletes apply only to data files with a
    smaller commit sequence number, so the post-delete append is immune.
    The delete commit wrote zero data files (pinned in
    tests/test_snapshot.py): at 10^12 rows this is the only affordable
    shape for small deletes; rewrite_deletes folds them in later."""
    from .sources.snapshot import SnapshotReader

    tdir = _mor_table(spark, sf_dir)
    docs = SnapshotReader(tdir, "snap-app").load(spark)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("id_sum"),
        F.sum("n_chars").alias("chars_sum"),
    )


def q_snapshot_cdc(spark, sf_dir):
    """CDC / changelog read between two snapshots: the row-level diff of
    the MOR table before the delete commit vs after the re-inserting
    append — full-row multiset semantics (exceptAll both ways), so a key
    whose row changed surfaces as a delete+insert pair, the standard
    changelog shape downstream incremental consumers (sync, index
    maintenance, aggregate rollback) expect.  Scale shape: two hash
    anti-differences on row identity; at 10^12 rows a real reader would
    first narrow both sides to files the manifest diff says CHANGED —
    unchanged files are shared by reference and can never produce a diff
    row — making the compare O(churn), not O(table)."""
    from .sources.snapshot import SnapshotReader

    tdir = _mor_table(spark, sf_dir)
    cols = ["doc_id", "lang", "n_chars"]
    before = SnapshotReader(tdir, "snap-base").load(spark).select(cols)
    after = SnapshotReader(tdir, "snap-app").load(spark).select(cols)
    deletes = before.exceptAll(after).withColumn("_change_type", F.lit("delete"))
    inserts = after.exceptAll(before).withColumn("_change_type", F.lit("insert"))
    return deletes.unionByName(inserts).select("_change_type", *cols)


O_SNAPSHOT_CDC = """
SELECT 'delete' AS _change_type, doc_id, lang, n_chars
FROM documents WHERE doc_id % 7 = 3
UNION ALL
SELECT 'insert' AS _change_type, doc_id, 'yy' AS lang, n_chars
FROM documents WHERE doc_id % 7 = 3 AND doc_id % 2 = 0
"""


def q_snapshot_mor_rewrite(spark, sf_dir):
    """rewrite_deletes (Iceberg major compaction): folding the delete
    files into the data must reproduce the merge-on-read result exactly —
    same oracle as snapshot_mor.  Only data files whose manifest bounds
    intersect the delete-key range are rewritten; the rest are carried by
    reference (pinned in tests/test_snapshot.py)."""
    import os
    import shutil
    import tempfile

    from .sources.snapshot import SnapshotReader, list_snapshots, rewrite_deletes

    src = _mor_table(spark, sf_dir)
    tdir = os.path.join(
        tempfile.gettempdir(), f"fcs_mor_rw_{_source_fingerprint_tag(sf_dir)}"
    )
    if not (os.path.isdir(tdir) and "snap-rw" in list_snapshots(tdir)):
        if os.path.isdir(tdir):
            shutil.rmtree(tdir)
        shutil.copytree(src, tdir)
        rewrite_deletes(spark, tdir, snapshot_id="snap-rw",
                        base_snapshot_id="snap-app")
    docs = SnapshotReader(tdir, "snap-rw").load(spark)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("id_sum"),
        F.sum("n_chars").alias("chars_sum"),
    )


O_SNAPSHOT_MOR = """
WITH kept AS (
  SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id % 7 <> 3
),
reins AS (
  SELECT doc_id, 'yy' AS lang, source, n_chars FROM documents
  WHERE doc_id % 7 = 3 AND doc_id % 2 = 0
)
SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum, CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM (SELECT * FROM kept UNION ALL SELECT * FROM reins) GROUP BY 1
"""


def q_bucketed_join(spark, sf_dir):
    """Co-located join on the persistent bucketed layout: span points and
    per-cell tile stats are both written bucketed by the SAME cell key
    (64 buckets), so when neither side is broadcast-small the join plans
    as a SortMergeJoin with ZERO Exchange on either side — the
    recurring-join layout for 10^12-doc tables (write the shuffle once,
    reuse it every query; plan-asserted in tests/test_bucketed.py with
    broadcast disabled — at this test SF Catalyst rightly broadcasts the
    small side instead).  Output: histogram of cell density over spans
    (how many spans sit in cells of density n)."""
    from .sources.bucketed import colocated_join, write_bucketed

    import os
    import shutil

    tag = _source_fingerprint_tag(sf_dir).replace(".", "_").replace("-", "_")
    t_spans, t_tiles = f"fcs_bkt_spans_{tag}", f"fcs_bkt_tiles_{tag}"
    if not (spark.catalog.tableExists(t_spans) and spark.catalog.tableExists(t_tiles)):
        # bucketing metadata lives in the (in-memory) catalog, not the
        # files: a warehouse dir left by a previous session is unusable as
        # a BUCKETED table, so clear it and rewrite
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        for t in (t_spans, t_tiles):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
        flat = flat_spans(spark, sf_dir).withColumn(
            "cell", F.expr(grid.cell_sql("lon", "lat", TILE_RES, "spark"))
        )
        write_bucketed(flat.select("doc_id", "span_idx", "cell"), t_spans)
        write_bucketed(
            flat.groupBy("cell").agg(F.count(F.lit(1)).alias("n")), t_tiles
        )
    joined = colocated_join(spark, t_spans, t_tiles, on="cell")
    return joined.groupBy("n").agg(F.count(F.lit(1)).alias("n_spans"))


O_BUCKETED_JOIN = f"""
WITH flat AS (
  SELECT *, {grid.cell_sql('lon', 'lat', TILE_RES, 'duck')} AS cell
  FROM ({O_SPANS_FLAT})
),
tiles AS (SELECT cell, count(*) AS n FROM flat GROUP BY 1)
SELECT t.n AS n, count(*) AS n_spans
FROM flat f JOIN tiles t USING (cell)
GROUP BY 1
"""


def q_checkpoint_resume(spark, sf_dir):
    """Flagship spatial-join + tile-agg executed as a checkpointed,
    RESUMABLE run over an Iceberg-style snapshot: 4 file-group work units,
    simulated interruption after 2, restart from the ledger, associative
    merge of per-unit partials.  Final table must equal the single-shot
    pipeline bit-for-bit (same oracle as pip_tile_agg)."""
    import os
    import tempfile

    from .checkpoint import CheckpointedRun
    from .sources.snapshot import SnapshotReader, list_snapshots, write_snapshot

    # cache key includes a fingerprint of the source parquet (path, size,
    # mtime) so a regenerated testdata set can never hit a stale snapshot
    import hashlib

    src = f"{sf_dir}/documents.parquet"
    parts = []
    for root, _, files in os.walk(src):
        for fn in sorted(files):
            st = os.stat(os.path.join(root, fn))
            parts.append(f"{fn}:{st.st_size}:{int(st.st_mtime)}")
    fp = hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}_{fp}"
    snap_dir = os.path.join(tempfile.gettempdir(), f"fcs_ckpt_snap_{tag}")
    if not (os.path.isdir(snap_dir) and list_snapshots(snap_dir)):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        write_snapshot(
            docs.repartition(4, "doc_id"),
            snap_dir,
            snapshot_id="snap-ckpt",
            bounds_cols=["doc_id"],
        )
    reader = SnapshotReader(snap_dir)
    run_dir = tempfile.mkdtemp(prefix="fcs_ckpt_run_")
    job = flagship_unit_job(spark)
    run = CheckpointedRun.from_snapshot(run_dir, reader, job, files_per_unit=1)
    run.execute(spark, max_units=2)  # simulate a crash after two units
    resumed = CheckpointedRun.from_snapshot(run_dir, reader, job, files_per_unit=1)
    resumed.execute(spark)  # restart: ledger skips the finished units
    final, _metrics = resumed.finalize(spark)
    return final


# Reference demo-config LAYOUT verbatim (ref: docs/demo_process_cfg.yml):
# stage name -> dotted class path, per-stage config under the top-level
# stage-name key, string weights, reduce-in-selection, edges binning with
# out-rename — our interleaved table's columns standing in for the HEP
# branch names.  Same text as the CLI integration test, plus dataset_col so
# the mc/data union stays distinguishable in one result table.
DEMO_PIPELINE_CFG = """
input: spans_nested

stages:
    - span_cleaning: fast_carpenter.Define
    - event_selection: fast_carpenter.CutFlow
    - histogram: fast_carpenter.BinnedDataframe

span_cleaning:
    variables:
        - big_offsets: "offsets > 10"
        - n_big: {reduce: count_nonzero, formula: big_offsets}

event_selection:
    selection:
        All:
            - "n_spans > 1"
            - {reduce: -1, formula: "offsets > 10"}
            - Any:
                - "n_big >= 2"
                - "n_spans >= 3"
    weights: weight_nominal

histogram:
    binning:
        - {in: n_big}
        - {in: n_spans, out: nsp, bins: {edges: [0, 2, 4, 8]}}
    weights: weight_nominal
    dataset_col: dataset
"""


def q_demo_pipeline(spark, sf_dir):
    """The reference's demo processing config run end-to-end at driver
    grain through the ACTUAL CLI internals (Pipeline.from_config +
    load_dataset + specialize): one mc and one data dataset over the same
    documents, Define -> CutFlow (weights MC-only) -> BinnedDataframe,
    unioned on the dataset column — reference-UX parity with a hard
    correctness row (ref: docs/demo_process_cfg.yml;
    benchmarks/compare_carpenter_versions/run.sh:60-83 A/B spirit)."""
    import yaml

    from .__main__ import load_dataset, specialize
    from .plans.pipeline import Pipeline

    processing = yaml.safe_load(DEMO_PIPELINE_CFG)
    results = []
    for i, (name, etype) in enumerate((("mc_demo", "mc"), ("data_demo", "data"))):
        pipe = specialize(Pipeline.from_config(processing), etype == "mc")
        cfg = {"name": name, "files": [f"{sf_dir}/documents.parquet"]}
        results.append(pipe.apply(load_dataset(spark, cfg, "spans_nested", i)))
    out = results[0].unionByName(results[1])
    return out.select(
        "dataset", "n_big", "nsp", "n",
        F.col("weight_nominal_sumw").alias("sumw"),
        F.col("weight_nominal_sumw2").alias("sumw2"),
        "nsp_lo", "nsp_hi",
    )


def _o_demo_pipeline() -> str:
    """DuckDB twin of the demo pipeline, independently derived from the
    stage semantics (Define element mask + count_nonzero, All/Any/reduce -1
    destructive cutflow, left-closed edges binning with +-inf under/
    overflow, MC-only weights)."""
    from .operators.binned import Dimension

    dim = Dimension.from_config(
        {"in": "n_spans", "out": "nsp", "bins": {"edges": [0, 2, 4, 8]}}
    )
    idx = dim.index_sql("duck")
    lo, hi = dim.lo_hi_sql("nsp", "duck")
    spans = synth.spans_table_sql("duck")
    return f"""
WITH st AS ({spans}),
base AS (
  SELECT doc_id,
         CAST(len(spans) AS INT) AS n_spans,
         [CAST(s.offset AS INT) for s in spans] AS offsets,
         CAST(1.0 + len(spans) / 16.0 AS DOUBLE) AS weight_nominal
  FROM st
),
defined AS (
  SELECT *, CAST(len(list_filter(offsets, o -> o > 10)) AS INT) AS n_big
  FROM base
),
selected AS (
  SELECT * FROM defined
  WHERE n_spans > 1
    AND COALESCE(list_extract(offsets, len(offsets)) > 10, FALSE)
    AND (n_big >= 2 OR n_spans >= 3)
),
binned AS (
  SELECT *, {idx} AS nsp FROM selected
),
both_ds AS (
  SELECT 'mc_demo' AS dataset, n_big, nsp, weight_nominal AS w FROM binned
  UNION ALL
  SELECT 'data_demo' AS dataset, n_big, nsp, CAST(1.0 AS DOUBLE) AS w FROM binned
)
SELECT dataset, n_big, nsp, count(*) AS n,
       sum(w) AS sumw, sum(w * w) AS sumw2,
       {lo} AS nsp_lo, {hi} AS nsp_hi
FROM both_ds GROUP BY dataset, n_big, nsp
"""


def q_dedup_editdist(spark, sf_dir):
    """Character-level fuzzy near-dup pairs (levenshtein <= 8 inside
    prefix+length blocks) — the typo/OCR modality that token-shingle
    MinHash misses; blocked equi self-join, never all-pairs."""
    return _dedup.edit_distance_pairs(load_documents(spark, sf_dir))


def _o_dedup_editdist() -> str:
    return _dedup.edit_distance_pairs_oracle_sql()


def q_profile_cube(spark, sf_dir):
    """Multi-grain corpus profile in ONE pass: GROUPING SETS over
    (lang, source) — per-pair, per-lang, per-source and grand-total rows
    from a single scan + one shuffle (Spark expands sets map-side), the
    rollup shape dashboards ask of a 100 TB corpus."""
    docs = load_documents(spark, sf_dir)
    docs.createOrReplaceTempView("cube_docs")
    return spark.sql(
        """
        SELECT lang, source, count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS chars,
               CAST(grouping(lang) AS INT) AS g_lang,
               CAST(grouping(source) AS INT) AS g_source
        FROM cube_docs
        GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
        """
    )


O_PROFILE_CUBE = """
SELECT lang, source, count(*) AS n,
       CAST(sum(n_chars) AS BIGINT) AS chars,
       CAST(grouping(lang) AS INT) AS g_lang,
       CAST(grouping(source) AS INT) AS g_source
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
"""


def _stays_sql(dialect: str) -> str:
    """Shared-text gaps-and-islands stay detection: contiguous same-cell
    runs of length >= 3 along each document's span sequence (the
    stay-point primitive of trajectory mining).  Island key =
    span_idx - row_number within (doc, cell) — one window pass over the
    doc_id shuffle, the classic islands idiom."""
    cell = grid.cell_sql("lon", "lat", REGION_RES, dialect)
    fs = synth.flat_spans_sql(dialect)
    return f"""
WITH fs AS ({fs}),
cells AS (
  SELECT doc_id, span_idx, {cell} AS cell FROM fs
),
isl AS (
  SELECT doc_id, cell, span_idx,
         span_idx - row_number() OVER (
           PARTITION BY doc_id, cell ORDER BY span_idx) AS g
  FROM cells
)
SELECT doc_id, cell,
       CAST(min(span_idx) AS INT) AS start_idx,
       CAST(count(*) AS BIGINT) AS run_len
FROM isl GROUP BY doc_id, cell, g HAVING count(*) >= 3
"""


def q_trajectory_stays(spark, sf_dir):
    """Stay-point detection (gaps-and-islands): contiguous same-cell runs
    (len >= 3) along each document's span trajectory — the dwell/stop
    primitive of trajectory mining, one window pass on the doc_id key."""
    load_documents(spark, sf_dir)
    return spark.sql(_stays_sql("spark"))


O_TRAJECTORY_STAYS = _stays_sql("duck")


SAMPLE_W_K = 32
SAMPLE_W_SCALE = 1_000_000_000


def q_sample_weighted(spark, sf_dir):
    """Deterministic PRIORITY SAMPLING (Duffield et al.): inclusion
    probability ~ weight (n_chars) without any transcendental — priority =
    (hash(doc) * SCALE) DIV weight, keep the K smallest.  All-integer, so
    the sample is reproducible across engines, restarts and partitionings
    — the property a 100 TB curation pipeline needs from its sampler.
    One map-side expression + one top-K (WindowGroupLimit)."""
    docs = load_documents(spark, sf_dir)
    pr = (
        "(CAST((doc_id * 2654435761) % 1000003 + 1 AS BIGINT) "
        f"* {SAMPLE_W_SCALE}) DIV CAST(greatest(n_chars, 1) AS BIGINT)"
    )
    from pyspark.sql import Window

    d = docs.selectExpr("doc_id", "n_chars", f"{pr} AS priority")
    w = Window.orderBy(F.col("priority").asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_W_K)
        .select("doc_id", "n_chars", "priority")
    )


O_SAMPLE_WEIGHTED = f"""
SELECT doc_id, n_chars, priority FROM (
  SELECT doc_id, n_chars,
         (CAST((doc_id * 2654435761) % 1000003 + 1 AS BIGINT)
          * {SAMPLE_W_SCALE}) // CAST(greatest(n_chars, 1) AS BIGINT) AS priority,
         row_number() OVER (
           ORDER BY (CAST((doc_id * 2654435761) % 1000003 + 1 AS BIGINT)
                     * {SAMPLE_W_SCALE}) // CAST(greatest(n_chars, 1) AS BIGINT) ASC,
                    doc_id ASC) AS rk
  FROM documents
) WHERE rk <= {SAMPLE_W_K}
"""


def q_cms_topk(spark, sf_dir):
    """Count-min-sketch heavy hitters: top-15 tokens by SKETCH estimate
    with the exact count alongside (est >= exact, the one-sided CMS
    guarantee, is itself oracle-checked).  Sketch state is a fixed 4x256
    grid regardless of corpus size — the bounded-state substitute for the
    unbounded distinct-token shuffle at 10^12 docs."""
    from .functions import sketch as _sketch

    return _sketch.cms_topk(load_documents(spark, sf_dir))


def _o_cms_topk() -> str:
    from .functions import sketch as _sketch

    return _sketch.cms_topk_oracle_sql()


def q_hll_distinct(spark, sf_dir):
    """Per-language HLL distinct-token estimate next to the exact count:
    64 exact-integer registers per group (the bounded-state substitute for
    count(DISTINCT token)); the register sum is an exact BIGINT and the
    estimate is one division by a precomputed literal, so even the
    'approximate' sketch is bit-exact across engines."""
    from .functions import sketch as _sketch

    return _sketch.hll_distinct(load_documents(spark, sf_dir))


def _o_hll_distinct() -> str:
    from .functions import sketch as _sketch

    return _sketch.hll_distinct_oracle_sql()


def q_hll_union(spark, sf_dir):
    """HLL mergeability end-to-end: per-(lang, source) partial sketches
    merged by register-wise MAX into per-lang sketches — the lossless
    union that lets 1000 executors sketch their shards independently;
    the merged estimate is IDENTICAL to the single-pass hll_distinct's
    (max of maxes), unit-test-asserted."""
    from .functions import sketch as _sketch

    return _sketch.hll_union(load_documents(spark, sf_dir))


def _o_hll_union() -> str:
    from .functions import sketch as _sketch

    return _sketch.hll_union_oracle_sql()


def q_theta_distinct(spark, sf_dir):
    """Theta (fixed-threshold KMV-style) distinct sketch: per-language
    distinct-bigram estimate from the ~1/16 sampled hash sub-space, exact
    count alongside.  The theta filter runs MAP-SIDE before the distinct
    exchange, and the kept set merges by plain set-union across shards —
    the third sketch family, and the one that supports set operations."""
    from .functions import sketch as _sketch

    return _sketch.theta_distinct(load_documents(spark, sf_dir))


def _o_theta_distinct() -> str:
    from .functions import sketch as _sketch

    return _sketch.theta_distinct_oracle_sql()


def q_theta_jaccard(spark, sf_dir):
    """Pairwise language Jaccard/intersection ESTIMATES from theta
    sketches (the set operation HLL registers cannot express), with exact
    values alongside.  Pairwise work is a posting-list equi-join on the
    hash — never a corpus cross join."""
    from .functions import sketch as _sketch

    return _sketch.theta_jaccard(load_documents(spark, sf_dir))


def _o_theta_jaccard() -> str:
    from .functions import sketch as _sketch

    return _sketch.theta_jaccard_oracle_sql()


def _quality_repetition_sql(dialect: str, docs: str = "documents") -> str:
    """Intra-document repetition signals (the Gopher/RefinedWeb-style
    quality rule): duplicate 3-gram fraction (1 − distinct/total, in
    exact 1/10000 fixed-point so the ratio is integer), the highest
    single-gram multiplicity, and the repetition flag at the standard
    30% threshold.  Pure map-side array algebra over the staged gram
    column — no shuffle until the final (tiny) projection; at 10^12 docs
    this runs inside the scan stage."""
    from .functions.text import ngram_hashes_sql

    grams = ngram_hashes_sql("text", 3, dialect)
    if dialect == "spark":
        distinct_n = "size(array_distinct(grams))"
        total_n = "size(grams)"
        # highest multiplicity via sort + run-length fold (exact integers)
        top_rep = (
            "aggregate(slice(sorted, 2, size(sorted) - 1), "
            "struct(1 AS run, 1 AS best, sorted[0] AS prev), "
            "(acc, g) -> CASE WHEN g = acc.prev THEN "
            "struct(acc.run + 1 AS run, GREATEST(acc.best, acc.run + 1) AS best, g AS prev) "
            "ELSE struct(1 AS run, acc.best AS best, g AS prev) END, "
            "acc -> acc.best)"
        )
        return f"""
SELECT doc_id, total_n, distinct_n,
       CAST((total_n - distinct_n) * 10000 DIV total_n AS BIGINT) AS dup_frac_bp,
       CAST({top_rep} AS BIGINT) AS top_gram_count,
       (total_n - distinct_n) * 10 >= total_n * 3 AS is_repetitive
FROM (
  SELECT doc_id, CAST({distinct_n} AS BIGINT) AS distinct_n,
         CAST({total_n} AS BIGINT) AS total_n,
         array_sort(grams) AS sorted
  FROM (SELECT doc_id, {grams} AS grams FROM {docs})
)
WHERE total_n > 0
"""
    return f"""
WITH g AS (
  SELECT doc_id, unnest({grams}) AS gh FROM {docs}
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS total_n,
         CAST(count(DISTINCT gh) AS BIGINT) AS distinct_n,
         CAST(max(cnt) AS BIGINT) AS top_gram_count
  FROM (SELECT doc_id, gh, count(*) OVER (PARTITION BY doc_id, gh) AS cnt FROM g)
  GROUP BY doc_id
)
SELECT doc_id, total_n, distinct_n,
       CAST((total_n - distinct_n) * 10000 // total_n AS BIGINT) AS dup_frac_bp,
       top_gram_count,
       (total_n - distinct_n) * 10 >= total_n * 3 AS is_repetitive
FROM per
"""


def q_quality_repetition(spark, sf_dir):
    """Repetition-based quality scoring: duplicate-3-gram fraction and
    max gram multiplicity per document, exact integers, map-side."""
    load_documents(spark, sf_dir)
    return spark.sql(_quality_repetition_sql("spark"))


def _text_search_sql(dialect: str) -> str:
    """IR-style retrieval over the corpus: conjunctive AND of three terms
    (posting-list tf counts, docs must match all) plus an exact PHRASE
    count ('table scan') via position-posting intersection — both term
    postings are filtered map-side to their tokens BEFORE the (doc, pos)
    equi-join, so the phrase join touches posting-list-sized inputs, never
    the token stream (the classic phrase-query plan).  Adjacency uses
    pos+1 only, so Spark's 0-based posexplode and DuckDB's 1-based
    ordinality agree without emitting positions."""
    from .functions.text import tokens_sql

    toks = tokens_sql("text", dialect)
    if dialect == "spark":
        pos_src = f"SELECT doc_id, posexplode({toks}) AS (pos, token) FROM documents"
    else:
        # DuckDB has no WITH ORDINALITY; unnest + generate_subscripts over
        # the same list expand in lockstep (same idiom as the CMS oracle)
        pos_src = (
            f"SELECT doc_id, unnest(ts) AS token, generate_subscripts(ts, 1) AS pos "
            f"FROM (SELECT doc_id, {toks} AS ts FROM documents)"
        )
    return f"""
WITH pos AS ({pos_src}),
per AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN token = 'scan' THEN 1 ELSE 0 END) AS BIGINT) AS tf_scan,
         CAST(sum(CASE WHEN token = 'join' THEN 1 ELSE 0 END) AS BIGINT) AS tf_join,
         CAST(sum(CASE WHEN token = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf_window
  FROM pos GROUP BY doc_id
),
pa AS (SELECT doc_id, pos FROM pos WHERE token = 'table'),
pb AS (SELECT doc_id, pos FROM pos WHERE token = 'scan'),
phr AS (
  SELECT pa.doc_id, CAST(count(*) AS BIGINT) AS phrase_cnt
  FROM pa JOIN pb ON pb.doc_id = pa.doc_id AND pb.pos = pa.pos + 1
  GROUP BY 1
)
SELECT p.doc_id, p.tf_scan, p.tf_join, p.tf_window,
       CAST(coalesce(ph.phrase_cnt, 0) AS BIGINT) AS phrase_cnt
FROM per p LEFT JOIN phr ph ON ph.doc_id = p.doc_id
WHERE p.tf_scan > 0 AND p.tf_join > 0 AND p.tf_window > 0
"""


def q_text_search(spark, sf_dir):
    """Conjunctive term search + exact phrase counting over the corpus
    (position-posting intersection — the inverted-index serving plan)."""
    load_documents(spark, sf_dir)
    return spark.sql(_text_search_sql("spark"))


def _media_context_sql(dialect: str, spans_from: str | None = None) -> str:
    """Caption-context extraction for multimodal training: for every MEDIA
    span (image/audio), the nearest text span on each side within the same
    document — the (context, asset, context) triple a captioning or
    interleaved-pretraining pipeline feeds the model.  'Nearest text' is a
    running last/next non-null over the span order, so consecutive media
    spans share their flanking text (correct for interleaved docs where a
    figure run sits inside one passage).  One doc_id window shuffle, two
    passes over the same partitioning."""
    fs = spans_from or synth.flat_spans_sql(dialect)
    txt = "CASE WHEN kind = 'text' THEN span_text END"
    if dialect == "spark":
        prev = (
            f"last({txt}, true) OVER "
            "(PARTITION BY doc_id ORDER BY span_idx "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        )
        nxt = (
            f"first({txt}, true) OVER "
            "(PARTITION BY doc_id ORDER BY span_idx "
            "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)"
        )
    else:
        prev = (
            f"last_value({txt} IGNORE NULLS) OVER "
            "(PARTITION BY doc_id ORDER BY span_idx "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        )
        nxt = (
            f"first_value({txt} IGNORE NULLS) OVER "
            "(PARTITION BY doc_id ORDER BY span_idx "
            "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)"
        )
    return f"""
SELECT doc_id, span_idx, kind, media_ref, prev_text, next_text
FROM (
  SELECT doc_id, span_idx, kind, media_ref,
         {prev} AS prev_text,
         {nxt} AS next_text
  FROM ({fs})
)
WHERE kind IN ('image', 'audio')
"""


def q_media_context(spark, sf_dir):
    """Per media span: flanking text context (interleaved caption
    extraction) — one doc_id window shuffle."""
    load_documents(spark, sf_dir)
    return spark.sql(_media_context_sql("spark"))


def _shuffle_order_sql(dialect: str) -> str:
    """Deterministic global training shuffle: every document gets a
    pseudo-random but REPRODUCIBLE position from an avalanche-remixed hash
    of its id (ties impossible: the affine map is injective mod the
    prime > id domain) — the rank is identical across engines, runs, and
    partitionings, so a resumed training job sees the same data order.
    At 10^12 docs this is a sort by a computed key (range-partitioned
    total order), not a collected permutation."""
    h = "((doc_id * 2654435761 + 40503) % 1000000007)"
    return f"""
SELECT doc_id, shuffle_key,
       CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS position
FROM (SELECT doc_id, CAST({h} AS BIGINT) AS shuffle_key FROM documents)
"""


def q_shuffle_order(spark, sf_dir):
    """Reproducible global shuffle order for training-data emission."""
    load_documents(spark, sf_dir)
    return spark.sql(_shuffle_order_sql("spark"))


def _modality_gini_sql(dialect: str) -> str:
    """Modality-mixing score per document: Gini impurity of the span-kind
    distribution in exact basis points — impurity_bp =
    (10000·(n² − Σ n_k²)) DIV n², pure integer arithmetic (no logs, so no
    transcendental cross-engine risk), 0 for single-modality docs and
    →7500 for a uniform 4-way mix.  The 'how interleaved is this
    document' signal a multimodal sampler stratifies on; one bounded
    aggregate over the span explode."""
    fs = synth.flat_spans_sql(dialect)
    return f"""
WITH per AS (
  SELECT doc_id, kind, CAST(count(*) AS BIGINT) AS nk
  FROM ({fs}) GROUP BY 1, 2
),
agg AS (
  SELECT doc_id,
         CAST(sum(nk) AS BIGINT) AS n,
         CAST(sum(nk * nk) AS BIGINT) AS sq,
         CAST(count(*) AS BIGINT) AS n_kinds
  FROM per GROUP BY 1
)
SELECT doc_id, n, n_kinds,
       CAST((10000 * (n * n - sq)) {'DIV' if dialect == 'spark' else '//'} (n * n)
            AS BIGINT) AS gini_bp
FROM agg
"""


def _spans_integrity_sql(dialect: str) -> str:
    """The input contract (north-rule per-row invariant: span-sequence
    equality of kind/text/media_ref/order) as a first-class CHECK
    operator: per document, whether offsets are the exact 16-byte stride
    in order, whether every media span carries a ref and every text span
    carries text, and the span count — the table a pipeline gate asserts
    ALL-pass on before anything downstream runs.  Pure map-side span
    algebra, one bounded aggregate."""
    fs = synth.flat_spans_sql(dialect)
    return f"""
WITH s AS (
  SELECT doc_id, span_idx, span_offset, kind, span_text, media_ref
  FROM ({fs})
),
chk AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(CASE WHEN span_offset = span_idx * 16 THEN 0 ELSE 1 END)
              AS BIGINT) AS bad_offsets,
         CAST(sum(CASE WHEN kind IN ('image', 'audio')
                        AND (media_ref IS NULL OR media_ref = '') THEN 1
                       ELSE 0 END) AS BIGINT) AS media_missing_ref,
         CAST(sum(CASE WHEN kind = 'text'
                        AND (span_text IS NULL OR span_text = '') THEN 1
                       ELSE 0 END) AS BIGINT) AS text_missing_body
  FROM s GROUP BY doc_id
)
SELECT doc_id, n_spans, bad_offsets, media_missing_ref, text_missing_body,
       (bad_offsets = 0 AND media_missing_ref = 0 AND text_missing_body = 0)
         AS contract_ok
FROM chk
"""


def q_spans_integrity(spark, sf_dir):
    """Span-sequence contract check per document (offset stride, media
    refs present, text bodies present) — the pipeline admission gate."""
    load_documents(spark, sf_dir)
    return spark.sql(_spans_integrity_sql("spark"))


def _asset_topk_sql(dialect: str, k: int = 20) -> str:
    """Hottest media assets by span fan-out: per media_ref the span and
    document counts, top-k with deterministic ties — the CDN/cache
    priming list and the asset-dedup triage view (media_dedup groups
    payload hashes; this ranks the reference graph).  One bounded
    aggregate + a WindowGroupLimit top-k."""
    fs = synth.flat_spans_sql(dialect)
    return f"""
WITH m AS (
  SELECT media_ref, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM ({fs})
  WHERE media_ref IS NOT NULL AND media_ref <> ''
  GROUP BY 1
)
SELECT media_ref, n_spans, n_docs FROM (
  SELECT media_ref, n_spans, n_docs,
         row_number() OVER (ORDER BY n_spans DESC, media_ref) AS rk
  FROM m
) WHERE rk <= {k}
"""


def q_asset_topk(spark, sf_dir):
    """Top-k media assets by span fan-out (exact counts, deterministic
    ties)."""
    load_documents(spark, sf_dir)
    return spark.sql(_asset_topk_sql("spark"))


def q_modality_gini(spark, sf_dir):
    """Exact-integer Gini impurity of span kinds per document — the
    interleaving-degree score for multimodal sampling."""
    load_documents(spark, sf_dir)
    return spark.sql(_modality_gini_sql("spark"))


def q_fingerprint_winnow(spark, sf_dir):
    """Winnowing fingerprints (MOSS-style): distinct min-per-window remixed
    k-gram hashes per document — the positional-guarantee fingerprint
    (any shared token run >= w+k-1 long shares a fingerprint).  Arrow-
    batched token hashing (the ~80x kernel) + row-based sliding-window
    min; the pure-SQL twin is identity-tested and the DuckDB oracle is an
    independent list formulation."""
    from .functions import text as _text

    return _text.winnow_fps_df(load_documents(spark, sf_dir))


def _o_fingerprint_winnow() -> str:
    from .functions import text as _text

    return _text.winnow_fps_query_sql("duck")


def q_fingerprint_overlap(spark, sf_dir):
    """Document pairs sharing >= 2 winnowed fingerprints: posting-list
    equi-join on the fingerprint with a document-frequency cap (shared
    boilerplate fingerprints are noise AND the join's skew pivot).  The
    df-cap rides a count() window on the SAME fp shuffle the self-join
    needs — one fingerprint stream, not a groupBy-and-join-back that
    Spark's CTE inlining would recompute."""
    from .functions import text as _text

    return _text.winnow_overlap_df(load_documents(spark, sf_dir))


def _o_fingerprint_overlap() -> str:
    from .functions import text as _text

    return _text.winnow_overlap_query_sql("duck")


def q_qdigest_quantiles(spark, sf_dir):
    """Q-digest quantile sketch (the 4th sketch family — mergeable
    quantiles): one bounded-cardinality histogram groupBy (<= U rows out
    of the corpus scan), then the deterministic bottom-up compression on
    sketch-sized data driver-side (the HLL-finalize discipline).  Output:
    percentile estimates with the exact quantiles, digest size and n
    alongside, so the rank-error and size guarantees are oracle-checked.
    The DuckDB oracle rebuilds the digest through an independent
    chained-CTE formulation and must match node-for-node."""
    from .functions import qdigest as _qd

    docs = load_documents(spark, sf_dir)
    hist_rows = (
        docs.selectExpr(f"least(greatest(n_chars, 0), {_qd.QD_U - 1}) AS v")
        .groupBy("v")
        .count()
        .collect()  # bounded: <= QD_U rows — sketch state, not data
    )
    counts = {_qd.QD_U + r["v"]: r["count"] for r in hist_rows}
    digest, n, _t = _qd.qdigest_compress(counts)
    hist = sorted((r["v"], r["count"]) for r in hist_rows)
    rows = []
    for q in _qd.QD_QS:
        target = (q * n + 99) // 100
        cum, exact = 0, _qd.QD_U - 1
        for v, c in hist:
            cum += c
            if cum >= target:
                exact = v
                break
        rows.append(
            (q, _qd.qdigest_rank_query(digest, n, q), exact, len(digest), n)
        )
    return spark.createDataFrame(
        rows, "q_pct int, est bigint, exact bigint, digest_size int, n bigint"
    )


def _o_qdigest_quantiles() -> str:
    from .functions import qdigest as _qd

    return _qd.qdigest_oracle_sql()


def q_dedup_cluster(spark, sf_dir):
    """Connected components over the MinHash-LSH near-dup graph: every doc
    labelled with its component's min doc_id (Pregel-style neighbor-min
    propagation; oracle = DuckDB recursive CTE)."""
    return _dedup.dedup_clusters(load_documents(spark, sf_dir))


def q_dedup_canonical(spark, sf_dir):
    """Per near-dup cluster: member count + canonical (kept) document
    (longest text, smallest doc_id on ties) — the dedup pipeline's actual
    kept-set output."""
    return _dedup.dedup_canonical(load_documents(spark, sf_dir))


def q_bloom_prefilter(spark, sf_dir):
    """Bloom-prefiltered decontamination membership: eval-set fingerprints
    → k deterministic probe positions → broadcast set-bit table; every doc
    flagged (bloom_hit, exact_hit).  exact ⊆ bloom; the gap is the
    deterministic false-positive set (filter sized at test scale to
    actually exhibit it)."""
    from .functions.curate import bloom_prefilter

    return bloom_prefilter(load_documents(spark, sf_dir))


def _o_bloom_prefilter() -> str:
    from .functions.curate import bloom_prefilter_oracle_sql

    return bloom_prefilter_oracle_sql()


O_BLOOM_PREFILTER = _o_bloom_prefilter()


def q_dedup_triangles(spark, sf_dir):
    """Per-doc triangle counts in the thresholded near-dup graph —
    triangle density separates true duplicate CLIQUES from chains of
    borderline pairs (a transitive-closure cluster with few triangles is
    probably over-merged).  Degree-oriented wedge join: O(m^1.5) total
    work regardless of hub skew (functions/graph.py:triangle_counts)."""
    from .functions.graph import triangle_counts

    pairs = _dedup.minhash_lsh_pairs(load_documents(spark, sf_dir)).filter(
        f"jaccard >= {_dedup.CLUSTER_JACCARD}"
    )
    return triangle_counts(pairs).withColumnRenamed("node", "doc_id")


def _o_dedup_triangles() -> str:
    from .functions.graph import triangle_counts_oracle_sql

    return triangle_counts_oracle_sql(
        f"SELECT doc_a, doc_b FROM ({O_MINHASH_LSH.strip()}) "
        f"WHERE jaccard >= {_dedup.CLUSTER_JACCARD}",
        out_col="doc_id",
    )


O_DEDUP_TRIANGLES = _o_dedup_triangles()


def q_dedup_cluster_stats(spark, sf_dir):
    """Near-dup cluster size histogram: (cluster_size, n_clusters) — the
    dedup report's headline table (how much of the corpus collapses, and
    into how many groups); singletons included."""
    cl = _dedup.dedup_clusters(load_documents(spark, sf_dir))
    sizes = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count(F.lit(1)).alias("n_clusters"))


def q_sample_stratified(spark, sf_dir):
    """Training-corpus curation: top-K docs per language by quality score,
    stamped with a deterministic content-hash train/val split."""
    from .functions import curate as _curate

    return _curate.stratified_topk(load_documents(spark, sf_dir))


def _o_sample_stratified() -> str:
    from .functions import curate as _curate

    return _curate.stratified_topk_oracle_sql()


O_SAMPLE_STRATIFIED = _o_sample_stratified()


# Gopher-style document quality rules run through the reference's cutflow
# operator (All/Any tree, 3-counter protocol) — selection lineage applied
# to corpus curation (ref: fast_carpenter/selection/filters.py semantics).
QUALITY_SELECTION = {
    "All": [
        "n_tok >= 5",
        "n_chars <= 2000",
        {"Any": ["stop_ratio > 0.05", "lang != 'unk'"]},
        "quality > 0.35",
    ]
}
QUALITY_WEIGHTS = {"quality": "quality"}


def q_quality_adaptive(spark, sf_dir):
    """Adaptive per-language curation threshold: keep documents at or
    above their OWN language's median quality (fixed global cuts
    over-prune low-resource languages — the standard stratified-threshold
    fix).  Exact grouped percentile (Spark `percentile` ≡ DuckDB
    `quantile_cont`, bit-identical — the tile_quantiles precedent), then
    the per-language threshold table is broadcast back: no second shuffle
    of the corpus."""
    from .functions import curate as _curate

    # materialized once (persist/checkpoint on a real cluster): the median
    # pass and the filter pass would otherwise each re-scan the corpus
    df = (
        _curate.quality_scored_df(load_documents(spark, sf_dir))
        .select("doc_id", "lang", "quality")
        .localCheckpoint()
    )
    thr = df.groupBy("lang").agg(F.expr("percentile(quality, 0.5)").alias("thr"))
    return (
        df.join(F.broadcast(thr), "lang")
        .filter(F.col("quality") >= F.col("thr"))
        .select("doc_id", "lang", "quality", "thr")
    )


def _o_quality_adaptive() -> str:
    from .functions import curate as _curate

    return f"""
WITH q AS (SELECT doc_id, lang, quality FROM ({_curate.quality_scored_oracle_sql()})),
t AS (SELECT lang, quantile_cont(quality, 0.5) AS thr FROM q GROUP BY 1)
SELECT doc_id, lang, quality, thr FROM q JOIN t USING (lang)
WHERE quality >= thr
"""


O_QUALITY_ADAPTIVE = _o_quality_adaptive()


def q_lang_quantiles(spark, sf_dir):
    """Per-language document-length profile over the TABLE's ground-truth
    lang column (not the predicted lang-ID, which collapses on the
    synthetic corpus): exact interpolated token-count quantiles (Spark
    `percentile` ≡ DuckDB `quantile_cont`, bit-identical) — the curation
    dashboard's stratified length distribution."""
    from .functions import text as _text

    load_documents(spark, sf_dir)
    n_tok = f"CAST(size({_text.tokens_sql('text', 'spark')}) AS BIGINT)"
    return spark.sql(
        f"""
SELECT lang, count(*) AS n_docs,
       percentile(n_tok, 0.25) AS p25,
       percentile(n_tok, 0.5)  AS p50,
       percentile(n_tok, 0.75) AS p75,
       percentile(n_tok, 0.95) AS p95
FROM (SELECT lang, {n_tok} AS n_tok FROM documents) GROUP BY lang
"""
    )


def _o_lang_quantiles() -> str:
    from .functions import text as _text

    n_tok = f"CAST(len({_text.tokens_sql('text', 'duck')}) AS BIGINT)"
    return f"""
SELECT lang, count(*) AS n_docs,
       quantile_cont(n_tok, 0.25) AS p25,
       quantile_cont(n_tok, 0.5)  AS p50,
       quantile_cont(n_tok, 0.75) AS p75,
       quantile_cont(n_tok, 0.95) AS p95
FROM (SELECT lang, {n_tok} AS n_tok FROM documents) GROUP BY lang
"""


O_LANG_QUANTILES = _o_lang_quantiles()


def q_source_profile(spark, sf_dir):
    """Per-source corpus profile: doc count, median quality score, median
    token count — medians are exact interpolated percentiles (hash-safe
    where a mean of arbitrary doubles would be order-dependent)."""
    from .functions import curate as _curate

    scored = _curate.quality_scored_df(load_documents(spark, sf_dir)).select(
        "doc_id", "n_tok", "quality"
    )
    docs = load_documents(spark, sf_dir).select("doc_id", "source")
    docs.join(scored, "doc_id").createOrReplaceTempView("_src_scored")
    return spark.sql(
        """
SELECT source, count(*) AS n_docs,
       percentile(quality, 0.5) AS q_med,
       percentile(n_tok, 0.5) AS tok_med
FROM _src_scored GROUP BY source
"""
    )


def _o_source_profile() -> str:
    from .functions import curate as _curate

    return f"""
SELECT d.source, count(*) AS n_docs,
       quantile_cont(s.quality, 0.5) AS q_med,
       quantile_cont(s.n_tok, 0.5) AS tok_med
FROM documents d JOIN ({_curate.quality_scored_oracle_sql()}) s USING (doc_id)
GROUP BY d.source
"""


O_SOURCE_PROFILE = _o_source_profile()


def q_quality_cutflow(spark, sf_dir):
    """Per-rule pass/fail counters (weighted by the quality score) for the
    curation rule tree — the data-pipeline reuse of the HEP cutflow."""
    from .functions import curate as _curate

    df = _curate.quality_scored_df(load_documents(spark, sf_dir))
    stage = CutFlowStage(
        name="quality", selection=QUALITY_SELECTION, weights=QUALITY_WEIGHTS
    )
    return stage.counters(df)


def _o_quality_cutflow() -> str:
    from .expressions import compile_expression
    from .functions import curate as _curate

    tree = parse_selection(QUALITY_SELECTION)
    _, specs = compile_tree(tree, lambda node: compile_expression(node.config))
    return oracle_counters_sql(
        specs, _curate.quality_scored_oracle_sql(), QUALITY_WEIGHTS
    )


O_QUALITY_CUTFLOW = _o_quality_cutflow()


def q_quality_filter(spark, sf_dir):
    """Documents surviving the quality rule tree — the curation keep-set."""
    from .functions import curate as _curate

    df = _curate.quality_scored_df(load_documents(spark, sf_dir))
    stage = CutFlowStage(name="quality", selection=QUALITY_SELECTION)
    return stage.apply(df).select("doc_id", "lang", "n_tok", "quality")


def _o_quality_filter() -> str:
    from .expressions import compile_expression
    from .functions import curate as _curate

    tree = parse_selection(QUALITY_SELECTION)
    mask, _ = compile_tree(tree, lambda node: compile_expression(node.config))
    return (
        f"SELECT doc_id, lang, n_tok, quality "
        f"FROM ({_curate.quality_scored_oracle_sql()}) WHERE {mask}"
    )


O_QUALITY_FILTER = _o_quality_filter()


def q_quality_constraints(spark, sf_dir):
    """Deequ-style data-quality audit: completeness / uniqueness / range /
    domain / cross-column consistency in ONE corpus scan + a constant
    5-row unpivot (no per-check rescans); the exact-uniqueness distinct
    shuffle is the only non-map-side piece."""
    from .functions import curate as _curate

    return _curate.constraints_audit(load_documents(spark, sf_dir))


def q_text_redact(spark, sf_dir):
    """Deny-list scrubbing: word-bounded dictionary redaction with per-doc
    hit counts — a zero-shuffle map-side rewrite of the corpus."""
    from .functions import curate as _curate

    return _curate.redact(load_documents(spark, sf_dir))


def _o_quality_constraints() -> str:
    from .functions import curate as _curate

    return _curate.constraints_audit_oracle_sql()


def _o_text_redact() -> str:
    from .functions import curate as _curate

    return _curate.redact_oracle_sql()


O_QUALITY_CONSTRAINTS = _o_quality_constraints()
O_TEXT_REDACT = _o_text_redact()


def q_decontaminate(spark, sf_dir):
    """Eval-set decontamination: per-eval-doc n-gram overlap with the
    candidate corpus (one shingle-keyed join; eval side broadcast-small
    at production scale)."""
    from .functions import curate as _curate

    return _curate.decontaminate(load_documents(spark, sf_dir))


def _o_decontaminate() -> str:
    from .functions import curate as _curate

    return _curate.decontaminate_oracle_sql()


O_DECONTAMINATE = _o_decontaminate()


def q_tfidf_topk(spark, sf_dir):
    """Per-document top TF-IDF terms (ratio-form idf: exact cross-engine
    doubles, no log ulps) — the vocabulary-characterization pass."""
    from .functions import curate as _curate

    return _curate.tfidf_topk(load_documents(spark, sf_dir))


def _o_tfidf_topk() -> str:
    from .functions import curate as _curate

    return _curate.tfidf_topk_oracle_sql()


O_TFIDF_TOPK = _o_tfidf_topk()


def _o_cluster_cte() -> str:
    """Shared recursive-CTE prefix: min-label connected components of the
    thresholded MinHash pair graph.  reach(node, lbl) enumerates labels
    lbl < node reachable from node; pruning on lbl < src keeps the
    fixpoint at O(sum of component^2) rows while still delivering every
    component's global min to every member (the min m reaches n along any
    path because m < v holds at each hop)."""
    return f"""
pairs AS (SELECT doc_a, doc_b FROM ({O_MINHASH_LSH.strip()}) WHERE jaccard >= {_dedup.CLUSTER_JACCARD}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(node, lbl) AS (
  SELECT src, dst FROM edges WHERE dst < src
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst WHERE r.lbl < e.src
),
cl AS (
  SELECT d.doc_id, COALESCE(min(r.lbl), d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN reach r ON r.node = d.doc_id
  GROUP BY d.doc_id
)
"""


O_DEDUP_CLUSTER = f"WITH RECURSIVE {_o_cluster_cte()} SELECT doc_id, cluster_id FROM cl"

O_DEDUP_CLUSTER_STATS = f"""
WITH RECURSIVE {_o_cluster_cte()},
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY 1)
SELECT cluster_size, count(*) AS n_clusters FROM sizes GROUP BY 1
"""

O_DEDUP_CANONICAL = f"""
WITH RECURSIVE {_o_cluster_cte()},
m AS (SELECT cl.doc_id, cl.cluster_id, CAST(length(d.text) AS BIGINT) AS _len
      FROM cl JOIN documents d USING (doc_id)),
r2 AS (SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY _len DESC, doc_id) AS rn FROM m)
SELECT c.cluster_id, c.n_members, k.kept_doc, k.kept_len
FROM (SELECT cluster_id, count(*) AS n_members FROM m GROUP BY cluster_id) c
JOIN (SELECT cluster_id, doc_id AS kept_doc, _len AS kept_len FROM r2 WHERE rn = 1) k USING (cluster_id)
"""


def q_events_asof(spark, sf_dir):
    """Backward as-of join (last-touch attribution): every purchase event
    matched to the user's most recent preceding view.  Union-merge
    implementation (functions/asof.py) — ONE user_id shuffle, no range
    theta join; oracle is DuckDB's native ASOF LEFT JOIN, an independent
    implementation of the same semantics."""
    from .functions.asof import asof_join

    ev = _load_events(spark, sf_dir)
    epoch = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {})"
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    joined = asof_join(left, right, by="user_id", on="ts", right_cols=["view_id"])
    return joined.select(
        "event_id",
        "user_id",
        F.expr(epoch.format("ts")).alias("ts_us"),
        "value",
        F.col("view_id_r").alias("view_id"),
    )


O_EVENTS_ASOF = """
SELECT l.event_id, l.user_id,
       CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
       l.value,
       r.event_id AS view_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


ASOF_TOL_US = 2 * 3_600_000_000  # 2 h attribution window


def q_events_asof_tol(spark, sf_dir):
    """As-of join with a staleness tolerance: a purchase only attributes
    to its most recent preceding view when that view is within
    ASOF_TOL_US (stale matches become NULL, the standard bounded
    last-touch).  Same one-shuffle union-merge core; the tolerance is a
    post-predicate on the matched timestamp."""
    from .functions.asof import asof_join

    ev = _load_events(spark, sf_dir)
    epoch = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {})"
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.expr(epoch.format("ts")).alias("view_ts_us"),
    )
    joined = asof_join(
        left, right, by="user_id", on="ts", right_cols=["view_id", "view_ts_us"]
    )
    fresh = f"(ts_us - view_ts_us_r) <= {ASOF_TOL_US}"
    return joined.withColumn("ts_us", F.expr(epoch.format("ts"))).selectExpr(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        f"CASE WHEN {fresh} THEN view_id_r END AS view_id",
        f"CASE WHEN {fresh} THEN ts_us - view_ts_us_r END AS staleness_us",
    )


O_EVENTS_ASOF_TOL = f"""
WITH a AS (
  SELECT l.event_id, l.user_id,
         CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
         l.value,
         r.event_id AS view_id,
         CAST(epoch_us(r.ts) AS BIGINT) AS view_ts_us
  FROM (SELECT * FROM events WHERE event_type = 'purchase') l
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
    ON l.user_id = r.user_id AND l.ts >= r.ts
)
SELECT event_id, user_id, ts_us, value,
       CASE WHEN ts_us - view_ts_us <= {ASOF_TOL_US} THEN view_id END AS view_id,
       CASE WHEN ts_us - view_ts_us <= {ASOF_TOL_US} THEN ts_us - view_ts_us END
         AS staleness_us
FROM a
"""


def q_media_dedup(spark, sf_dir):
    """Asset-level exact dedup: media references shared across documents
    (the media twin of text dedup_exact) — per duplicated asset, how many
    docs/spans reuse it and the canonical (min) owning doc."""
    df = flat_spans(spark, sf_dir).filter("media_ref IS NOT NULL")
    return (
        df.groupBy("media_ref")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_spans"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


O_MEDIA_DEDUP = f"""
SELECT media_ref, count(DISTINCT doc_id) AS n_docs, count(*) AS n_spans,
       min(doc_id) AS canonical_doc
FROM ({O_SPANS_FLAT})
WHERE media_ref IS NOT NULL
GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
"""


# ---------------------------------------------------------------------------
# training-data shaping: geofence transitions, sequence packing, chunking
# ---------------------------------------------------------------------------

SEQ_LEN = 512  # tokens per packed training sequence
CHUNK_SIZE = 256  # chars per context chunk
CHUNK_STEP = 192  # 25% overlap between consecutive chunks


def q_tile_bfs(spark, sf_dir):
    """Hop-distance field (isochrone-lite): BFS over the dense-cell
    8-adjacency graph from the DENSEST cell (ties -> min id; the min-id
    cell can be an isolated singleton) — Pregel min-dist propagation
    (functions/graph.py bfs_hops); unreachable regions are absent by
    definition."""
    from .functions.graph import bfs_hops

    dense, edges = _dense_cells_edges(spark, sf_dir)
    seed = dense.orderBy(F.desc("n"), "cell").first()["cell"]
    return bfs_hops(dense.select("cell"), edges, seed=seed, node_col="cell")


def _o_tile_bfs() -> str:
    from .functions.graph import bfs_cte_sql

    cell = grid.cell_sql("lon", "lat", REGION_CC_RES, "duck")
    ux = lambda e: grid.unpack_x_sql(e, "duck")  # noqa: E731
    uy = lambda e: grid.unpack_y_sql(e, "duck")  # noqa: E731
    edges_sql = f"""SELECT a.cell AS src, b.cell AS dst FROM dense a JOIN dense b
  ON a.cell <> b.cell
 AND abs({ux('a.cell')} - {ux('b.cell')}) <= 1
 AND abs({uy('a.cell')} - {uy('b.cell')}) <= 1"""
    cte = bfs_cte_sql(
        edges_sql, "SELECT cell FROM dense ORDER BY n DESC, cell LIMIT 1", "cell"
    )
    return f"""
WITH RECURSIVE
dense AS (SELECT {cell} AS cell, count(*) AS n FROM ({O_SPANS_FLAT})
          GROUP BY 1 HAVING count(*) >= {REGION_CC_MIN}),
{cte}
SELECT cell, hops FROM hops
"""


O_TILE_BFS = _o_tile_bfs()


KCORE_K = 3


def q_tile_kcore(spark, sf_dir):
    """k-core of the dense-cell 8-adjacency graph (k=3): the maximal
    subgraph where every cell keeps >= 3 dense neighbours — the
    'structurally hot' interior that survives when fringe cells peel away,
    a sturdier hotspot definition than any single-cell threshold.
    Iterative peel to the unique fixpoint (functions/graph.kcore), output
    (cell, in-core degree); the oracle unrolls the peel to a fixed depth,
    safe past the fixpoint by idempotence."""
    from .functions.graph import kcore

    dense, edges = _dense_cells_edges(spark, sf_dir)
    core, _rounds = kcore(dense.select("cell"), edges, KCORE_K, node_col="cell")
    return core


def _o_tile_kcore() -> str:
    from .functions.graph import kcore_cte_sql

    cell = grid.cell_sql("lon", "lat", REGION_CC_RES, "duck")
    ux = lambda e: grid.unpack_x_sql(e, "duck")  # noqa: E731
    uy = lambda e: grid.unpack_y_sql(e, "duck")  # noqa: E731
    edges_sql = f"""SELECT a.cell AS src, b.cell AS dst FROM dense a JOIN dense b
  ON a.cell <> b.cell
 AND abs({ux('a.cell')} - {ux('b.cell')}) <= 1
 AND abs({uy('a.cell')} - {uy('b.cell')}) <= 1"""
    cte = kcore_cte_sql(edges_sql, "SELECT cell FROM dense", KCORE_K, "cell")
    # AS MATERIALIZED: without it DuckDB inlines `dense`/`eg` into every
    # unrolled round, re-opening the parquet per reference until the fd
    # limit trips (duck-only syntax; this SQL never runs on Spark)
    return f"""
WITH dense AS MATERIALIZED (SELECT {cell} AS cell, count(*) AS n FROM ({O_SPANS_FLAT})
          GROUP BY 1 HAVING count(*) >= {REGION_CC_MIN}),
{cte}
SELECT cell, deg FROM core
"""


def q_tile_pagerank(spark, sf_dir):
    """Damped PageRank centrality over the dense-cell 8-adjacency graph —
    which hot tiles are CONNECTORS of the hot region structure, not just
    locally dense.  Integer fixed-point recurrence (pr DIV deg, BIGINT
    sums), so the iterative kernel is bit-exact across engines and
    aggregation orders — the float-free pattern that makes iterative
    graph/ML jobs verifiable and restartable (functions/graph.py
    pagerank)."""
    from .functions.graph import pagerank

    dense, edges = _dense_cells_edges(spark, sf_dir)
    return pagerank(dense.select("cell"), edges, node_col="cell")


def _o_tile_pagerank() -> str:
    from .functions.graph import pagerank_cte_sql

    cell = grid.cell_sql("lon", "lat", REGION_CC_RES, "duck")
    ux = lambda e: grid.unpack_x_sql(e, "duck")  # noqa: E731
    uy = lambda e: grid.unpack_y_sql(e, "duck")  # noqa: E731
    edges_sql = f"""SELECT a.cell AS src, b.cell AS dst FROM dense a JOIN dense b
  ON a.cell <> b.cell
 AND abs({ux('a.cell')} - {ux('b.cell')}) <= 1
 AND abs({uy('a.cell')} - {uy('b.cell')}) <= 1"""
    cte = pagerank_cte_sql(edges_sql, "SELECT cell FROM dense", "cell")
    return f"""
WITH dense AS (SELECT {cell} AS cell, count(*) AS n FROM ({O_SPANS_FLAT})
          GROUP BY 1 HAVING count(*) >= {REGION_CC_MIN}),
{cte}
SELECT cell, pr FROM prf
"""


O_TILE_PAGERANK = _o_tile_pagerank()


# Congestion-weighted routing over the dense-cell graph: traversing INTO a
# cell costs 1 + min(n DIV 64, 3) — denser tiles are slower, so the weighted
# shortest path routes AROUND hotspots where the unweighted BFS cuts through.
# Integer weights keep the min-plus kernel aggregation-order-exact.
SSSP_WEIGHT_SPARK = "CAST(1 + LEAST(n DIV 64, 3) AS BIGINT)"
SSSP_WEIGHT_DUCK = "CAST(1 + LEAST(b.n // 64, 3) AS BIGINT)"
# res-5 grid: longest simple path <= 2*32 hops, max edge weight 4 -> 256;
# 512 gives slack while keeping the oracle's (node, d) working set bounded.
SSSP_MAX_COST = 512


def _weighted_dense_edges(spark, sf_dir):
    dense, edges = _dense_cells_edges(spark, sf_dir)
    w_edges = edges.join(
        dense.select(F.col("cell").alias("dst"), "n"), "dst"
    ).select("src", "dst", F.expr(SSSP_WEIGHT_SPARK).alias("w"))
    return dense, w_edges


def q_tile_sssp(spark, sf_dir):
    """Congestion-weighted single-source shortest paths from the densest
    cell over the dense-cell 8-adjacency graph — Bellman-Ford min-plus
    propagation with exact integer weights (functions/graph.py sssp), the
    weighted sibling of tile_bfs.  Rounds = hop length of the longest
    shortest path, each round one dst-keyed join + min aggregate."""
    from .functions.graph import sssp

    dense, w_edges = _weighted_dense_edges(spark, sf_dir)
    seed = dense.orderBy(F.desc("n"), "cell").first()["cell"]
    return sssp(dense.select("cell"), w_edges, seed=seed, node_col="cell")


def _sssp_oracle_body() -> str:
    from .functions.graph import sssp_cte_sql

    cell = grid.cell_sql("lon", "lat", REGION_CC_RES, "duck")
    ux = lambda e: grid.unpack_x_sql(e, "duck")  # noqa: E731
    uy = lambda e: grid.unpack_y_sql(e, "duck")  # noqa: E731
    edges_sql = f"""SELECT a.cell AS src, b.cell AS dst, {SSSP_WEIGHT_DUCK} AS w
  FROM dense a JOIN dense b
  ON a.cell <> b.cell
 AND abs({ux('a.cell')} - {ux('b.cell')}) <= 1
 AND abs({uy('a.cell')} - {uy('b.cell')}) <= 1"""
    cte = sssp_cte_sql(
        edges_sql,
        "SELECT cell FROM dense ORDER BY n DESC, cell LIMIT 1",
        "cell",
        max_cost=SSSP_MAX_COST,
    )
    return f"""
WITH RECURSIVE
dense AS (SELECT {cell} AS cell, count(*) AS n FROM ({O_SPANS_FLAT})
          GROUP BY 1 HAVING count(*) >= {REGION_CC_MIN}),
{cte}"""


def _o_tile_sssp() -> str:
    return _sssp_oracle_body() + "\nSELECT cell, dist FROM dists\n"


O_TILE_SSSP = _o_tile_sssp()


def q_tile_isochrone(spark, sf_dir):
    """Isochrone bands over the congestion-weighted distance field: band =
    dist DIV 8, with cell count and exact distance envelope per band — the
    reachability contour a routing service draws.  Rides the tile_sssp
    kernel; the banding is one bounded-cardinality aggregate."""
    d = q_tile_sssp(spark, sf_dir)
    return d.groupBy(F.expr("dist DIV 8").alias("band")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("dist").alias("d_min"),
        F.max("dist").alias("d_max"),
    )


def _o_tile_isochrone() -> str:
    return _sssp_oracle_body() + """
SELECT dist // 8 AS band, CAST(count(*) AS BIGINT) AS n_cells,
       min(dist) AS d_min, max(dist) AS d_max
FROM dists GROUP BY 1
"""


O_TILE_ISOCHRONE = _o_tile_isochrone()


def q_geofence_transitions(spark, sf_dir):
    """Geofence enter/exit detection along each document's span trajectory:
    label every span point with the polygon it falls in (min poly_id when
    polygons overlap, 'outside' when none), then emit one row per consecutive
    span pair whose label CHANGES — the region entry/exit event stream.

    Plan shape at scale: the PIP labelling is the broadcast cell-cover
    join (polygon side is the small one), the min-label dedup is a partial
    agg on (doc_id, span_offset), and the transition detection is one
    window pass keyed by doc_id — span counts per document are bounded, so
    the window partition can never be skewed by data volume."""
    from .spatial.geofence import span_labels, transitions_within

    df = flat_spans(spark, sf_dir)
    return transitions_within(span_labels(df, synth.polygons()))


def q_geofence_dwell(spark, sf_dir):
    """Dwell statistics per geofence region: contiguous same-label RUNS
    along each span trajectory (gaps-and-islands: island key = span_idx −
    row_number within (doc, label)), rolled up per region — visits, docs,
    total span-steps inside, and the longest single stay.  Span steps are
    the trajectory's native time unit (spans are offset-ordered); the run
    detection is ONE more window pass on the SAME doc_id shuffle the
    labelling already pays."""
    from pyspark.sql import Window as W

    from .spatial.geofence import span_labels

    labels = span_labels(flat_spans(spark, sf_dir), synth.polygons())
    w = W.partitionBy("doc_id", "lbl").orderBy("span_idx")
    runs = (
        labels.withColumn(
            "isl", F.col("span_idx") - F.row_number().over(w)
        )
        .groupBy("doc_id", "lbl", "isl")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.filter(F.col("lbl") != "outside")
        .groupBy("lbl")
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("run_len").alias("total_steps"),
            F.max("run_len").alias("max_stay"),
        )
    )


def _o_geofence_dwell() -> str:
    return f"""
WITH m AS ({O_PIP_JOIN.strip()}),
lab AS (
  SELECT p.doc_id, p.span_idx,
         COALESCE(min(m.poly_id), 'outside') AS lbl
  FROM ({O_SPANS_FLAT}) p
  LEFT JOIN m ON m.doc_id = p.doc_id AND m.span_offset = p.span_offset
  GROUP BY 1, 2
),
isl AS (
  SELECT doc_id, lbl,
         span_idx - row_number() OVER (
           PARTITION BY doc_id, lbl ORDER BY span_idx
         ) AS isl
  FROM lab
),
runs AS (
  SELECT doc_id, lbl, isl, CAST(count(*) AS BIGINT) AS run_len
  FROM isl GROUP BY 1, 2, 3
)
SELECT lbl, CAST(count(*) AS BIGINT) AS n_visits,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(run_len) AS BIGINT) AS total_steps,
       CAST(max(run_len) AS BIGINT) AS max_stay
FROM runs WHERE lbl <> 'outside' GROUP BY 1
"""


def _o_geofence_transitions() -> str:
    return f"""
WITH m AS ({O_PIP_JOIN.strip()}),
lab AS (
  SELECT p.doc_id, p.span_idx,
         COALESCE(min(m.poly_id), 'outside') AS lbl
  FROM ({O_SPANS_FLAT}) p
  LEFT JOIN m ON m.doc_id = p.doc_id AND m.span_offset = p.span_offset
  GROUP BY 1, 2
),
t AS (
  SELECT doc_id, span_idx, lbl,
         lag(lbl) OVER (PARTITION BY doc_id ORDER BY span_idx) AS prev_lbl
  FROM lab
)
SELECT doc_id, span_idx, prev_lbl AS from_poly, lbl AS to_poly
FROM t WHERE prev_lbl IS NOT NULL AND prev_lbl <> lbl
"""


O_GEOFENCE_TRANSITIONS = _o_geofence_transitions()


def q_geofence_flows(spark, sf_dir):
    """Region-to-region flow matrix: geofence transition events aggregated
    to (from_poly → to_poly) counts — the polygon-level OD companion of
    tile_flow, one extra tiny aggregate on the transition stream."""
    return (
        q_geofence_transitions(spark, sf_dir)
        .groupBy("from_poly", "to_poly")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


O_GEOFENCE_FLOWS = f"""
SELECT from_poly, to_poly, count(*) AS n_transitions
FROM ({O_GEOFENCE_TRANSITIONS})
GROUP BY 1, 2
"""


def q_streaming_geofence(spark, sf_dir):
    """Streaming geofence transitions drained with availableNow: the span
    table is re-written as contiguous (span_idx, doc_id) range slices, so
    every document's trajectory is SPLIT across micro-batches; per-batch
    within-slice transitions + boundary fragments, seam-merged at read
    time, must equal the batch operator EXACTLY (same oracle).  Slice
    processing order is irrelevant (out-of-order backfill safe)."""
    import tempfile

    from .streaming.geofence_stream import StreamingGeofence

    df = flat_spans(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="fcs_gf_in_")
    df.repartitionByRange(4, "span_idx", "doc_id").write.mode("overwrite").parquet(d)
    stage = StreamingGeofence(
        name="gfq",
        polygons=synth.polygons(),
        out_dir=tempfile.mkdtemp(prefix="fcs_gf_out_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="fcs_gf_ckpt_"),
    )
    q = stage.start(spark, d, available_now=True)
    _drain(q)
    return stage.result(spark)


def q_streaming_join(spark, sf_dir):
    """Native STREAM-STREAM interval join (views ⋈ clicks per user within
    1 hour), watermarked state-store eviction on both sides, append sink,
    drained with availableNow — must equal the batch interval join
    EXACTLY.  State ~ rate × window, not stream length (the finite-state
    property watermarks buy on unbounded streams)."""
    import tempfile

    from .streaming.join_stream import StreamingIntervalJoin

    ev = _load_events(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="fcs_ssj_in_")
    ev.write.mode("overwrite").parquet(d)
    stage = StreamingIntervalJoin(
        name="ssjq",
        out_dir=tempfile.mkdtemp(prefix="fcs_ssj_out_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="fcs_ssj_ckpt_"),
    )
    q = stage.start(spark, d, available_now=True)
    _drain(q)
    return stage.result(spark)


def _o_streaming_join() -> str:
    from .streaming.join_stream import interval_join_oracle_sql

    return interval_join_oracle_sql()


_ENRICH_LANGS = ["en", "de", "fr", "es", "zh", "ja", "ru", "pt"]


def q_streaming_enrich(spark, sf_dir):
    """Streaming dimension enrichment drained with availableNow: docs
    stream in file-sized micro-batches, each batch broadcast-joined to the
    dim read fresh per batch (pinned SCD semantics —
    streaming/enrich_stream.py); with the dim static over the drain the
    merged result must equal the plain batch join exactly.  Mid-stream
    dim updates + exactly-once are pinned in tests/test_streaming.py."""
    import tempfile

    from .streaming.enrich_stream import StreamingEnrich

    docs = load_documents(spark, sf_dir).select("doc_id", "lang")
    d_in = tempfile.mkdtemp(prefix="fcs_enr_in_")
    docs.repartition(4, "doc_id").write.mode("overwrite").parquet(d_in)
    dim_path = tempfile.mkdtemp(prefix="fcs_enr_dim_")
    spark.createDataFrame(
        [(lang, f"label_{lang}") for lang in _ENRICH_LANGS],
        "lang string, lang_label string",
    ).write.mode("overwrite").parquet(dim_path)
    stage = StreamingEnrich(
        name="enrq",
        dim_path=dim_path,
        on="lang",
        out_dir=tempfile.mkdtemp(prefix="fcs_enr_out_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="fcs_enr_ckpt_"),
    )
    q = stage.start(spark, d_in, available_now=True)
    _drain(q)
    return stage.result(spark).drop("_batch")


def _o_streaming_enrich() -> str:
    rows = ", ".join(f"('{lang}', 'label_{lang}')" for lang in _ENRICH_LANGS)
    return f"""
SELECT d.doc_id, d.lang, t.lang_label
FROM documents d JOIN (VALUES {rows}) AS t(lang, lang_label) USING (lang)
"""


O_STREAMING_ENRICH = _o_streaming_enrich()


def q_seq_pack(spark, sf_dir):
    """Concat-and-chunk training-sequence packing: documents in doc_id
    order are conceptually concatenated token-wise and cut into fixed
    SEQ_LEN sequences; each document gets its (seq_id, seq_offset)
    placement.  The global running token count comes from the two-pass
    distributed prefix scan (functions/pack.py) — NO single-partition
    global window anywhere in the plan."""
    from .functions.pack import global_prefix_sum

    from .functions import text as _text

    df = load_documents(spark, sf_dir).selectExpr(
        "doc_id",
        f"CAST(size({_text.tokens_sql('text', 'spark')}) AS BIGINT) AS n_tok",
    )
    packed = global_prefix_sum(df, "doc_id", "n_tok", out_col="tok_before")
    return packed.select(
        "doc_id",
        "n_tok",
        "tok_before",
        F.expr(f"tok_before DIV {SEQ_LEN}").alias("seq_id"),
        (F.col("tok_before") % SEQ_LEN).alias("seq_offset"),
    )


O_SEQ_PACK = f"""
WITH tok AS (
  SELECT doc_id,
         CAST(len({{tokens}}) AS BIGINT) AS n_tok
  FROM documents
),
scan AS (
  -- CAST: DuckDB widens SUM(BIGINT) to HUGEINT, which pandas renders as
  -- float64 and the value hash sees as a different type at equal values
  SELECT doc_id, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_before
  FROM tok
)
SELECT doc_id, n_tok, tok_before,
       tok_before // {SEQ_LEN} AS seq_id,
       tok_before % {SEQ_LEN} AS seq_offset
FROM scan
"""


def _o_seq_pack() -> str:
    from .functions import text as _text

    return O_SEQ_PACK.format(tokens=_text.tokens_sql("text", "duck"))


def q_doc_chunks(spark, sf_dir):
    """Overlapping context-window chunking (RAG/pretraining chunker):
    every document is cut into CHUNK_SIZE-char windows advancing by
    CHUNK_STEP (25% overlap).  Pure explode + substr — map-side only, no
    shuffle at all; chunk boundaries are character-deterministic so the
    output is reproducible under any partitioning."""
    df = load_documents(spark, sf_dir)
    return (
        df.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(0, n_chars - 1, {CHUNK_STEP})")
            ).alias("start"),
            "text",
        )
        .select(
            "doc_id",
            F.expr(f"start DIV {CHUNK_STEP}").alias("chunk_idx"),
            "start",
            F.expr(f"substr(text, start + 1, {CHUNK_SIZE})").alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


O_DOC_CHUNKS = f"""
SELECT doc_id,
       start // {CHUNK_STEP} AS chunk_idx,
       start,
       substr(text, CAST(start + 1 AS INT), {CHUNK_SIZE}) AS chunk_text,
       CAST(len(substr(text, CAST(start + 1 AS INT), {CHUNK_SIZE})) AS INT) AS chunk_len
FROM (
  SELECT doc_id, text, unnest(generate_series(0, n_chars - 1, {CHUNK_STEP})) AS start
  FROM documents WHERE n_chars > 0
)
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    # Driver-sample rotation (round 3): the correctness driver checks the
    # FIRST 50 insertion-order entries each round.  The 45 entries below
    # have no driver-green row from rounds 1-2 (dedup_simhash -- the only
    # ever-red row, fixed in 81b9041 -- leads), so this round's sample
    # clears them; the 80 entries after already have a green driver row
    # (CORRECTNESS_r01/r02).  Rotate again next round.
    "dedup_simhash": (q_simhash, O_SIMHASH),
    "jagged_nested": (q_jagged_nested, O_JAGGED_NESTED),
    "pip_join_salted": (q_pip_join_salted, O_PIP_JOIN),
    "pip_holes": (q_pip_holes, O_PIP_HOLES),
    "radius_join_geo": (q_radius_join_geo, O_RADIUS_JOIN_GEO),
    "dbscan": (q_dbscan, O_DBSCAN),
    "poly_metrics": (q_poly_metrics, O_POLY_METRICS),
    "poly_regions": (q_poly_regions, O_POLY_REGIONS),
    "segment_join": (q_segment_join, O_SEGMENT_JOIN),
    "knn_geo": (q_knn_geo, O_KNN_GEO),
    "poly_overlap": (q_poly_overlap, O_POLY_OVERLAP),
    "knn_kdist": (q_knn_kdist, O_KNN_KDIST),
    "knn_mutual": (q_knn_mutual, O_KNN_MUTUAL),
    "raster_focal": (q_raster_focal, O_RASTER_FOCAL),
    "idw_interp": (q_idw_interp, O_IDW_INTERP),
    "skyline": (q_skyline, O_SKYLINE),
    "dedup_simhash_pairs": (q_simhash_pairs, O_SIMHASH_PAIRS),
    "dedup_cluster": (q_dedup_cluster, O_DEDUP_CLUSTER),
    "sample_stratified": (q_sample_stratified, O_SAMPLE_STRATIFIED),
    "tfidf_topk": (q_tfidf_topk, O_TFIDF_TOPK),
    "quality_cutflow": (q_quality_cutflow, O_QUALITY_CUTFLOW),
    "quality_filter": (q_quality_filter, O_QUALITY_FILTER),
    "quality_adaptive": (q_quality_adaptive, O_QUALITY_ADAPTIVE),
    "lang_quantiles": (q_lang_quantiles, O_LANG_QUANTILES),
    "source_profile": (q_source_profile, O_SOURCE_PROFILE),
    "decontaminate": (q_decontaminate, O_DECONTAMINATE),
    "bloom_prefilter": (q_bloom_prefilter, O_BLOOM_PREFILTER),
    "dedup_canonical": (q_dedup_canonical, O_DEDUP_CANONICAL),
    "dedup_triangles": (q_dedup_triangles, O_DEDUP_TRIANGLES),
    "dedup_cluster_stats": (q_dedup_cluster_stats, O_DEDUP_CLUSTER_STATS),
    "token_topk": (q_token_topk, O_TOKEN_TOPK),
    "bigram_topk": (q_bigram_topk, O_BIGRAM_TOPK),
    "modality_profile": (q_modality_profile, O_MODALITY_PROFILE),
    "ann_lsh_rerank": (q_ann_lsh_rerank, O_ANN_LSH_RERANK),
    "ann_rerank_recall": (q_ann_rerank_recall, O_ANN_RERANK_RECALL),
    "ann_ivf_assign": (q_ann_ivf_assign, O_ANN_IVF_ASSIGN),
    "ann_ivf_centroids": (q_ann_ivf_centroids, O_ANN_IVF_CENTROIDS),
    "ann_label_purity": (q_ann_label_purity, O_ANN_LABEL_PURITY),
    "ann_ivf_reassign": (q_ann_ivf_reassign, O_ANN_IVF_REASSIGN),
    "ann_ivf_topk": (q_ann_ivf_topk, O_ANN_IVF_TOPK),
    "ann_ivf_recall": (q_ann_ivf_recall, O_ANN_IVF_RECALL),
    "dedup_consensus": (q_dedup_consensus, O_DEDUP_CONSENSUS),
    "tile_cooccur": (q_tile_cooccur, O_TILE_COOCCUR),
    "media_text_align": (q_media_text_align, O_MEDIA_TEXT_ALIGN),
    "dedup_incremental": (q_dedup_incremental, O_DEDUP_INCREMENTAL),
    "snapshot_incremental": (q_snapshot_incremental, O_SNAPSHOT_INCREMENTAL),
    "bucketed_join": (q_bucketed_join, O_BUCKETED_JOIN),
    "embed_clustered": (q_embed_clustered, O_EMBED_CLUSTERED),
    "ann_ivf_recall_clustered": (
        q_ann_ivf_recall_clustered, O_ANN_IVF_RECALL_CLUSTERED),
    "ann_rerank_recall_clustered": (
        q_ann_rerank_recall_clustered, O_ANN_RERANK_RECALL_CLUSTERED),
    "dedup_semantic": (q_dedup_semantic, O_DEDUP_SEMANTIC),
    "demo_pipeline": (q_demo_pipeline, _o_demo_pipeline()),
    "cms_topk": (q_cms_topk, _o_cms_topk()),
    "trajectory_stays": (q_trajectory_stays, O_TRAJECTORY_STAYS),
    "sample_weighted": (q_sample_weighted, O_SAMPLE_WEIGHTED),
    "hll_distinct": (q_hll_distinct, _o_hll_distinct()),
    "hll_union": (q_hll_union, _o_hll_union()),
    "theta_distinct": (q_theta_distinct, _o_theta_distinct()),
    "theta_jaccard": (q_theta_jaccard, _o_theta_jaccard()),
    "ann_pq_codes": (q_ann_pq_codes, _o_ann_pq_codes()),
    "ann_pq_topk": (q_ann_pq_topk, _o_ann_pq_topk()),
    "ann_pq_recall": (q_ann_pq_recall, _o_ann_pq_recall()),
    "ann_pq_rerank_recall": (q_ann_pq_rerank_recall, _o_ann_pq_rerank_recall()),
    "ann_ivfpq_codes": (q_ann_ivfpq_codes, _o_ann_ivfpq_codes()),
    "ann_ivfpq_recall": (q_ann_ivfpq_recall, _o_ann_ivfpq_recall()),
    "ann_index_delta": (q_ann_index_delta, _o_ann_index_delta()),
    "dedup_editdist": (q_dedup_editdist, _o_dedup_editdist()),
    "snapshot_pruned_scan": (q_snapshot_pruned_scan, _o_snapshot_pruned_scan()),
    "snapshot_compact": (q_snapshot_compact, _o_snapshot_compact()),
    "snapshot_time_travel": (q_snapshot_time_travel, _o_snapshot_time_travel()),
    "quality_constraints": (q_quality_constraints, O_QUALITY_CONSTRAINTS),
    "text_redact": (q_text_redact, O_TEXT_REDACT),
    "csv_roundtrip": (q_csv_roundtrip, O_BINNED_1D),
    "profile_cube": (q_profile_cube, O_PROFILE_CUBE),
    "trajectory_interp": (q_trajectory_interp, O_TRAJECTORY_INTERP),
    "trajectory_simplify": (q_trajectory_simplify, O_TRAJECTORY_SIMPLIFY),
    "trajectory_bearing": (q_trajectory_bearing, O_TRAJECTORY_BEARING),
    "tile_clip": (q_tile_clip, O_TILE_CLIP),
    "tile_contour": (q_tile_contour, O_TILE_CONTOUR),
    "cotravel": (q_cotravel, O_COTRAVEL),
    "tile_morph": (q_tile_morph, O_TILE_MORPH),
    "layout_compare": (q_layout_compare, O_LAYOUT_COMPARE),
    # --- round-3 late additions (positions > 50: queued for the round-4
    # driver rotation; oracle-checked locally at sf0.001 + sf0.01) -------
    "snapshot_merge": (q_snapshot_merge, O_SNAPSHOT_MERGE),
    "snapshot_mor": (q_snapshot_mor, O_SNAPSHOT_MOR),
    "snapshot_mor_rewrite": (q_snapshot_mor_rewrite, O_SNAPSHOT_MOR),
    "spans_flat": (q_spans_flat, O_SPANS_FLAT),
    "cell_encode": (q_cell_encode, O_CELL_ENCODE),
    "tile_agg": (q_tile_agg, O_TILE_AGG),
    "tile_agg_dataset": (q_tile_agg_dataset, O_TILE_AGG_DATASET),
    "tile_rollup": (q_tile_rollup, O_TILE_ROLLUP),
    "tile_pyramid": (q_tile_pyramid, O_TILE_PYRAMID),
    "tile_quantiles": (q_tile_quantiles, O_TILE_QUANTILES),
    "cell_bounds": (q_cell_bounds, O_CELL_BOUNDS),
    "cell_compact": (q_cell_compact, O_CELL_COMPACT),
    "cell_uncompact": (q_cell_uncompact, O_CELL_UNCOMPACT),
    "tile_smooth": (q_tile_smooth, O_TILE_SMOOTH),
    "tile_gauss": (q_tile_gauss, O_TILE_GAUSS),
    "tile_anomaly": (q_tile_anomaly, O_TILE_ANOMALY),
    "tile_hotspot": (q_tile_hotspot, O_TILE_HOTSPOT),
    "tile_moran": (q_tile_moran, O_TILE_MORAN),
    "tile_lisa": (q_tile_lisa, O_TILE_LISA),
    "tile_regions": (q_tile_regions, O_TILE_REGIONS),
    "tile_bfs": (q_tile_bfs, O_TILE_BFS),
    "tile_pagerank": (q_tile_pagerank, O_TILE_PAGERANK),
    "tile_sssp": (q_tile_sssp, O_TILE_SSSP),
    "tile_isochrone": (q_tile_isochrone, O_TILE_ISOCHRONE),
    "geofence_transitions": (q_geofence_transitions, O_GEOFENCE_TRANSITIONS),
    "geofence_flows": (q_geofence_flows, O_GEOFENCE_FLOWS),
    "events_asof": (q_events_asof, O_EVENTS_ASOF),
    "events_asof_tol": (q_events_asof_tol, O_EVENTS_ASOF_TOL),
    "media_dedup": (q_media_dedup, O_MEDIA_DEDUP),
    "streaming_geofence": (q_streaming_geofence, O_GEOFENCE_TRANSITIONS),
    "streaming_join": (q_streaming_join, _o_streaming_join()),
    "streaming_enrich": (q_streaming_enrich, O_STREAMING_ENRICH),
    "seq_pack": (q_seq_pack, _o_seq_pack()),
    "doc_chunks": (q_doc_chunks, O_DOC_CHUNKS),
    "cover_lookup": (q_cover_lookup, O_COVER_LOOKUP),
    "trajectory_cells": (q_trajectory_cells, O_TRAJECTORY_CELLS),
    "trajectory_od": (q_trajectory_od, O_TRAJECTORY_OD),
    "trajectory_length": (q_trajectory_length, O_TRAJECTORY_LENGTH),
    "tile_flow": (q_tile_flow, O_TILE_FLOW),
    "kind_transitions": (q_kind_transitions, O_KIND_TRANSITIONS),
    "spans_reconstruct": (q_spans_reconstruct, O_SPANS_RECONSTRUCT),
    "tile_distinct": (q_tile_distinct, O_TILE_DISTINCT),
    "streaming_tile_agg": (q_streaming_tile_agg, O_TILE_AGG),
    "streaming_dedup": (q_streaming_dedup, O_DEDUP_EXACT),
    "events_window": (q_events_window, O_EVENTS_WINDOW),
    "events_sliding": (q_events_sliding, O_EVENTS_SLIDING),
    "events_sessionize": (q_events_sessionize, O_EVENTS_SESSIONIZE),
    "sessions_overlap": (q_sessions_overlap, O_SESSIONS_OVERLAP),
    "events_stjoin": (q_events_stjoin, O_EVENTS_STJOIN),
    "events_retention": (q_events_retention, O_EVENTS_RETENTION),
    "events_funnel": (q_events_funnel, O_EVENTS_FUNNEL),
    "star_revenue": (q_star_revenue, O_STAR_REVENUE),
    "lineitem_pricing": (q_lineitem_pricing, O_LINEITEM_PRICING),
    "brand_revenue": (q_brand_revenue, O_BRAND_REVENUE),
    "streaming_sessionize": (q_streaming_sessionize, O_EVENTS_SESSIONIZE),
    "streaming_hll": (q_streaming_hll, _o_streaming_hll()),
    "events_json": (q_events_json, O_EVENTS_JSON),
    "define_expr": (q_define_expr, O_DEFINE_EXPR),
    "jagged_reduce": (q_jagged_reduce, O_JAGGED_REDUCE),
    "cutflow": (q_cutflow, O_CUTFLOW),
    "cutflow_data": (q_cutflow_data, O_CUTFLOW_DATA),
    "cutflow_filter": (q_cutflow_filter, O_CUTFLOW_FILTER),
    "select_phasespace": (q_select_phasespace, O_SELECT_PHASESPACE),
    "pip_join": (q_pip_join, O_PIP_JOIN),
    "pip_anti": (q_pip_anti, O_PIP_ANTI),
    "pip_tile_agg": (q_pip_tile_agg, O_PIP_TILE_AGG),
    "knn": (q_knn, O_KNN),
    "radius_join": (q_radius_join, O_RADIUS_JOIN),
    "knn_local": (q_knn_local, O_KNN),
    "raster_join": (q_raster_join, O_RASTER_JOIN),
    "binned_1d": (q_binned_1d, O_BINNED_1D),
    "binned_1d_padded": (q_binned_1d_padded, O_BINNED_1D_PADDED),
    "systematics": (q_systematics, O_SYSTEMATICS),
    "systematics_binned": (q_systematics_binned, O_SYSTEMATICS_BINNED),
    "skim": (q_skim, O_SKIM),
    "dedup_exact": (q_dedup_exact, O_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_minhash_lsh, O_MINHASH_LSH),
    "dedup_ngram_jaccard": (q_ngram_jaccard, O_NGRAM_JACCARD),
    "text_features": (q_text_features, O_TEXT_FEATURES),
    "ann_cosine_topk": (q_ann_cosine, O_ANN_COSINE),
    "ann_lsh_bucket": (q_ann_lsh_bucket, O_ANN_LSH_BUCKET),
    "ann_lsh_topk": (q_ann_lsh_topk, O_ANN_LSH_TOPK),
    "dedup_embedding_cosine": (q_dedup_embedding, O_DEDUP_EMBEDDING),
    "media_decode": (q_media_decode, O_MEDIA_DECODE),
    "media_resize": (q_media_resize, O_MEDIA_RESIZE),
    "media_frame_sample": (q_media_frames, O_MEDIA_FRAMES),
    "zonal_stats": (q_zonal_stats, O_ZONAL_STATS),
    "checkpoint_resume": (q_checkpoint_resume, O_PIP_TILE_AGG),
    "tile_agg_delta": (q_tile_agg_delta, O_TILE_AGG),
    "streaming_theta": (q_streaming_theta, _o_streaming_theta()),
    "trajectory_hull": (q_trajectory_hull, _o_trajectory_hull()),
    "trajectory_diameter": (q_trajectory_diameter, _o_trajectory_diameter()),
    "fingerprint_winnow": (q_fingerprint_winnow, _o_fingerprint_winnow()),
    "fingerprint_overlap": (q_fingerprint_overlap, _o_fingerprint_overlap()),
    "streaming_cms": (q_streaming_cms, _o_streaming_cms()),
    "snapshot_multirange_scan": (
        q_snapshot_multirange_scan,
        _o_snapshot_multirange_scan(),
    ),
    "snapshot_bloom_scan": (q_snapshot_bloom_scan, _o_snapshot_bloom_scan()),
    "mean_center": (q_mean_center, _mean_center_sql("duck")),
    "cell_quadkey": (q_cell_quadkey, _cell_quadkey_sql("duck")),
    "qdigest_quantiles": (q_qdigest_quantiles, _o_qdigest_quantiles()),
    "streaming_qdigest": (q_streaming_qdigest, _o_qdigest_quantiles()),
    "tile_trend": (q_tile_trend, _tile_trend_sql("duck")),
    "snapshot_schema_evolution": (
        q_snapshot_schema_evolution,
        O_SNAPSHOT_SCHEMA_EVOLUTION,
    ),
    "tile_kcore": (q_tile_kcore, _o_tile_kcore()),
    "snapshot_cdc": (q_snapshot_cdc, O_SNAPSHOT_CDC),
    "quality_repetition": (q_quality_repetition, _quality_repetition_sql("duck")),
    "join_size_cms": (q_join_size_cms, _o_join_size_cms()),
    "tile_decay": (q_tile_decay, _tile_decay_sql("duck")),
    "text_search": (q_text_search, _text_search_sql("duck")),
    "tile_changepoint": (q_tile_changepoint, _tile_changepoint_sql("duck")),
    "media_context": (q_media_context, _media_context_sql("duck")),
    "shuffle_order": (q_shuffle_order, _shuffle_order_sql("duck")),
    "funnel_latency": (q_funnel_latency, _funnel_latency_sql("duck")),
    "geofence_dwell": (q_geofence_dwell, _o_geofence_dwell()),
    "layer_corr": (q_layer_corr, _layer_corr_sql("duck")),
    "langid_confusion": (q_langid_confusion, _langid_confusion_sql("duck")),
    "token_budget": (q_token_budget, _token_budget_sql("duck")),
    "length_histogram": (q_length_histogram, _length_histogram_sql("duck")),
    "dedup_pipeline": (q_dedup_pipeline, _o_dedup_pipeline()),
    "modality_gini": (q_modality_gini, _modality_gini_sql("duck")),
    "spans_integrity": (q_spans_integrity, _spans_integrity_sql("duck")),
    "tile_gini": (q_tile_gini, _tile_gini_sql("duck")),
    "tile_pareto": (q_tile_pareto, _tile_pareto_sql("duck")),
    "daily_active": (q_daily_active, _daily_active_sql("duck")),
    "asset_topk": (q_asset_topk, _asset_topk_sql("duck")),
}

# ---------------------------------------------------------------------------
# Driver-sample rotation (round 4): the correctness driver samples the FIRST
# 50 insertion-order entries each round.  77 entries have no driver-green row
# from rounds 1-3 (all round-3 additions; scripts/rotate_registry.py computed
# this order from CORRECTNESS_r0{1,2,3}.json).  Rotate them to the front so
# this round's sample clears 50 of them; the remaining 27 lead round 5.
# tests/test_registry_rotation.py enforces this invariant so the evidence gap
# cannot grow silently (round-3 ADVICE item 5).  New round-4 queries are
# APPENDED (never inserted into the first-50 window) to keep the sample stable.
_NEVER_DRIVER_GREEN_R4 = [
    "ann_index_delta",
    "ann_ivfpq_codes",
    "ann_ivfpq_recall",
    "ann_pq_codes",
    "ann_pq_recall",
    "ann_pq_rerank_recall",
    "ann_pq_topk",
    "asset_topk",
    "cell_quadkey",
    "cms_topk",
    "cotravel",
    "csv_roundtrip",
    "daily_active",
    "dedup_editdist",
    "dedup_pipeline",
    "dedup_semantic",
    "demo_pipeline",
    "fingerprint_overlap",
    "fingerprint_winnow",
    "funnel_latency",
    "geofence_dwell",
    "hll_distinct",
    "hll_union",
    "join_size_cms",
    "langid_confusion",
    "layer_corr",
    "layout_compare",
    "length_histogram",
    "mean_center",
    "media_context",
    "modality_gini",
    "profile_cube",
    "qdigest_quantiles",
    "quality_constraints",
    "quality_repetition",
    "sample_weighted",
    "shuffle_order",
    "snapshot_bloom_scan",
    "snapshot_cdc",
    "snapshot_compact",
    "snapshot_merge",
    "snapshot_mor",
    "snapshot_mor_rewrite",
    "snapshot_multirange_scan",
    "snapshot_pruned_scan",
    "snapshot_schema_evolution",
    "snapshot_time_travel",
    "spans_integrity",
    "streaming_cms",
    "streaming_hll",
    "streaming_join",
    "streaming_qdigest",
    "streaming_theta",
    "text_redact",
    "text_search",
    "theta_distinct",
    "theta_jaccard",
    "tile_agg_delta",
    "tile_changepoint",
    "tile_clip",
    "tile_contour",
    "tile_decay",
    "tile_gini",
    "tile_isochrone",
    "tile_kcore",
    "tile_morph",
    "tile_pagerank",
    "tile_pareto",
    "tile_sssp",
    "tile_trend",
    "token_budget",
    "trajectory_bearing",
    "trajectory_diameter",
    "trajectory_hull",
    "trajectory_interp",
    "trajectory_simplify",
    "trajectory_stays",
]

QUERIES = {
    **{k: QUERIES[k] for k in _NEVER_DRIVER_GREEN_R4},
    **{k: v for k, v in QUERIES.items() if k not in set(_NEVER_DRIVER_GREEN_R4)},
}
