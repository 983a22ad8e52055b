"""Split from the original single-module queries.py (round-4 refactor); see queries/__init__.py for the public surface."""

from __future__ import annotations

from ._common import (
    F,
    SESSION_GAP_US,
    TILE_RES,
    _drain,
    _load_events,
)

def q_streaming_tile_agg(spark, sf_dir):
    """Structured-Streaming tile aggregation, drained with availableNow:
    the accumulated micro-batch partial deltas merged at read time must
    equal the batch aggregate EXACTLY (same oracle as tile_agg) — the
    streaming path passes the same bit-exact correctness gate as batch."""
    import tempfile

    from ..streaming.tile_stream import StreamingTileAgg

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

    from ..streaming.dedup_stream import StreamingExactDedup

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

    from ..streaming.sketch_stream import StreamingHll

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
    from ..functions import sketch as _sketch

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

    from ..streaming.sketch_stream import StreamingTheta

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
    from ..functions import sketch as _sketch

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

    from ..streaming.sketch_stream import StreamingCms

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
    from ..functions import sketch as _sketch

    return _sketch.cms_sketch_oracle_sql()


def q_streaming_qdigest(spark, sf_dir):
    """Structured-Streaming q-digest drained with availableNow: per
    micro-batch bounded VALUE-HISTOGRAM deltas (<= U rows/batch), read-time
    per-value sum-merge, compression once at finalize — bit-identical to
    the batch qdigest_quantiles because histogram summing commutes and the
    lossy compression runs exactly once (same oracle)."""
    import os
    import tempfile

    from ..streaming.sketch_stream import StreamingQdigest

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

    from ..streaming.session_stream import StreamingSessionize

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


