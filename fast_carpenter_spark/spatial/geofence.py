"""Geofence enter/exit detection over span trajectories — batch core and
the streaming fragment algebra.

Label every span point with the polygon it falls in (min ``poly_id`` when
polygons overlap, ``'outside'`` when none) via the cell-cover PIP join,
then emit one row per consecutive span pair whose label changes: the
region entry/exit event stream.

Streaming decomposition (the sessionization pattern extended to a
trajectory operator): each micro-batch holds a contiguous ``span_idx``
slice, so a document's trajectory is SPLIT across batches.  Per batch we
emit

* within-batch transitions (the window pass over the slice), and
* one boundary FRAGMENT per (doc, batch): first/last ``span_idx`` with
  their labels.

At read time, fragments sorted per doc by ``first_idx`` reconstruct the
cross-batch transitions: whenever fragment k's last label differs from
fragment k+1's first label, a transition happened at k+1's first point.
Together with the stored within-batch transitions this equals the batch
operator exactly; fragment PROCESSING order is irrelevant (out-of-order
backfill safe), only slice contiguity matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..spatial.join import SpatialJoinStage

OUTSIDE = "outside"


def span_labels(df: DataFrame, polygons) -> DataFrame:
    """(doc_id, span_idx, lbl) for every span point: min matching poly_id,
    'outside' when no polygon contains the point.  The polygon side rides
    the broadcast cell-cover join; the min-label dedup is a partial agg."""
    stage = SpatialJoinStage(name="gf", polygons=polygons)
    matched = (
        stage.apply(df)
        .groupBy("doc_id", "span_offset")
        .agg(F.min("poly_id").alias("lbl"))
    )
    return (
        df.select("doc_id", "span_idx", "span_offset")
        .join(matched, ["doc_id", "span_offset"], "left")
        .withColumn("lbl", F.coalesce("lbl", F.lit(OUTSIDE)))
        .select("doc_id", "span_idx", "lbl")
    )


def transitions_within(labels: DataFrame) -> DataFrame:
    """Label-change events inside one contiguous slice: one window pass
    keyed by doc_id (span counts per document are bounded, so the window
    partition cannot be skewed by data volume)."""
    w = W.partitionBy("doc_id").orderBy("span_idx")
    return (
        labels.withColumn("prev_lbl", F.lag("lbl").over(w))
        .filter(F.col("prev_lbl").isNotNull() & (F.col("prev_lbl") != F.col("lbl")))
        .select(
            "doc_id",
            "span_idx",
            F.col("prev_lbl").alias("from_poly"),
            F.col("lbl").alias("to_poly"),
        )
    )


def boundary_fragments(labels: DataFrame) -> DataFrame:
    """Per-doc slice summary: (doc_id, first_idx, first_lbl, last_idx,
    last_lbl) — the only state a slice must export."""
    return labels.groupBy("doc_id").agg(
        F.min("span_idx").alias("first_idx"),
        F.min_by("lbl", "span_idx").alias("first_lbl"),
        F.max("span_idx").alias("last_idx"),
        F.max_by("lbl", "span_idx").alias("last_lbl"),
    )


def boundary_transitions(frags: DataFrame) -> DataFrame:
    """Cross-slice transitions: adjacent fragments per doc (ordered by
    first_idx) whose labels differ at the seam."""
    w = W.partitionBy("doc_id").orderBy("first_idx")
    return (
        frags.withColumn("prev_last_lbl", F.lag("last_lbl").over(w))
        .filter(
            F.col("prev_last_lbl").isNotNull()
            & (F.col("prev_last_lbl") != F.col("first_lbl"))
        )
        .select(
            "doc_id",
            F.col("first_idx").alias("span_idx"),
            F.col("prev_last_lbl").alias("from_poly"),
            F.col("first_lbl").alias("to_poly"),
        )
    )
