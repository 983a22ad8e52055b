"""Interval overlap join — the temporal twin of the cell-ring spatial join.

A naive interval theta join (``a.start <= b.end AND b.start <= a.end``)
plans as a nested-loop cross at any scale.  The scalable shape mirrors the
spatial cover: discretize time into fixed-width bins, explode each
interval over the bins it touches (linear in interval length), equi-join
on the bin key (ONE BIGINT-keyed shuffle), refine with the exact overlap
predicate — and avoid pair double-counting across shared bins WITHOUT a
distinct by emitting each pair only at its FIRST common bin
(``floor(greatest(start_a, start_b) / W) = bin``), the standard
report-at-smallest-common-cell trick.

Hot bins (mass concurrency spikes) are the temporal analogue of hot
tiles: the same salting/AQE toolbox applies upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def overlap_count(
    intervals: DataFrame,
    *,
    bin_us: int,
    key_cols: tuple[str, str] = ("user_id", "session_id"),
    start_col: str = "sess_start_us",
    end_col: str = "sess_end_us",
) -> DataFrame:
    """Per interval: how many OTHER intervals overlap it in time
    (concurrency).  Returns the input key columns + ``n_concurrent``
    (0 for lonely intervals — left join, not a silent drop).

    Intervals are closed ([start, end], microseconds).  ``bin_us`` trades
    explode factor (long intervals touch len/bin_us bins) against bin
    occupancy (candidate pairs per bin); set it near the typical interval
    length.
    """
    ka, kb = key_cols
    # materialized once (localCheckpoint; persist/checkpoint on a real
    # cluster): three consumers — each side of the self-join plus the
    # final left join — would otherwise re-derive the upstream lineage
    # (e.g. a whole sessionization) once each
    iv = intervals.select(
        F.col(ka), F.col(kb),
        F.col(start_col).alias("_s"), F.col(end_col).alias("_e"),
    ).localCheckpoint()
    binned = iv.select(
        ka, kb, "_s", "_e",
        F.explode(
            F.expr(f"sequence(_s DIV {bin_us}, _e DIV {bin_us})")
        ).alias("_bin"),
    )
    a, b = binned.alias("a"), binned.alias("b")
    pairs = (
        a.join(b, "_bin")
        .filter(
            # exact overlap refine + self-pair exclusion
            (F.col("a._s") <= F.col("b._e"))
            & (F.col("b._s") <= F.col("a._e"))
            & ~(
                (F.col(f"a.{ka}") == F.col(f"b.{ka}"))
                & (F.col(f"a.{kb}") == F.col(f"b.{kb}"))
            )
            # count each pair exactly once: only at the first common bin
            & (
                F.expr(f"greatest(a._s, b._s) DIV {bin_us}") == F.col("_bin")
            )
        )
        .groupBy(F.col(f"a.{ka}").alias(ka), F.col(f"a.{kb}").alias(kb))
        .agg(F.count(F.lit(1)).alias("n_concurrent"))
    )
    return (
        iv.select(ka, kb)
        .join(pairs, [ka, kb], "left")
        .withColumn("n_concurrent", F.coalesce("n_concurrent", F.lit(0)))
    )


def overlap_count_oracle_sql(
    intervals_sql: str,
    *,
    key_cols: tuple[str, str] = ("user_id", "session_id"),
    start_col: str = "sess_start_us",
    end_col: str = "sess_end_us",
) -> str:
    """DuckDB ground truth: brute-force theta self-join (fine at oracle
    scale; the binned path exists precisely so production never runs
    this shape)."""
    ka, kb = key_cols
    return f"""
WITH iv AS ({intervals_sql}),
p AS (
  SELECT a.{ka} AS {ka}, a.{kb} AS {kb}, count(*) AS n_concurrent
  FROM iv a JOIN iv b
    ON a.{start_col} <= b.{end_col} AND b.{start_col} <= a.{end_col}
   AND NOT (a.{ka} = b.{ka} AND a.{kb} = b.{kb})
  GROUP BY 1, 2
)
SELECT iv.{ka}, iv.{kb}, COALESCE(p.n_concurrent, 0) AS n_concurrent
FROM iv LEFT JOIN p USING ({ka}, {kb})
"""
