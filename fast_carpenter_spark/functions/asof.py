"""As-of join — the temporal join Spark's built-ins lack, composed from
built-ins (no UDF, no per-row Python).

For each left row, find the right row with the greatest ``on`` value
<= the left's ``on`` value within the same ``by`` group ("most recent
preceding"): the classic quotes/trades join, last-touch attribution,
sensor-reading alignment.

Implementation is the union-merge pattern, NOT a theta join:

1. tag right rows side=0, left rows side=1 and union the two tables
   (right carries a struct of its payload columns, left carries null);
2. one window over (``by`` ORDER BY ``on``, side) with
   ``last(right_struct, ignoreNulls)`` carries the most recent right
   payload forward — right sorts before left at equal ``on``, so
   equality matches (ASOF's >= semantics);
3. keep side=1 rows and unpack the struct.

Cost: ONE shuffle on ``by`` (the partitioning a behavioral/tick table
keeps anyway) + a per-group sort; a naive ``l.ts >= r.ts`` range theta
join is a BroadcastNestedLoopJoin that dies at scale.  Skewed ``by``
keys (one hot user) bound a single task; at 100 TB pre-bucket both
sides by ``by`` so the union needs no shuffle at all.

Oracle twin: DuckDB's native ``ASOF LEFT JOIN`` (an independent
implementation of the same semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    on: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of LEFT join: every left row, plus ``right_cols`` of the
    most recent right row with ``right.on <= left.on`` in the same ``by``
    group (null when no such row).  ``right_cols`` must not include ``by``;
    the matched columns come back as ``<col><suffix>``.

    (``by``, ``on``) pairs must be unique on the right side — callers with
    duplicate ``on`` values must pre-aggregate to their preferred
    representative, which also makes the match deterministic.
    """
    clash = {"_side", "_rp", "_match"} & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: left columns {sorted(clash)} collide with internal "
            "helper names (_side/_rp/_match); rename them before joining"
        )
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(by), F.col(on), F.lit(0).alias("_side"), payload.alias("_rp")
    )
    left_cols = left.columns
    l = left.select(  # noqa: E741
        "*", F.lit(1).alias("_side"), F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp")
    ).select(by, on, "_side", "_rp", *[c for c in left_cols if c not in (by, on)])
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = r.unionByName(l, allowMissingColumns=True).withColumn(
        "_match", F.last(F.when(F.col("_side") == 0, F.col("_rp")), ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
