"""As-of (temporal) join — the classic time-series enrichment operator.

Spark has no native ASOF JOIN; this implements it as a composition of
built-in ops (preferred over applyInPandas/merge_asof — stays JVM-side
and scales):

**union + window strategy** (:func:`asof_join`): tag right rows, union
both sides on a common time axis, then per key take the last right row
at-or-before each left row via ``last(..., ignorenulls=True)`` over an
unbounded-preceding window. One shuffle on (key, time) — the same cost
as a sort-merge join — no range explosion, no skew amplification: the
window never materializes candidate pairs.

Semantics match DuckDB's ``ASOF JOIN`` (left row matches the greatest
right time ≤ its time; unmatched left rows null-extend), which is the
oracle used in the query catalog.

For the dense-right/sparse-left regime there is also a
**bucketed range join** (:func:`asof_join_bucketed`) that equi-joins on
coarse time buckets before the max-per-pair reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``on`` key.

    ``right_cols`` limits which right columns are carried (column
    pruning — don't haul the whole right row through the shuffle).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    out_names = [c + suffix for c in right_cols]

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("_rdata"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType)
        .alias("_lrow"),
        F.struct(*right_cols).alias("_rdata"),
    )
    # right rows sort before left rows at equal time (_is_left asc) so a
    # right row timestamped exactly at the left time DOES match — the
    # ASOF `>=` convention.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "_asof", F.last("_rdata", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_is_left") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[
            F.col("_asof")[src].alias(dst)
            for src, dst in zip(right_cols, out_names)
        ],
    )
    return out


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    bucket: str = "1 day",
    lookback_buckets: int = 30,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Range-bucketed as-of join: equi-join on (key, time bucket) for
    the current and ``lookback_buckets`` previous buckets, then keep the
    max right time ≤ left time per left row.

    Trades completeness for locality: a match older than the lookback
    horizon is missed (returns null) — the standard windowed-enrichment
    compromise when the right side is huge but fresh matches dominate.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    seconds = _duration_seconds(bucket)
    lb = F.floor(F.unix_micros(F.col(left_ts).cast("timestamp")) / (seconds * 1e6))
    rb = F.floor(F.unix_micros(F.col(right_ts).cast("timestamp")) / (seconds * 1e6))

    # a unique row id keeps FULLY identical left rows distinct through
    # the explode/join/dedup cycle (a window over the left columns
    # alone would collapse duplicates into one output row)
    l = (
        left.withColumn("_rowid", F.monotonically_increasing_id())
        .withColumn("_lb", lb)
        .withColumn("_probe", F.explode(F.sequence(lb - lookback_buckets, lb)))
    )
    r = right.withColumn("_rb", rb)
    joined = l.join(
        r,
        (l["_probe"] == r["_rb"]) & (l[on] == r[on]),
        "left",
    ).filter(
        F.col(right_ts).isNull() | (F.col(right_ts) <= F.col(left_ts))
    )
    w = Window.partitionBy(l["_rowid"]).orderBy(
        F.col(right_ts).desc_nulls_last()
    )
    ranked = joined.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return ranked.select(
        *[l[c].alias(c) for c in left.columns],
        *[r[c].alias(c + suffix) for c in right_cols],
    )


def _duration_seconds(text: str) -> int:
    qty, unit = text.split()
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
        "day": 86400,
        "days": 86400,
    }[unit]
    return int(qty) * mult
