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

from esdb_spark.functions import epoch_us
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

    # order on epoch micros, not the raw column: left/right may carry
    # different timestamp flavors (NTZ parquet vs instant-typed engine
    # tables) and a union would otherwise need an implicit, session-tz
    # dependent coercion
    l_tag = left.select(
        F.col(on).alias("_k"),
        epoch_us(F.col(left_ts)).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("_rdata"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        epoch_us(F.col(right_ts)).alias("_t"),
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
    lb = F.floor(epoch_us(F.col(left_ts)) / (seconds * 1e6))
    rb = F.floor(epoch_us(F.col(right_ts)) / (seconds * 1e6))

    # a unique row id keeps FULLY identical left rows distinct through
    # the explode/join/dedup cycle (a window over the left columns
    # alone would collapse duplicates into one output row)
    l = (
        left.withColumn("_rowid", F.monotonically_increasing_id())
        .withColumn("_lus", epoch_us(F.col(left_ts)))
        .withColumn("_lb", lb)
        # explode_OUTER: a NULL left_ts makes the probe sequence NULL,
        # and a plain explode would silently DROP the left row — the
        # plain asof_join null-extends such rows, and a left join must
        # never lose left rows
        .withColumn(
            "_probe", F.explode_outer(F.sequence(lb - lookback_buckets, lb))
        )
    )
    r = right.withColumn("_rus", epoch_us(F.col(right_ts))).withColumn(
        "_rb", rb
    )
    # at-or-before refinement on epoch micros: a raw cross-side
    # timestamp comparison would coerce session-tz-dependently when the
    # sides carry different timestamp flavors (same rule as asof_join).
    # The refinement lives IN the join condition, not a post-filter: a
    # left row whose only same-bucket candidates are LATER than it must
    # null-extend (no match yet), not vanish — a post-filter on a
    # matched-then-rejected row would drop it entirely when no other
    # probe bucket null-extends (observable at lookback_buckets=0).
    joined = l.join(
        r,
        (l["_probe"] == r["_rb"]) & (l[on] == r[on]) & (r["_rus"] <= l["_lus"]),
        "left",
    )
    # order by the side-qualified epoch-micros column: an unqualified
    # right_ts reference is ambiguous when both sides name their
    # timestamp identically (e.g. both "ts"), and _rus is already the
    # coercion-safe flavor used by the at-or-before filter above
    w = Window.partitionBy(l["_rowid"]).orderBy(r["_rus"].desc_nulls_last())
    ranked = joined.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return ranked.select(
        *[l[c].alias(c) for c in left.columns],
        *[r[c].alias(c + suffix) for c in right_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Range (interval) join: every (left, right) pair with the same
    ``on`` key and ``right_ts`` in [left_ts + lower, left_ts + upper].

    Spark plans a raw ``ts BETWEEN a AND b`` join predicate as a
    broadcast-nested-loop / cartesian — O(|L|·|R|) per key and a
    guaranteed OOM at scale. This instead buckets time by the window
    span: the left row explodes to the (at most 2, when the bucket
    width ≥ span) buckets its window overlaps, the right row keeps its
    own bucket, and Catalyst gets a plain shuffled equi-join on
    (key, bucket) followed by the exact range filter. Shuffle volume
    is O(|L| + |R|), pair generation is bounded by per-(key, bucket)
    co-occurrence, and AQE's skew-join splitting still applies.

    ``lower``/``upper`` are signed duration strings (e.g. "-5 minutes",
    "30 minutes"); bounds are inclusive.
    """
    lo_s = _duration_seconds(lower)
    hi_s = _duration_seconds(upper)
    if hi_s < lo_s:
        raise ValueError("interval_join: upper bound below lower bound")
    width_s = max(hi_s - lo_s, 1)
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]

    l_us = epoch_us(F.col(left_ts))
    r_us = epoch_us(F.col(right_ts))
    w_us = int(width_s * 1e6)
    lo_b = F.floor((l_us + int(lo_s * 1e6)) / w_us)
    hi_b = F.floor((l_us + int(hi_s * 1e6)) / w_us)

    # the exact range refinement also compares on epoch micros: raw
    # cross-side timestamp comparisons would need an implicit
    # session-tz-dependent coercion when one side is NTZ parquet and
    # the other an instant-typed engine table (same rule as asof_join)
    l = left.withColumn("_lus", l_us).withColumn(
        "_probe", F.explode(F.sequence(lo_b, hi_b))
    )
    r = right.withColumn("_rus", r_us).withColumn(
        "_rb", F.floor(r_us / F.lit(w_us))
    )
    return (
        l.join(r, (l["_probe"] == r["_rb"]) & (l[on] == r[on]))
        .filter(
            (F.col("_rus") >= F.col("_lus") + int(lo_s * 1e6))
            & (F.col("_rus") <= F.col("_lus") + int(hi_s * 1e6))
        )
        .select(
            *[l[c].alias(c) for c in left.columns],
            *[r[c].alias(c + suffix) for c in right_cols],
        )
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
