"""Marketing-style attribution over the event log: credit each
conversion to the touch that preceded it.

The event-store-native query (the reference's data model is exactly
this log: space/grouping/ts — README.md "Data model"): given
predicates for *touch* events (ad view, email click) and *conversion*
events (purchase, signup), attach to every conversion the most recent
touch by the same entity within a lookback window — last-touch
attribution, the baseline model every marketing stack reports.

Shape: ONE window per entity ordered by (ts, tiebreaks). The carried
"most recent touch" is a ``last(..., ignorenulls)`` over rows
UNBOUNDED PRECEDING → 1 PRECEDING, so an event that is both touch and
conversion credits the previous touch, never itself. One hash shuffle
on the entity; no joins, no self-joins — the classic
point-in-time-join formulated as a single pass, which is why it holds
at 100 TB where the naive conversions×touches range join would not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def last_touch_attribution(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    touch_pred: Column,
    conv_pred: Column,
    carry_cols: list[str],
    lookback: int | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """One row per conversion event: the conversion's columns plus
    ``touch_<c>`` for each ``c`` in ``carry_cols`` (NULL when no touch
    precedes it) and ``touch_gap`` (conversion ts − touch ts, in
    ``ts_col``'s units). ``lookback`` (same units) voids touches older
    than the window — they attribute as NULL, exactly like no touch.

    ``ts_col`` must be numeric (project timestamps to epoch
    microseconds first — the engine-wide convention), so gap and
    lookback arithmetic is integer-exact. ``tiebreak_cols`` totalize
    the per-entity order; with equal timestamps and no tiebreak the
    carried touch is partition-luck.
    """
    tiebreaks = list(tiebreak_cols or [])
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*[F.col(c).asc() for c in [ts_col, *tiebreaks]])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_struct = F.when(
        touch_pred,
        F.struct(
            F.col(ts_col).alias("_ts"),
            *[F.col(c).alias(c) for c in carry_cols],
        ),
    )
    carried = df.withColumn(
        "_lt_touch", F.last(touch_struct, ignorenulls=True).over(w)
    )
    conv = carried.filter(conv_pred)
    t = F.col("_lt_touch")
    gap = F.col(ts_col) - t["_ts"]
    in_window = t.isNotNull() & (
        F.lit(True) if lookback is None else (gap <= F.lit(lookback))
    )
    return conv.select(
        *df.columns,
        *[
            F.when(in_window, t[c]).alias(f"touch_{c}")
            for c in carry_cols
        ],
        F.when(in_window, gap).cast("long").alias("touch_gap"),
    )
