"""Event-sequence analytics: Markov transition matrices over the
event log.

The reference's data model is an ordered per-grouping event log
(README.md "Data model": space/grouping/ts); the first question a
product team asks of such a log after funnels (queries.py
``funnel_view_click_purchase``) is "what happens NEXT after X?" —
the first-order Markov view. ``event_transitions`` builds the
(state → next state) count/probability matrix; ``top_next_events``
is its per-state top-k serving cut.

Everything is integer counts plus ONE fixed per-row IEEE division for
the probability, so the whole surface is engine-exact (full DuckDB
value-hash oracles).

Scale posture: one hash shuffle on the entity for the ordered window
(the same partitioning every per-entity operator here uses — at
100 TB the entity key is the natural high-cardinality partitioner),
then one hash aggregation on (state, next) whose output is bounded by
|event types|², not by rows. No joins, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def event_transitions(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_cols: list[str] | None = None,
    max_gap: int | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: one row per observed ``(state, next_state)`` pair with
    ``n`` (transition count), ``n_from`` (all transitions leaving
    ``state``) and ``p = n / n_from``.

    Each entity's events order by ``(ts_col, *tiebreak_cols)`` — pass
    tiebreaks that totalize the order (a sequence id), or equal
    timestamps make the successor partition-luck. An entity's LAST
    event has no successor and contributes nothing. ``max_gap`` (in
    ``ts_col``'s units — project timestamps to epoch microseconds
    first, the engine-wide convention) treats a longer silence as a
    sequence break: the pair across the gap is not a transition,
    mirroring how sessionize_users cuts sessions.
    """
    tiebreaks = list(tiebreak_cols or [])
    w = Window.partitionBy(entity_col).orderBy(
        *[F.col(c).asc() for c in [ts_col, *tiebreaks]]
    )
    # r13 (guide §2.3 "project before the exchange"): aliasing
    # state_col BELOW the window made Catalyst ship the state string
    # TWICE through the per-entity hash exchange (once as `state`,
    # once as the lead's input — r12 plan read: Project [event_type AS
    # state, event_type, user_id, ts_us, event_id] feeding the
    # Exchange). Compute the window first over an explicit slim
    # projection, alias after: the exchange carries one copy of the
    # state column. Same window, same rows, same output schema.
    keep: list[str] = []
    for c in [entity_col, ts_col, state_col, *tiebreaks]:
        if c not in keep:
            keep.append(c)
    nxt = (
        df.select(*keep)
        .withColumn("_sq_next", F.lead(state_col).over(w))
        .withColumn("_sq_gap", F.lead(ts_col).over(w) - F.col(ts_col))
        .filter(F.col("_sq_next").isNotNull())
        .select(
            F.col(state_col).alias("state"),
            F.col("_sq_next").alias("next_state"),
            "_sq_gap",
        )
    )
    if max_gap is not None:
        nxt = nxt.filter(F.col("_sq_gap") <= max_gap)
    counts = nxt.groupBy("state", "next_state").agg(
        F.count("*").cast("long").alias("n")
    )
    # n_from as a window over the (state, next) aggregate: the matrix
    # is |types|² rows, so the second pass is metadata-sized — cheaper
    # than re-aggregating the event-sized relation per denominator
    wf = Window.partitionBy("state")
    return counts.withColumn(
        "n_from", F.sum("n").over(wf).cast("long")
    ).withColumn("p", F.col("n") / F.col("n_from"))


def top_next_events(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    k: int = 3,
    tiebreak_cols: list[str] | None = None,
    max_gap: int | None = None,
) -> DataFrame:
    """Per-state top-``k`` successors by transition count (ties to the
    lexicographically smallest next state) with their probabilities —
    the serving cut of :func:`event_transitions` ("users who did X
    next did …"). Output is ≤ |states|·k rows."""
    t = event_transitions(
        df, entity_col, ts_col, state_col, tiebreak_cols, max_gap
    )
    w = Window.partitionBy("state").orderBy(
        F.desc("n"), F.asc("next_state")
    )
    return (
        t.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("state", "rank", "next_state", "n", "n_from", "p")
    )
