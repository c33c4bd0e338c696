"""Column-level data profiling — the "look at your training data"
operator every large-pipeline run starts with.

One aggregation pass over the table produces a long-form profile: one
row per column with null and distinct counts. Min/max/means are left
to the caller (they're type-dependent; the counts are universal and
integer-exact across engines).

Scale note: multiple ``countDistinct`` in a single ``agg`` compiles to
Spark's Expand operator — the input is replicated once per distinct
aggregate. At 100 TB profile a column subset, or swap
``approx_count_distinct`` in via ``exact=False`` (HLL, one pass, no
expansion) when ±2% error is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
    split_distinct: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: all) → rows of
    ``(column_name, n_rows, n_nulls, n_distinct)``, sorted by name.

    An explicit EMPTY list means "profile nothing" (zero rows) — not
    "all columns"; :func:`profile_drift` relies on that to report a
    side whose requested columns are all missing as pure schema drift
    instead of profiling unrequested columns.

    ``split_distinct``: the module-header Expand caveat's escape hatch
    (same contract as ``expectations.check``). Multiple exact
    ``countDistinct`` in one aggregation compile to an Expand that
    replicates every input row once per distinct aggregate; with
    ``split_distinct=True`` the first column's distinct stays fused
    with the row/non-null counts and every further column's distinct
    runs as its own single-distinct pass, the one-row results
    recombined driver-free via one-row crossJoins. Trade: k extra
    scans instead of a k× shuffle replication — identical output."""
    if cols is None:
        cols = df.columns
    distinct = F.countDistinct if exact else F.approx_count_distinct
    if not cols:
        return df.sparkSession.createDataFrame(
            [],
            "column_name string, n_rows bigint, "
            "n_nulls bigint, n_distinct bigint",
        )

    def qcol(c: str):
        # backtick-quoted references: a column literally named "a.b"
        # must not be parsed as struct-field access
        return F.col(f"`{c}`")

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(qcol(c)).alias(f"__nn_{c}"))  # non-null count
    if not (split_distinct and exact and len(cols) > 1):
        for c in cols:
            aggs.append(distinct(qcol(c)).alias(f"__d_{c}"))
        row = df.agg(*aggs)
    else:
        # fuse the first distinct with the counts pass; each further
        # column gets a single-distinct pass (no Expand anywhere), and
        # the one-row frames recombine with broadcast-able crossJoins
        aggs.append(distinct(qcol(cols[0])).alias(f"__d_{cols[0]}"))
        row = df.agg(*aggs)
        for c in cols[1:]:
            row = row.crossJoin(df.agg(distinct(qcol(c)).alias(f"__d_{c}")))
    stacked = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__rows").alias("n_rows"),
                (F.col("__rows") - F.col(f"`__nn_{c}`")).alias("n_nulls"),
                F.col(f"`__d_{c}`").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return (
        row.select(F.explode(stacked).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier flags via the MAD-based modified
    z-score (Iglewicz & Hoaglin): ``z = 0.6745 · (x − median) / MAD``
    where ``MAD = median(|x − median|)``. Unlike mean/stddev z-scores,
    one extreme value cannot mask itself by inflating the scale.

    Output: the input's ``(group_col, value_col)`` plus ``med``,
    ``mad``, ``robust_z`` and ``is_outlier`` (|z| > ``threshold``;
    groups with MAD = 0 — ≥ half the values identical — flag only
    values different from the median, using the convention z = NULL,
    outlier = x ≠ median).

    Engine-exact: ``median``/``percentile(0.5)`` interpolates the two
    middle values with one IEEE mean in both Spark and DuckDB, and the
    z expression is fixed per-row arithmetic — so catalog rows carry
    full value-hash oracles (the round-4 lesson: sums re-associate,
    order statistics don't).

    Scale posture: two hash aggregations on the group key (medians
    need the deviations pass), then joins of the |groups|-row stats
    table back onto the data. The stats joins carry NO broadcast hint:
    |groups| is unbounded by anything (per-user outliers over 10⁸
    users is a legitimate call), and a forced broadcast there is an
    OOM where AQE — which sees the actual runtime size — broadcasts
    when small and falls back to a shuffle join when not (the same
    unforced-is-right lesson ``linkage.py`` documents for its
    stop-gram set). Spark's ``median`` is an exact sort-based
    aggregate — at extreme group cardinality swap in
    ``percentile_approx`` and accept approximate cut-points; the flag
    semantics are unchanged.
    """
    med = df.groupBy(group_col).agg(
        F.median(value_col).alias("med")
    )
    dev = (
        df.join(med, group_col)
        .withColumn("_ro_dev", F.abs(F.col(value_col) - F.col("med")))
        .groupBy(group_col)
        .agg(F.median("_ro_dev").alias("mad"), F.first("med").alias("med"))
    )
    out = df.join(dev, group_col).withColumn(
        "robust_z",
        F.when(
            F.col("mad") != 0.0,
            F.lit(0.6745) * (F.col(value_col) - F.col("med")) / F.col("mad"),
        ),
    )
    return out.withColumn(
        "is_outlier",
        F.when(F.col("mad") != 0.0, F.abs(F.col("robust_z")) > threshold)
        .otherwise(F.col(value_col) != F.col("med")),
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    cols: list[str] | None = None,
    null_rate_jump: float = 0.01,
    distinct_ratio_low: float = 0.5,
    split_distinct: bool = False,
) -> DataFrame:
    """Snapshot-over-snapshot drift report — the check a pipeline runs
    before swapping a refreshed corpus in: did a column's null rate
    jump, did its cardinality collapse, did a column appear/disappear?

    One row per column name seen in EITHER snapshot:
    ``(column_name, old_rows, new_rows, old_nulls, new_nulls,
    old_distinct, new_distinct, old_null_rate, new_null_rate,
    null_rate_delta, distinct_ratio, flag_nulls, flag_distinct,
    flag_missing)``. Rates are single IEEE divisions and counts are
    integers, so the whole report is engine-exact. A column absent
    from one side carries NULL stats and ``flag_missing`` — schema
    drift is drift.

    ``flag_nulls``: null-rate increase > ``null_rate_jump``.
    ``flag_distinct``: new distinct count < ``distinct_ratio_low`` ×
    old (cardinality collapse — the classic silent-join-bug symptom).

    Scale: two :func:`profile_columns` aggregation passes (one per
    snapshot — the module-header Expand caveat applies to each) joined
    on the |columns|-row output. Nothing else moves.
    """
    # an explicit cols list may name columns one snapshot dropped —
    # that IS schema drift, so profile each side on the columns it
    # actually has and let the full-outer join surface the rest as
    # flag_missing (profiling a missing column would just crash). A
    # side where EVERY requested column is absent profiles as an empty
    # frame (profile_columns' explicit-[] contract), never "all
    # columns" — unrequested rows must not leak into the report.
    if cols is not None:
        gone = [c for c in cols if c not in old.columns
                and c not in new.columns]
        if gone:
            raise ValueError(
                f"profile_drift: columns in neither snapshot: {gone}"
            )
        cols_old = [c for c in cols if c in old.columns]
        cols_new = [c for c in cols if c in new.columns]
    else:
        cols_old = cols_new = None
    po = profile_columns(old, cols_old, split_distinct=split_distinct).select(
        "column_name",
        F.col("n_rows").alias("old_rows"),
        F.col("n_nulls").alias("old_nulls"),
        F.col("n_distinct").alias("old_distinct"),
    )
    pn = profile_columns(new, cols_new, split_distinct=split_distinct).select(
        "column_name",
        F.col("n_rows").alias("new_rows"),
        F.col("n_nulls").alias("new_nulls"),
        F.col("n_distinct").alias("new_distinct"),
    )
    j = po.join(pn, "column_name", "full_outer")
    # try_divide: a zero-row side or an all-NULL column (n_distinct=0)
    # is exactly the degenerate snapshot this report exists to flag —
    # under ANSI (the session default) a bare `/` would abort the
    # whole report with DIVIDE_BY_ZERO instead; NULL rates/ratios
    # coalesce into un-flagged, and flag_missing still fires
    old_rate = F.try_divide(F.col("old_nulls"), F.col("old_rows"))
    new_rate = F.try_divide(F.col("new_nulls"), F.col("new_rows"))
    return (
        j.withColumn("old_null_rate", old_rate)
        .withColumn("new_null_rate", new_rate)
        .withColumn(
            "null_rate_delta", F.col("new_null_rate") - F.col("old_null_rate")
        )
        .withColumn(
            "distinct_ratio",
            F.try_divide(F.col("new_distinct"), F.col("old_distinct")),
        )
        .withColumn(
            "flag_nulls",
            F.coalesce(
                F.col("null_rate_delta") > F.lit(null_rate_jump), F.lit(False)
            ),
        )
        .withColumn(
            "flag_distinct",
            F.coalesce(
                F.col("distinct_ratio") < F.lit(distinct_ratio_low),
                F.lit(False),
            ),
        )
        .withColumn(
            "flag_missing",
            F.col("old_rows").isNull() | F.col("new_rows").isNull(),
        )
        .orderBy("column_name")
    )
