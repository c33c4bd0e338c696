"""Grouped-map operators (applyInPandas) — the per-group escape hatch.

When per-group logic genuinely needs numpy/pandas (model fits,
interpolation, resampling), ``groupBy().applyInPandas`` is the right
shape: each group arrives as one pandas DataFrame via Arrow, work is
vectorized, the output schema is declared. The group is the unit of
parallelism — thousands of groups spread across executors; a single
giant group is the failure mode (pre-split or salt it first).

Kept deliberately small: anything expressible with built-in window /
aggregate functions should use those instead (JVM, codegen; see
operators/text.py for examples that stay out of Python entirely).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def linear_fit_per_group(
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Least-squares fit y = a·x + b per group → (key, slope,
    intercept, r2, n). Deterministic (closed-form normal equations in
    float64 over group-sorted data)."""
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("slope", T.DoubleType()),
            T.StructField("intercept", T.DoubleType()),
            T.StructField("r2", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("_x")  # deterministic summation order
        x = pdf["_x"].to_numpy(dtype="float64")
        y = pdf["_y"].to_numpy(dtype="float64")
        n = len(x)
        key = str(pdf["_k"].iloc[0])
        if n < 2 or np.ptp(x) == 0:
            return pd.DataFrame(
                [(key, 0.0, float(y.mean()) if n else 0.0, 0.0, n)],
                columns=["key", "slope", "intercept", "r2", "n"],
            )
        xm, ym = x.mean(), y.mean()
        sxx = ((x - xm) ** 2).sum()
        sxy = ((x - xm) * (y - ym)).sum()
        slope = sxy / sxx
        intercept = ym - slope * xm
        ss_res = ((y - (slope * x + intercept)) ** 2).sum()
        ss_tot = ((y - ym) ** 2).sum()
        r2 = 1.0 - (ss_res / ss_tot if ss_tot > 0 else 0.0)
        return pd.DataFrame(
            [(key, float(slope), float(intercept), float(r2), n)],
            columns=["key", "slope", "intercept", "r2", "n"],
        )

    prepared = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    return prepared.groupBy("_k").applyInPandas(fit, out_schema)


def trimmed_mean_per_group(
    df: DataFrame, key_col: str, value_col: str, trim: float = 0.1
) -> DataFrame:
    """Per-group trimmed mean via a true pandas **UDAF**
    (``pandas_udf`` GROUPED_AGG) — the aggregate face of the UDF
    family, complementing the grouped-map fit above: drop the lowest
    and highest ``floor(n*trim)`` values, average the rest.

    Robust-statistics shape that built-in aggregates can't express
    directly (percentile_approx trims by value, not by count).
    Trimming is by sorted-value rank, so ties at the cut are
    value-identical and the result is deterministic.

    Scale: a GROUPED_AGG pandas UDF has **no partial aggregation** —
    every group's values ship through the shuffle to one task as an
    Arrow batch (unlike built-in aggregates' map-side combine). Fine
    for bounded groups (per-type, per-day); for data-sized groups
    pre-aggregate or use an approximate quantile trim instead.

    Returns (key_col, trimmed_mean, n).
    """
    import numpy as np

    @F.pandas_udf("double")
    def tmean(v: pd.Series) -> float:
        # NULLs arrive as NaN: exclude them like built-in aggregates
        # do — a NaN in the sort would otherwise poison the mean or
        # silently eat the high-trim budget
        a = v.to_numpy(dtype="float64")
        a = np.sort(a[~np.isnan(a)])
        k = int(len(a) * trim)
        kept = a[k : len(a) - k] if len(a) > 2 * k else a
        return float(kept.mean()) if len(kept) else 0.0

    # Spark refuses to mix a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the row
    # count is a second tiny pandas aggregate rather than F.count.
    @F.pandas_udf("long")
    def pcount(v: pd.Series) -> int:
        return int(v.notna().sum())  # match F.count: non-null rows

    return df.groupBy(F.col(key_col)).agg(
        F.round(tmean(F.col(value_col)), 6).alias("trimmed_mean"),
        pcount(F.col(value_col)).alias("n"),
    )


def sentences_udtf_class():
    """The engine's Python **UDTF** example (Spark 4 table function):
    split a text into (sentence_idx, sentence) rows on ./!/? followed
    by whitespace.

    Exists to exercise the UDTF surface (§2.6 UDF/UDAF/UDTF) — a
    row-at-a-time Python path, so like all interpreted escapes it is
    the SLOW lane: the identical split is expressible with
    ``posexplode(split(...))`` in codegen (the oracle does exactly
    that), and real pipelines should prefer it. Returned as a class
    factory so importing this module never requires the UDTF runtime.
    """
    class SplitSentences:
        def eval(self, text: str):
            import re

            if text is None:
                return
            parts = [
                p.strip()
                for p in re.split(r"(?<=[.!?])\s+", text.strip())
                if p.strip()
            ]
            for i, p in enumerate(parts):
                yield (i, p)

    return SplitSentences


def split_sentences(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Apply the sentence-split UDTF per document via lateral join:
    (id_col, sentence_idx, sentence)."""
    from pyspark.sql.functions import udtf

    fn = udtf(
        sentences_udtf_class(),
        returnType="sentence_idx int, sentence string",
    )
    spark = df.sparkSession
    spark.udtf.register("esdb_split_sentences", fn)
    df.select(
        F.col(id_col).alias("_s_id"), F.col(text_col).alias("_s_text")
    ).createOrReplaceTempView("_esdb_udtf_in")
    return spark.sql(
        "SELECT _s_id AS id, s.sentence_idx, s.sentence "
        "FROM _esdb_udtf_in, "
        "LATERAL esdb_split_sentences(_s_text) AS s"
    ).withColumnRenamed("id", id_col)


def zscore_per_group(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-group z-score — shown as BUILT-IN window functions (no
    Python): the contrast case to applyInPandas. Adds ``<value>_z``."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col)
    mean = F.avg(value_col).over(w)
    std = F.stddev_pop(value_col).over(w)
    return df.withColumn(
        f"{value_col}_z",
        F.when(std > 0, (F.col(value_col) - mean) / std).otherwise(F.lit(0.0)),
    )


def ewma_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key: the recurrence
    ``e_1 = x_1; e_t = alpha·x_t + (1-alpha)·e_{t-1}`` over each key's
    rows in ``order_cols`` order — the time-series smoothing /
    online-baseline primitive that no built-in window frame expresses
    (the weight of every prior row changes at each step).

    Genuinely sequential per key, but NOT per-group-invoked: a
    per-group ``applyInPandas`` pays one Python call and one pandas
    frame per key (measured: the identity applyInPandas alone costs
    ~1.9 s on 100k rows / 1.5k keys). Instead: one shuffle
    (``repartition(key)``) + ``sortWithinPartitions(key, order)``,
    then ``mapInPandas`` streams each partition's Arrow batches in
    sorted order — segments within a batch run ``pandas.ewm``'s C
    recurrence, and a carry dict chains the boundary key across
    batches (prepending the carried value reproduces the recurrence
    exactly). Measured 3.1 s → 1.1 s at sf0.1.

    ``pandas.ewm(adjust=False)`` applies the identical multiply-add
    per step as the definitional recurrence, so any engine evaluating
    the same definition (e.g. a SQL recursive CTE) produces
    bit-identical doubles — the catalog query's oracle and
    ``test_ewma_matches_pandas`` rely on this. An unbounded single
    key still serializes onto one partition — segment such series
    first (e.g. by day) and chain segment boundaries.

    ``order_cols`` must totally order rows within a key (ties would
    make the result partition-order-dependent — pass a tiebreaker
    column such as the event id).
    """
    if not 0 < alpha <= 1:
        raise ValueError("ewma_per_key: alpha must be in (0, 1]")
    cols = [key_col, *order_cols, value_col]
    fields = [df.schema[c] for c in cols]
    out_schema = T.StructType(
        [*fields, T.StructField(out_col, T.DoubleType())]
    )
    a = float(alpha)

    # NULL keys form one group (SQL GROUP BY semantics): repartition
    # hashes them to one partition and the sort makes them contiguous,
    # so dropna=False below treats them like any other key. NaN is not
    # self-equal, so the carry dict needs a stable stand-in key.
    _null_key = object()

    def smooth(batches):
        import numpy as np

        carry: dict = {}  # only the partition's batch-boundary keys
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: pd.Series([], dtype="float64")})
                continue
            x = pdf[value_col].astype("float64").to_numpy()
            # NaN-filled, not empty: any row a grouping path ever missed
            # would surface as NULL-ish output, never uninitialized
            # memory (a real bug in an earlier revision: default
            # dropna=True silently skipped NULL-key rows).
            out = np.full(len(pdf), np.nan)
            # keys arrive contiguous (partition is sorted by key)
            groups = pdf.groupby(key_col, sort=False, dropna=False).indices
            for k, idx in groups.items():
                if pd.isna(k):
                    k = _null_key
                seg = x[idx]
                prev = carry.get(k)
                if prev is not None:
                    seg = np.concatenate(([prev], seg))
                r = (
                    pd.Series(seg)
                    .ewm(alpha=a, adjust=False)
                    .mean()
                    .to_numpy()
                )
                if prev is not None:
                    r = r[1:]
                out[idx] = r
                carry[k] = r[-1]
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return (
        df.select(*cols)
        .repartition(key_col)
        .sortWithinPartitions(key_col, *order_cols)
        .mapInPandas(smooth, schema=out_schema)
    )
