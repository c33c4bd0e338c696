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
