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
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Profile ``cols`` (default: all) → rows of
    ``(column_name, n_rows, n_nulls, n_distinct)``, sorted by name."""
    cols = cols or df.columns
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        # backtick-quoted references: a column literally named "a.b"
        # must not be parsed as struct-field access
        qc = F.col(f"`{c}`")
        aggs.append(F.count(qc).alias(f"__nn_{c}"))  # non-null count
        aggs.append(distinct(qc).alias(f"__d_{c}"))
    row = df.agg(*aggs)
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
