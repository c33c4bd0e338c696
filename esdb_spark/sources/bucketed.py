"""Bucketed-table layout for shuffle-free joins.

At 100 TB the biggest recurring cost is re-shuffling fact tables on
the same join key pipeline after pipeline. Bucketing pays that shuffle
once at write time: both sides hash-partitioned into the same number
of buckets on the join key co-locate, and Catalyst elides the
Exchange on every subsequent join/aggregation on that key.

Spark requires a catalog table for bucketing metadata (`bucketBy` +
``saveAsTable``); the files remain plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "errorifexists",
) -> None:
    """Persist ``df`` as a bucketed catalog table on ``bucket_col``.

    ``sort_col`` additionally sorts within buckets (enables sort-merge
    joins without the sort step)."""
    writer = df.write.mode(mode).bucketBy(buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def cobucket_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — no Exchange on
    either side (assert with esdb_spark.plans.shuffle_count == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on)
