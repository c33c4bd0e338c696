"""Loaders for the driver's parquet tables (TESTDATA.md).

Normalizes upstream type quirks so queries see clean Spark types:

- ``events.ts`` is TIMESTAMP(NANOS) in the files; Spark has no nanos
  timestamp, so (with ``spark.sql.legacy.parquet.nanosAsLong``) it
  arrives as a long of epoch-nanoseconds and is converted here to a
  microsecond TimestampType — the same value DuckDB reports.

At scale these loaders are where a catalog/table-format layer would
sit; filters and projections applied downstream still push into the
parquet scan because the conversions are per-column projections.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Any TIMESTAMP(NANOS) column was read as long epoch-nanos; convert
    # to microsecond timestamps (divide by 1000, integer semantics).
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # integer division: float `/` would round at ~1e18 epoch-nanos
            # (doubles carry 53 bits) and corrupt the microsecond digit
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
