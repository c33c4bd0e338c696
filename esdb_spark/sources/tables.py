"""Loaders for the driver's parquet tables (TESTDATA.md).

Normalizes upstream type quirks so queries see clean Spark types:

- Timestamp columns (``events.ts``, ``orders.o_orderdate``,
  ``lineitem.l_shipdate``) are parquet TIMESTAMP(MICROS,
  isAdjustedToUTC=false), which Spark 4 reads as TIMESTAMP_NTZ
  (``inferTimestampNTZ`` is on by default). They are deliberately left
  NTZ **as-is**: wrapping them in a conversion expression would block
  parquet predicate pushdown / row-group pruning on exactly the
  columns TPC-H-style queries filter hardest — at 100 TB that turns
  partition-pruned scans into full scans. Epoch extraction instead
  goes through :func:`esdb_spark.functions.epoch_us`, which handles
  NTZ timezone-independently at the expression site.
- Defensively, a bigint ``ts`` (a session with
  ``spark.sql.legacy.parquet.nanosAsLong`` reading nanos files) is
  converted from epoch-nanos to a microsecond timestamp.

At scale these loaders are where a catalog/table-format layer would
sit; filters and projections applied downstream still push into the
parquet scan untouched.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession, functions as F

# Per-session DataFrame cache — the moral equivalent of a catalog: the
# parquet footer/schema/file listing is derived once per (session,
# dir, table) instead of per query (measured ~90 ms per re-derivation,
# which dominated multi-table joins' fixed cost). DataFrames are
# immutable lazy plans, so sharing one across queries is safe; entries
# die with their session (WeakKeyDictionary).
_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)

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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, use_cache: bool = True
) -> DataFrame:
    """``use_cache=False`` forces a fresh parquet listing — needed only
    when the files under ``sf_dir`` change mid-session (the driver
    testdata is immutable; the cached file index would otherwise go
    stale)."""
    key = (os.path.abspath(sf_dir), name)
    if not use_cache:
        _CACHE.setdefault(spark, {}).pop(key, None)
    per_session = _CACHE.setdefault(spark, {})
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # epoch-nanos long (legacy nanosAsLong sessions); integer
            # division: float `/` would round at ~1e18 epoch-nanos
            # (doubles carry 53 bits) and corrupt the microsecond digit
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
