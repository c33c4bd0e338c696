"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementations live in ``esdb_spark.queries`` — one entry
per operator family from SURVEY.md §2 (reference-parity scans) and
§2.7 (analytics + training-data pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from esdb_spark.queries import catalog


def _ensure_conf(spark: SparkSession) -> None:
    """Session hygiene when the driver supplies its own SparkSession."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
        )
        # runtime-settable AQE knobs: coalesce tiny shuffles (dominant
        # overhead at small SF), handle skew at large SF
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    except Exception:
        pass  # immutable conf in some deployments; loaders still work
    _ship_package(spark)


def _ship_package(spark: SparkSession) -> None:
    """Make ``esdb_spark`` importable on Python workers (pandas-UDF /
    mapInPandas operators) when the session was created before this
    module set any PYTHONPATH — the runtime equivalent of shipping the
    wheel with --py-files."""
    if getattr(spark, "_esdb_spark_shipped", False):
        return
    import tempfile
    import zipfile

    root = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(root, "esdb_spark")
    zpath = os.path.join(tempfile.gettempdir(), "esdb_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            for fname in filenames:
                if fname.endswith(".py"):
                    full = os.path.join(dirpath, fname)
                    zf.write(full, os.path.relpath(full, root))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # e.g. Spark Connect; PYTHONPATH fallback applies
    spark._esdb_spark_shipped = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the stream-tails
    arg-max (latest event per space/grouping) — the reference's most
    characteristic read (SURVEY §2.3 #21)."""
    _ensure_conf(spark)
    return catalog()["latest_per_grouping"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in catalog().items():
        def wrapped(spark: SparkSession, sf_dir: str, _fn=q.fn) -> DataFrame:
            _ensure_conf(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    xxhash64-sketch queries — rows-only check)."""
    return {name: q.oracle for name, q in catalog().items() if q.oracle}
