"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set fleet-wide on a real
cluster: AQE on (runtime coalesce + skew-join handling), shuffle
partitions sized to cores (not the 200 default), Arrow for the few
Pandas-UDF paths, UTC session timezone so results compare cleanly
against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "esdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from the environment; locally we
    default to ``local[N]`` with N from ``$SPARK_GRAFT_CPUS`` (driver
    contract) or all cores.
    """
    # Python workers (pandas UDF / mapInPandas paths) import this package
    # by module reference; make sure they can resolve it in local mode.
    # On a real cluster the wheel ships via --py-files / pip instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    # In local mode the driver JVM is the only executor; the 1g default
    # heap is far too small for multi-GB shuffles. Honors an explicit
    # $SPARK_DRIVER_MEMORY; ignored when a JVM is already running.
    driver_mem = os.environ.get("SPARK_DRIVER_MEMORY", "24g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Space ids are arbitrary byte strings (reference space.go:16-24);
        # never re-type "1" as an int when reading partition directories.
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # Upstream parquet may carry TIMESTAMP(NANOS) (e.g. pandas-written
        # data); Spark has no nanos type and errors by default. Read them
        # as long and convert at the source layer (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # At 100 TB, dynamic partition pruning + v2 pushdown matter; both
        # default-on in Spark 3.5+/4.x, pinned here for clarity.
        .config("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("ESDB_SPARK_UI", "false"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
