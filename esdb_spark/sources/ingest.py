"""Bulk ingestion — reference parity for the CSV→esdb loader
(/root/reference/testdata/build.go:24-91): reads a CSV, JSON-encodes
each row as the event payload, maps columns onto space/grouping/index
roles, bulk-writes the archive.

The whole pipeline is one distributed plan: read → project → partition
→ sorted write; nothing lands on the driver, so it scales to any CSV
the cluster can read (the reference streams row-by-row through one
process)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from esdb_spark.writer import write_events


def events_from_columns(
    df: DataFrame,
    space_col: str,
    ts_col: str,
    grouping_col: str | None = None,
    index_cols: list[str] | None = None,
) -> DataFrame:
    """Shape an arbitrary DataFrame into the canonical events schema.

    - ``data`` = JSON of the full source row (build.go:59 marshals the
      row struct);
    - ``indexes`` = {col: value} for each index column (build.go:52-57:
      visitor/city);
    - ``seq`` = partition-ordered id (file order, the reference's
      insertion order);
    - ``ts`` accepts epoch seconds (int) or native timestamps.
    """
    index_cols = index_cols or []
    ts = F.col(ts_col)
    ts_type = dict(df.dtypes)[ts_col]
    if ts_type == "double":
        # timestamp_seconds accepts fractional seconds directly — a
        # long cast would silently floor away sub-second precision
        ts = F.timestamp_seconds(F.col(ts_col))
    elif ts_type in ("int", "bigint", "long"):
        ts = F.timestamp_seconds(F.col(ts_col).cast("long"))
    index_entries: list = []
    for col in index_cols:
        index_entries.extend([F.lit(col), F.col(col).cast("string")])
    return df.select(
        F.col(space_col).cast("string").alias("space"),
        (
            F.col(grouping_col).cast("string") if grouping_col else F.lit("")
        ).alias("grouping"),
        ts.alias("ts"),
        F.monotonically_increasing_id().alias("seq"),
        F.to_json(F.struct(*df.columns)).alias("data"),
        (
            F.create_map(*index_entries) if index_entries else F.create_map()
        ).alias("indexes"),
    )


def export_jsonl(df: DataFrame, out_path: str, payload_col: str = "data") -> None:
    """Dump event payloads as JSON lines (reference testdata/build.go:72-80
    writes each event's JSON payload newline-delimited alongside the
    archive). Payloads are already JSON strings, so this is a text write
    — one file per partition; coalesce upstream if a single file is
    required."""
    df.select(F.col(payload_col).alias("value")).write.mode(
        "errorifexists"
    ).text(out_path)


def ingest_csv(
    spark: SparkSession,
    csv_path: str,
    out_path: str,
    space_col: str,
    ts_col: str,
    grouping_col: str | None = None,
    index_cols: list[str] | None = None,
    header: bool = True,
    layout: str = "partitioned",
) -> None:
    """CSV → esdb archive (reference testdata/build.go `main`)."""
    src = spark.read.csv(csv_path, header=header, inferSchema=True)
    events = events_from_columns(
        src,
        space_col=space_col,
        ts_col=ts_col,
        grouping_col=grouping_col,
        index_cols=index_cols,
    )
    write_events(events, out_path, layout=layout)


def ingest_file(
    spark: SparkSession,
    path: str,
    out_path: str,
    space_col: str,
    ts_col: str,
    fmt: str = "parquet",
    grouping_col: str | None = None,
    index_cols: list[str] | None = None,
    layout: str = "partitioned",
    **reader_options,
) -> None:
    """Any Spark-readable columnar/text format → esdb archive.

    ``fmt`` is passed to ``spark.read.format``: parquet and orc are
    built into Spark; avro needs the spark-avro package on the
    cluster (absent here — the call then raises Spark's
    AnalysisException, which we surface with a hint rather than
    masking). One distributed plan end-to-end, same as ingest_csv.
    """
    try:
        src = spark.read.format(fmt).options(**reader_options).load(path)
    except Exception as ex:  # pragma: no cover - depends on cluster jars
        if fmt == "avro":
            raise RuntimeError(
                "avro ingest needs the spark-avro package on the cluster "
                "(spark-submit --packages org.apache.spark:spark-avro_2.13:<ver>)"
            ) from ex
        raise
    events = events_from_columns(
        src,
        space_col=space_col,
        ts_col=ts_col,
        grouping_col=grouping_col,
        index_cols=index_cols,
    )
    write_events(events, out_path, layout=layout)


def ingest_jsonl(
    spark: SparkSession,
    jsonl_path: str,
    out_path: str,
    space_col: str,
    ts_col: str,
    grouping_col: str | None = None,
    index_cols: list[str] | None = None,
    layout: str = "partitioned",
) -> None:
    """JSON-lines → esdb archive — the inverse of :func:`export_jsonl`
    and the read half of the reference's JSONL dump
    (testdata/build.go:72-80). Schema is inferred from the JSON; the
    original line is re-marshalled as the event payload via
    events_from_columns, so export → ingest round-trips."""
    src = spark.read.json(jsonl_path)
    events = events_from_columns(
        src,
        space_col=space_col,
        ts_col=ts_col,
        grouping_col=grouping_col,
        index_cols=index_cols,
    )
    write_events(events, out_path, layout=layout)
