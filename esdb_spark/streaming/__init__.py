"""Structured Streaming integration — the reference `stream` package's
live half (SURVEY §2.3, §3.3).

The reference's open stream is an appendable log with an in-memory
tail map (stream/open_stream.go:52-105). In Spark that maps to:

- a **streaming source** over the stream directory
  (:func:`read_event_stream`) — any committed micro-batch append
  becomes visible to the streaming query;
- **foreachBatch appends** (:func:`stream_into`) — the write half:
  an incoming streaming DataFrame is appended to an
  :class:`~esdb_spark.stream.EventStream` with monotone seq, exactly
  the reference's Write loop at micro-batch granularity;
- **live tails** (:func:`tails_query`) — a continuously-updated
  arg-max aggregate replacing the in-memory tail map; `update` output
  mode emits only re-written tails per batch;
- **windowed event-rate** (:func:`windowed_counts`) — watermarked
  tumbling-window aggregation, the standard late-data-tolerant rollup
  the reference lacks (its "late" events are simply stored in arrival
  order; with a watermark we get the same permissiveness with bounded
  state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from esdb_spark.stream import STREAM_SCHEMA, EventStream


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming view of a stream directory (new parquet appends become
    micro-batches)."""
    return (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(path)
    )


def stream_into(
    source: DataFrame, stream: EventStream, checkpoint: str
):
    """Continuously append a streaming DataFrame of (data, indexes)
    into an EventStream via foreachBatch (exactly-once per epoch via
    the checkpoint)."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        stream.append_dataframe(batch_df)

    return (
        source.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .start()
    )


def tails_query(source: DataFrame, query_name: str = "tails"):
    """Live tail map: newest seq per (index name, value), continuously
    updated — the streaming replacement for open_stream.go:96-99's
    in-memory map. Results land in the in-memory table ``query_name``."""
    exploded = source.select(
        "seq", "data", F.explode_outer("indexes").alias("name", "value")
    ).filter(F.col("name").isNotNull())
    agg = exploded.groupBy("name", "value").agg(
        F.max("seq").alias("seq"), F.max_by("data", "seq").alias("data")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts — the standard streaming
    rollup (append-mode safe: emits a window once the watermark passes
    it)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
