"""Canonical events-table schema (SURVEY.md §1.4).

One partitioned Parquet table replaces the reference's entire custom
file format (blocks/SSTables/footers — /root/reference/space_writer.go,
sst/, blocks/). Columns:

- ``space``     top-level partition key (reference space.go:16-24);
  physical partition column → Catalyst partition pruning reproduces the
  reference's space point-lookup (esdb.go:41-60) without reading other
  spaces' bytes.
- ``grouping``  clustering bucket within a space (space_writer.go:40-52);
  '' = ungrouped. Data is sorted within partitions so Parquet row-group
  min/max stats skip non-matching groupings.
- ``ts``        event timestamp. The reference stores uint32 epoch
  seconds (event.go:27-34); we use TimestampType (a capability upgrade,
  lossless for the reference's range).
- ``seq``       monotone insertion order. Required because the
  reference's sort is *stable* on ts ties (event_block_writer.go:14-16,
  sort.Stable) — Spark sorts don't preserve input order across
  shuffles, so the tiebreaker must be explicit.
- ``data``      opaque payload (JSON string in every reference fixture,
  event.go:16-21); queryable via get_json_object/from_json — an upgrade
  over the reference's opaque bytes.
- ``indexes``   secondary-index name→value map (writer.go:43-57). A
  predicate ``indexes['k'] = 'v'`` replaces the reference's materialized
  pointer lists (index_block_writer.go).
"""

from __future__ import annotations

from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("space", T.StringType(), False),
        T.StructField("grouping", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("data", T.StringType(), True),
        T.StructField("indexes", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Column order used when presenting scan results (space is a partition
# column so parquet puts it last on read; we normalize).
EVENTS_COLUMNS = ["space", "grouping", "ts", "seq", "data", "indexes"]
