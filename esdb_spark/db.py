"""Read API — reference parity for `.esdb` query operators.

Reference surface (/root/reference): ``Open`` (esdb.go:23-38), ``Find``
(esdb.go:41-60), ``Db.Iterate`` (esdb.go:63-76), ``Space.Scan``
(space.go:62-77), ``Space.ScanIndex`` (space.go:79-108),
``Space.Iterate`` over groupings (space.go:45-60), early termination via
Scanner callback (space.go:14), RevScanIndex (README.md:125, declared
but unimplemented there — implemented here).

Everything returns a *DataFrame* with the plan expressed declaratively
so Catalyst provides what the reference hand-built:

- space point lookup  → partition pruning on the ``space`` directory
  (replaces the two-level SSTable offset chase, esdb.go:41-60);
- grouping locality   → Parquet row-group min/max skipping on the
  write-time sort (replaces contiguous block placement);
- index scan          → pushed predicate on the ``indexes`` map
  (replaces materialized pointer lists, index_block_writer.go);
- LIMIT / callback-false → ``.limit(n)`` compiles to
  TakeOrderedAndProject (true top-k: no global sort at scale).

Ordering contract (SURVEY §2.4): every scan is
``ORDER BY ts DESC, seq ASC`` — descending timestamp, ties broken by
insertion order, matching the reference's stable reverse sort
(event_block_writer.go:14-16, verified by example_test.go:96-102).
"""

from __future__ import annotations

import os
from typing import Callable, Iterator

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from esdb_spark.schema import EVENTS_COLUMNS


def _unescape_partition(value: str) -> str:
    """Hive partition dirs percent-escape special chars."""
    from urllib.parse import unquote

    return unquote(value)


def _ordered(df: DataFrame, reverse: bool = False) -> DataFrame:
    if reverse:
        # Exact reversal of the canonical order.
        return df.orderBy(F.col("ts").asc(), F.col("seq").desc())
    return df.orderBy(F.col("ts").desc(), F.col("seq").asc())


class Space:
    """One space (top-level partition) of an archive.

    Reference: space.go:16-24. Obtained via :meth:`Db.find`; a missing
    space yields empty scans (reference Find returns nil → no events).
    """

    def __init__(self, db: "Db", space_id: str):
        self._db = db
        self.id = str(space_id)

    @property
    def df(self) -> DataFrame:
        """All events of this space, unordered — the raw partition slice.
        Equality on the partition column → Catalyst prunes to the one
        space directory, the moral equivalent of esdb.go:41-60."""
        return self._db.df.filter(F.col("space") == self.id)

    # internal alias kept for brevity in methods below
    @property
    def _df(self) -> DataFrame:
        return self.df

    def exists(self) -> bool:
        return self._df.limit(1).count() > 0

    def scan(self, grouping: str = "", limit: int | None = None) -> DataFrame:
        """Events of one grouping, newest first (space.go:62-77)."""
        df = _ordered(self._df.filter(F.col("grouping") == grouping)).select(
            *EVENTS_COLUMNS
        )
        return df.limit(limit) if limit is not None else df

    def rev_scan(self, grouping: str = "", limit: int | None = None) -> DataFrame:
        """Oldest-first grouping scan (README.md:125 parity)."""
        df = _ordered(
            self._df.filter(F.col("grouping") == grouping), reverse=True
        ).select(*EVENTS_COLUMNS)
        return df.limit(limit) if limit is not None else df

    def scan_index(
        self, name: str, value: str, limit: int | None = None
    ) -> DataFrame:
        """Events matching secondary index ``name=value``, newest first
        (space.go:79-108). Empty-string values are legal index values
        (esdb_test.go fixtures); a missing key yields no match (map
        access returns NULL which never equals anything).

        When the archive materialized this index (Writer's
        ``materialize_indexes``), the predicate runs on the plain
        ``_idx_<name>`` column — pushed into the Parquet scan, so
        row-groups without the value are skipped via dictionary/stats
        instead of decoded and filtered (map-element predicates never
        reach PushedFilters — the map stays for introspection only).
        """
        df = _ordered(self._df.filter(self._index_predicate(name, value)))
        df = df.select(*[c for c in df.columns if not c.startswith("_idx_")])
        return df.limit(limit) if limit is not None else df

    def rev_scan_index(
        self, name: str, value: str, limit: int | None = None
    ) -> DataFrame:
        """Oldest-first index scan (README.md:125 parity)."""
        df = _ordered(
            self._df.filter(self._index_predicate(name, value)), reverse=True
        )
        df = df.select(*[c for c in df.columns if not c.startswith("_idx_")])
        return df.limit(limit) if limit is not None else df

    def _index_predicate(self, name: str, value: str):
        if f"_idx_{name}" in self._db.df.columns:
            return F.col(f"_idx_{name}") == value
        return F.col("indexes")[name] == value

    def iterate(self, process: Callable[[str], bool] | None = None):
        """Enumerate groupings in ascending key order (space.go:45-60).

        With a callback, mirrors the reference Scanner protocol (stop on
        False); without, returns the sorted list.
        """
        names = [
            r[0]
            for r in self._df.select("grouping")
            .distinct()
            .orderBy("grouping")
            .collect()
        ]
        if process is None:
            return names
        for name in names:
            if not process(name):
                break
        return None

    def scan_foreach(
        self, scanner: Callable[[Row], bool], grouping: str = ""
    ) -> None:
        """Callback-style scan with early termination — the reference's
        Scanner protocol (space.go:14,72). ``toLocalIterator`` streams
        partitions incrementally so a False return stops fetching,
        mirroring the reference's stop-mid-block behavior.
        """
        for row in self.scan(grouping).toLocalIterator():
            if not scanner(row):
                break

    def scan_index_foreach(
        self, name: str, value: str, scanner: Callable[[Row], bool]
    ) -> None:
        """Callback-style index scan (space.go:79-108 + Scanner)."""
        for row in self.scan_index(name, value).toLocalIterator():
            if not scanner(row):
                break


class Db:
    """An opened archive (reference esdb.Open, esdb.go:23-38)."""

    def __init__(self, spark: SparkSession, df: DataFrame, path: str | None = None):
        self.spark = spark
        # keep materialized `_idx_<name>` columns (Writer option) — they
        # carry real parquet pushdown for scan_index
        extra = [c for c in df.columns if c.startswith("_idx_")]
        self.df = df.select(*EVENTS_COLUMNS, *extra)
        self.path = path

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "Db":
        """Open an archive directory (errors if absent, like esdb.go:23-38).

        Space ids are arbitrary byte strings (reference space.go:16-24).
        The engine's own sessions disable Hive partition-column type
        inference, but a vanilla session would re-type a directory like
        ``space=00123`` as int 123 — corrupting the id ('00123' ≠ '123')
        and breaking lookups. Detect that and re-read with the partition
        column pinned to string, so ids survive any session config.
        """
        from esdb_spark import fs

        if not fs.exists(spark, path):
            raise FileNotFoundError(f"no esdb archive at {path}")
        df = spark.read.parquet(path)
        if (
            "space" in df.columns
            and df.schema["space"].dataType.simpleString() != "string"
        ):
            from pyspark.sql import types as T

            pinned = T.StructType(
                [
                    T.StructField("space", T.StringType(), True)
                    if f.name == "space"
                    else f
                    for f in df.schema.fields
                ]
            )
            df = spark.read.schema(pinned).parquet(path)
        return cls(spark, df, path=path)

    @classmethod
    def from_dataframe(cls, df: DataFrame) -> "Db":
        """Wrap an in-memory events DataFrame (no files) — useful for
        tests and for composing with other Spark pipelines."""
        return cls(df.sparkSession, df)

    def find(self, space_id: str) -> Space:
        """Point-lookup a space (esdb.go:41-60). Always returns a Space;
        a missing id scans empty (parity with nil-Find semantics)."""
        return Space(self, space_id)

    def spaces(self) -> list[str]:
        """All space ids in ascending key order (esdb.go:63-76; SSTable
        key order is bytewise ascending, sst/writer.go:48-50).

        For a Hive-partitioned archive this is a directory listing —
        O(|spaces|) metadata, no data scan (the reference reads the
        footer SSTable; scanning 100 TB to enumerate partitions would
        be absurd). Falls back to a distinct scan for in-memory /
        clustered-layout archives."""
        if self.path:
            from esdb_spark import fs

            names = []
            for entry, is_dir in fs.list_dir(self.spark, self.path):
                if is_dir and entry.startswith("space="):
                    names.append(_unescape_partition(entry.split("=", 1)[1]))
            if names:
                return sorted(names)
        return [
            r[0]
            for r in self.df.select("space").distinct().orderBy("space").collect()
        ]

    def scan_index_all(
        self, name: str, value: str, limit: int | None = None
    ) -> DataFrame:
        """Cross-space index scan — a capability the reference lacks
        (its indexes live inside one space; querying all spaces means
        opening each). One declarative plan over every partition,
        ordered ts-desc/seq-asc."""
        pred = (
            (F.col(f"_idx_{name}") == value)
            if f"_idx_{name}" in self.df.columns
            else (F.col("indexes")[name] == value)
        )
        df = (
            self.df.filter(pred)
            .orderBy(F.col("ts").desc(), F.col("seq").asc())
            .select(*EVENTS_COLUMNS)
        )
        return df.limit(limit) if limit is not None else df

    def iterate(self, process: Callable[[Space], bool]) -> None:
        """Callback enumeration of spaces in sorted order (esdb.go:63-76)."""
        for sid in self.spaces():
            if not process(self.find(sid)):
                break

    def close(self) -> None:
        """No-op (reference closes the file handle, esdb.go:78-82;
        DataFrames hold no open handles)."""
