"""Writer invariants: write-once archives, immutability, flush, bulk
ingest, big payloads. Mirrors /root/reference/writer_test.go:49-70,
space_writer_test.go:12-21, esdb_test.go:112-154 (bigevent)."""

import json

import pytest
from pyspark.sql import functions as F

from esdb_spark import Db, DbExistsError, ImmutableError, Writer
from esdb_spark.writer import write_events

from conftest import build_activity_writer


def test_no_overwrite(spark, tmp_path):
    path = str(tmp_path / "db.esdb")
    w = Writer(spark, path)
    w.add("a", "1", 1)
    w.write()
    # writer_test.go:62-70 — creating over an existing archive errors
    with pytest.raises(DbExistsError):
        Writer(spark, path)


def test_add_after_write_errors(spark, tmp_path):
    path = str(tmp_path / "db.esdb")
    w = Writer(spark, path)
    w.add("a", "1", 1)
    w.write()
    # writer_test.go:49-60 — "db already written"
    with pytest.raises(ImmutableError):
        w.add("a", "2", 2)
    with pytest.raises(ImmutableError):
        w.write()


def test_flush_then_write(spark, tmp_path):
    # writer.go:62-68 — Flush writes one space early; Write finalizes.
    path = str(tmp_path / "db.esdb")
    w = Writer(spark, path)
    w.add("a", "1", 2)
    w.add("b", "2", 1)
    w.flush("a")
    w.add("a", "3", 3)
    w.write()
    db = Db.open(spark, path)
    assert [r["data"] for r in db.find("a").scan("").collect()] == ["3", "1"]
    assert [r["data"] for r in db.find("b").scan("").collect()] == ["2"]


def test_open_missing_errors(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        Db.open(spark, str(tmp_path / "nope.esdb"))


def test_big_event_roundtrip(spark, tmp_path):
    # esdb_test.go:112-154 — 200 events, one ~7KB payload mid-stream,
    # strictly decreasing ts so scan order == insertion order.
    path = str(tmp_path / "big.esdb")
    big = json.dumps({"k": "x" * 7000})
    w = Writer(spark, path)
    payloads = []
    for i in range(200):
        data = big if i == 100 else json.dumps({"i": i})
        payloads.append(data)
        w.add("a", data, 200 - i)
    w.write()
    db = Db.open(spark, path)
    got = [r["data"] for r in db.find("a").scan("").collect()]
    assert got == payloads  # byte-identical, in order


def test_bulk_ingest_dataframe(spark, tmp_path):
    # The cluster-scale path: events stay distributed end-to-end.
    path = str(tmp_path / "bulk.esdb")
    src = spark.range(100).select(
        (F.col("id") % 4).cast("string").alias("space"),
        F.lit("").alias("grouping"),
        F.timestamp_seconds(F.lit(1403534919) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"),
        F.col("id").cast("string").alias("data"),
        F.create_map(F.lit("parity"), (F.col("id") % 2).cast("string")).alias(
            "indexes"
        ),
    )
    write_events(src, path)
    db = Db.open(spark, path)
    assert sorted(db.spaces()) == ["0", "1", "2", "3"]
    rows = db.find("2").scan_index("parity", "0").collect()
    assert [r["data"] for r in rows[:3]] == ["98", "94", "90"]  # ts desc


def test_bulk_ingest_fans_out_per_space(spark, tmp_path):
    """Write parallelism must exceed |space|: with grouping-salted
    repartitioning a single hot space spreads over many writer tasks /
    files, while each grouping stays wholly inside one file."""
    import glob

    path = str(tmp_path / "fanout.esdb")
    src = spark.range(2000).select(
        F.lit("hot").alias("space"),
        (F.col("id") % 97).cast("string").alias("grouping"),
        F.timestamp_seconds(F.lit(1403534919) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"),
        F.col("id").cast("string").alias("data"),
        F.create_map().cast("map<string,string>").alias("indexes"),
    )
    # AQE's size-based coalescing folds this tiny shuffle back to one
    # partition (desirable: file count tracks data size, so the fan-out
    # only materializes when partitions are actually big). Disable it
    # here to observe the salted key spreading a single hot space.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        write_events(src, path, tasks_per_space=8)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    files = glob.glob(f"{path}/space=hot/*.parquet")
    assert len(files) > 1, "one hot space still funnels through one file"
    assert len(files) <= 8
    # each grouping lives in exactly one file (clustering invariant)
    import pyarrow.parquet as pq

    seen: dict[str, str] = {}
    for f in files:
        for g in set(pq.read_table(f, columns=["grouping"])["grouping"].to_pylist()):
            assert seen.setdefault(g, f) == f, f"grouping {g} split across files"
    db = Db.open(spark, path)
    rows = db.find("hot").scan("5").collect()
    assert [r["data"] for r in rows[:3]] == ["1945", "1848", "1751"]  # ts desc


def test_layout_clustered(spark, tmp_path):
    # High-|space|-cardinality layout: no Hive partitions, sort-clustered.
    path = str(tmp_path / "clustered.esdb")
    w = Writer(spark, path, layout="clustered")
    for i in range(20):
        w.add(f"s{i % 5}", str(i), 100 - i, grouping="g")
    w.write()
    db = Db.open(spark, path)
    assert [r["data"] for r in db.find("s1").scan("g").collect()] == [
        "1",
        "6",
        "11",
        "16",
    ]


def test_add_dataframe_validates_columns(spark, tmp_path):
    w = Writer(spark, str(tmp_path / "v.esdb"))
    bad = spark.range(3).select(F.col("id").alias("space"))
    with pytest.raises(ValueError, match="missing columns"):
        w.add_dataframe(bad)


def test_scan_index_all_and_spaces_listing(spark, tmp_path):
    path = str(tmp_path / "all.esdb")
    w = Writer(spark, path)
    w.add("s1", "a", 3, indexes={"u": "x"})
    w.add("s2", "b", 5, indexes={"u": "x"})
    w.add("s1", "c", 4, indexes={"u": "y"})
    w.write()
    db = Db.open(spark, path)
    # directory-listing path
    assert db.spaces() == ["s1", "s2"]
    # cross-space index scan, ts desc
    got = [r["data"] for r in db.scan_index_all("u", "x").collect()]
    assert got == ["b", "a"]
    assert db.scan_index_all("u", "zz").count() == 0


def test_clustered_layout_spaces_fallback(spark, tmp_path):
    # no Hive dirs in clustered layout → spaces() falls back to a
    # distinct scan and still enumerates correctly
    path = str(tmp_path / "cl.esdb")
    w = Writer(spark, path, layout="clustered")
    w.add("z", "1", 1)
    w.add("a", "2", 2)
    w.write()
    db = Db.open(spark, path)
    assert db.spaces() == ["a", "z"]
