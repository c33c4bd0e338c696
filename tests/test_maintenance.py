"""Archive stats + compaction tests."""

import glob

from esdb_spark import Db, Writer
from esdb_spark.maintenance import archive_stats, compact_archive


def _build_fragmented(spark, path):
    """Many flush() calls → many small files per space."""
    w = Writer(spark, path)
    for batch in range(5):
        for i in range(10):
            w.add("a", f"a{batch}-{i}", 1000 + batch * 10 + i, grouping="g")
            w.add("b", f"b{batch}-{i}", 2000 + batch * 10 + i, grouping="h")
        w.flush("a")
        w.flush("b")
    w.write()
    return Db.open(spark, path)


def test_stats_and_compact(spark, tmp_path):
    path = str(tmp_path / "frag.esdb")
    db = _build_fragmented(spark, path)

    stats = {s["space"]: s for s in archive_stats(db)}
    assert stats["a"]["n_events"] == 50
    assert stats["a"]["n_files"] > 1  # fragmented by flushes

    before = [r["data"] for r in db.find("a").scan("g").collect()]

    db2 = compact_archive(db)
    stats2 = {s["space"]: s for s in archive_stats(db2)}
    assert stats2["a"]["n_events"] == 50
    assert stats2["a"]["n_files"] == 1  # compacted

    after = [r["data"] for r in db2.find("a").scan("g").collect()]
    assert after == before  # identical scan results and order

    # archive is still sealed (write-once marker preserved)
    import pytest

    from esdb_spark import DbExistsError

    with pytest.raises(DbExistsError):
        Writer(spark, path)


def test_materialize_index_post_hoc(spark, tmp_path):
    """Reindexing an existing archive must add a pushdown-capable
    _idx_ column with identical scan results to a write-time one."""
    import re

    from pyspark.sql import functions as F

    from esdb_spark.maintenance import materialize_index
    from esdb_spark.plans import physical_plan
    from esdb_spark.writer import write_events

    src = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("space"),
        F.lit("").alias("grouping"),
        F.timestamp_seconds(F.lit(1400000000) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"),
        F.col("id").cast("string").alias("data"),
        F.create_map(F.lit("city"), (F.col("id") % 40).cast("string")).alias(
            "indexes"
        ),
    )
    path = str(tmp_path / "reindex.esdb")
    write_events(src, path)
    db = Db.open(spark, path)
    before = [tuple(r) for r in db.find("1").scan_index("city", "7").collect()]

    db2 = materialize_index(db, "city")
    assert "_idx_city" in db2.df.columns
    after = [tuple(r) for r in db2.find("1").scan_index("city", "7").collect()]
    # scan_index result columns exclude internal _idx_*, so rows compare 1:1
    assert before == after and len(after) > 0
    plan = physical_plan(db2.find("1").scan_index("city", "7"))
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "EqualTo(_idx_city,7)" in m.group(1)
    # idempotent + sealed marker preserved
    db3 = materialize_index(db2, "city")
    assert [tuple(r) for r in db3.find("1").scan_index("city", "7").collect()] == after
    import glob as _g

    assert _g.glob(path + "/_ESDB_WRITTEN")


def test_expire_events_retention(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    from esdb_spark.maintenance import expire_events
    from esdb_spark.writer import write_events

    src = spark.range(1000).select(
        (F.col("id") % 2).cast("string").alias("space"),
        F.lit("g").alias("grouping"),
        F.timestamp_seconds(F.lit(1400000000) + F.col("id") * 3600).alias("ts"),
        F.col("id").alias("seq"),
        F.col("id").cast("string").alias("data"),
        F.create_map(F.lit("k"), F.lit("v")).alias("indexes"),
    )
    path = str(tmp_path / "ret.esdb")
    write_events(src, path)
    db = Db.open(spark, path)
    cutoff = dt.datetime.utcfromtimestamp(1400000000 + 500 * 3600)
    db2 = expire_events(db, cutoff)
    assert db2.df.count() == 500
    assert db2.df.agg(F.min("ts")).collect()[0][0] >= cutoff
    # order and scans intact after the rewrite
    top = db2.find("1").scan("g", limit=3).collect()
    assert [r["seq"] for r in top] == sorted(
        (r["seq"] for r in top), reverse=True
    )
    # sealed marker preserved
    import glob as _g

    assert _g.glob(path + "/_ESDB_WRITTEN")


def test_compact_fans_out_files_per_space(spark, tmp_path):
    """target_files_per_space must mean files PER SPACE (the old
    repartition(n, 'space') set the TOTAL partition count and funneled
    everything through one task at the default)."""
    import glob as _g

    from pyspark.sql import functions as F

    from esdb_spark.maintenance import compact_archive
    from esdb_spark.writer import write_events

    src = spark.range(4000).select(
        (F.col("id") % 2).cast("string").alias("space"),
        (F.col("id") % 50).cast("string").alias("grouping"),
        F.timestamp_seconds(F.lit(1400000000) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"),
        F.col("id").cast("string").alias("data"),
        F.create_map(F.lit("k"), F.lit("v")).alias("indexes"),
    )
    path = str(tmp_path / "fan.esdb")
    write_events(src, path)
    db2 = compact_archive(Db.open(spark, path), target_files_per_space=3)
    assert db2.df.count() == 4000
    for d in _g.glob(path + "/space=*"):
        n_files = len(_g.glob(d + "/*.parquet"))
        assert 1 <= n_files <= 3, (d, n_files)


def test_expire_refuses_total_purge(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    from esdb_spark.maintenance import expire_events
    from esdb_spark.writer import write_events

    src = spark.range(100).select(
        F.lit("s").alias("space"), F.lit("g").alias("grouping"),
        F.timestamp_seconds(F.lit(1400000000) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"), F.col("id").cast("string").alias("data"),
        F.create_map(F.lit("k"), F.lit("v")).alias("indexes"),
    )
    path = str(tmp_path / "purge.esdb")
    write_events(src, path)
    db = Db.open(spark, path)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        expire_events(db, dt.datetime(2030, 1, 1))
    # archive untouched after the refusal
    assert Db.open(spark, path).df.count() == 100


def test_open_pins_space_type_under_inference(spark, tmp_path):
    """A vanilla session (partition type inference ON) must not
    re-type numeric-looking space ids."""
    from pyspark.sql import functions as F

    from esdb_spark.writer import write_events

    src = spark.range(10).select(
        F.lit("00123").alias("space"), F.lit("g").alias("grouping"),
        F.timestamp_seconds(F.lit(1400000000) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"), F.col("id").cast("string").alias("data"),
        F.create_map(F.lit("k"), F.lit("v")).alias("indexes"),
    )
    path = str(tmp_path / "pin.esdb")
    write_events(src, path)
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "true")
    try:
        db = Db.open(spark, path)
        assert db.df.schema["space"].dataType.simpleString() == "string"
        assert db.spaces() == ["00123"]
        assert db.find("00123").scan("g").count() == 10
    finally:
        spark.conf.set(key, old)
