"""Materialized secondary-index columns: real parquet pushdown for
scan_index (the Spark analog of the reference's pointer-list indexes,
index_block_writer.go)."""

import re

import pytest
from pyspark.sql import functions as F

from esdb_spark import Db, Writer
from esdb_spark.plans import physical_plan
from esdb_spark.writer import write_events


def _src(spark):
    return spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("space"),
        F.lit("").alias("grouping"),
        F.timestamp_seconds(F.lit(1400000000) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"),
        F.col("id").cast("string").alias("data"),
        F.create_map(
            F.lit("city"), (F.col("id") % 40).cast("string")
        ).alias("indexes"),
    )


@pytest.fixture(scope="module")
def archives(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("matidx")
    plain, mat = str(base / "plain.esdb"), str(base / "mat.esdb")
    write_events(_src(spark), plain)
    write_events(_src(spark), mat, materialize_indexes=["city"])
    return Db.open(spark, plain), Db.open(spark, mat)


def _pushed(df):
    plan = physical_plan(df)
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    return m.group(1) if m else ""


def test_materialized_index_pushes_down(archives):
    plain, mat = archives
    p = _pushed(plain.find("1").scan_index("city", "7"))
    q = _pushed(mat.find("1").scan_index("city", "7"))
    assert "_idx_city" not in p  # map predicate: only IsNotNull pushed
    assert "EqualTo(_idx_city,7)" in q  # materialized: real pushdown


def test_materialized_index_same_results(archives):
    plain, mat = archives
    a = [tuple(r) for r in plain.find("1").scan_index("city", "7").collect()]
    b = [tuple(r) for r in mat.find("1").scan_index("city", "7").collect()]
    assert a == b and len(a) > 0
    # rev scans too
    a = [tuple(r) for r in plain.find("2").rev_scan_index("city", "3").collect()]
    b = [tuple(r) for r in mat.find("2").rev_scan_index("city", "3").collect()]
    assert a == b

    # missing materialized value still empty, schema unchanged
    assert mat.find("1").scan_index("city", "zzz").count() == 0
    assert mat.find("1").scan("").columns == plain.find("1").scan("").columns


def test_row_writer_materializes(spark, tmp_path):
    path = str(tmp_path / "m.esdb")
    w = Writer(spark, path, materialize_indexes=["t"])
    w.add("s", "1", 5, indexes={"t": "a"})
    w.add("s", "2", 6, indexes={"t": "b"})
    w.write()
    db = Db.open(spark, path)
    assert [r["data"] for r in db.find("s").scan_index("t", "a").collect()] == ["1"]
