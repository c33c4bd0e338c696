"""CSV ingestion parity tests (reference testdata/build.go)."""

import csv

from esdb_spark import Db
from esdb_spark.sources.ingest import ingest_csv, ingest_file


def test_ingest_file_orc_roundtrip(spark, tmp_path):
    """ORC (built into Spark) → esdb archive through the same
    distributed plan as CSV ingest."""
    from pyspark.sql import functions as F

    orc_path = str(tmp_path / "src.orc")
    spark.range(100).select(
        (F.col("id") % 2 == 0).cast("string").alias("kind"),
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string")).alias("host"),
        (F.lit(1400000000) + F.col("id")).alias("epoch"),
        F.col("id").alias("n"),
    ).write.orc(orc_path)

    out = str(tmp_path / "orc.esdb")
    ingest_file(
        spark,
        orc_path,
        out,
        space_col="kind",
        ts_col="epoch",
        fmt="orc",
        grouping_col="host",
        index_cols=["host"],
    )
    db = Db.open(spark, out)
    assert db.spaces() == ["false", "true"]
    got = db.find("true").scan("h0").collect()
    assert len(got) > 0
    import json

    payload = json.loads(got[0]["data"])
    assert set(payload) == {"kind", "host", "epoch", "n"}


def test_ingest_csv_visits_shape(spark, tmp_path):
    # the reference fixture shape: type,host,city,visitor,timestamp
    csv_path = str(tmp_path / "visits.csv")
    rows = [
        ("visit", "a.com", "ny", "v1@x.com", 1400000003),
        ("visit", "a.com", "sf", "v2@x.com", 1400000001),
        ("visit", "b.com", "ny", "v1@x.com", 1400000002),
        ("click", "a.com", "la", "v3@x.com", 1400000004),
    ]
    with open(csv_path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["type", "host", "city", "visitor", "timestamp"])
        w.writerows(rows)

    out = str(tmp_path / "visits.esdb")
    ingest_csv(
        spark,
        csv_path,
        out,
        space_col="type",
        ts_col="timestamp",
        grouping_col="host",
        index_cols=["visitor", "city"],
    )
    db = Db.open(spark, out)
    assert db.spaces() == ["click", "visit"]

    # grouping scan: ts-desc within host a.com of space visit
    got = db.find("visit").scan("a.com").collect()
    assert [r["indexes"]["city"] for r in got] == ["ny", "sf"]

    # secondary index scan across groupings
    v1 = db.find("visit").scan_index("visitor", "v1@x.com").collect()
    assert [r["grouping"] for r in v1] == ["a.com", "b.com"]  # ts desc

    # payload is the JSON row (build.go:59)
    import json

    payload = json.loads(got[0]["data"])
    assert payload["host"] == "a.com" and payload["city"] == "ny"


def test_jsonl_roundtrip(tmp_path, spark):
    from esdb_spark.sources.ingest import export_jsonl, ingest_jsonl
    from esdb_spark.db import Db

    src = spark.createDataFrame(
        [("click", 100, "u1", "nyc"), ("view", 200, "u2", "sfo")],
        ["etype", "epoch", "visitor", "city"],
    )
    jsonl = str(tmp_path / "events.jsonl")
    from esdb_spark.sources.ingest import events_from_columns

    export_jsonl(events_from_columns(src, "etype", "epoch",
                                     index_cols=["visitor", "city"]), jsonl)
    arch = str(tmp_path / "arch.esdb")
    ingest_jsonl(spark, jsonl, arch, space_col="etype", ts_col="epoch",
                 index_cols=["visitor", "city"])
    db = Db.open(spark, arch)
    rows = db.find("click").scan_index("city", "nyc").collect()
    assert len(rows) == 1
    import json
    assert json.loads(rows[0].data)["visitor"] == "u1"
