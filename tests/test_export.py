"""JSONL export parity (reference testdata/build.go:72-80)."""

import glob
import json

from esdb_spark import Db
from esdb_spark.sources.ingest import export_jsonl

from conftest import build_activity_writer


def test_export_jsonl_roundtrip(spark, tmp_path):
    writer = build_activity_writer(spark, str(tmp_path / "a.esdb"))
    writer.write()
    db = Db.open(spark, str(tmp_path / "a.esdb"))

    out = str(tmp_path / "dump.jsonl")
    export_jsonl(db.find("1").scan(""), out)

    lines = []
    for f in sorted(glob.glob(out + "/part-*")):
        with open(f) as fh:
            lines.extend(line.strip() for line in fh if line.strip())
    payloads = [json.loads(line) for line in lines]
    assert len(payloads) == 5
    assert {"total": "42.99"} in payloads
