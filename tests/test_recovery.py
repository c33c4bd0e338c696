"""Durability-semantics parity: the reference tolerates trailing
garbage / torn writes on reopen (open_stream_test.go:549-638). Under
Parquet the equivalents are leftover _temporary dirs, stray checksum
files, and uncommitted partial output — readers must see exactly the
committed data. Plus cross-engine interop: archives are plain parquet
readable by any engine."""

import os
import shutil

import duckdb
import pytest

from esdb_spark import Db, EventStream, Writer


def _archive(spark, path):
    w = Writer(spark, path)
    for i in range(20):
        w.add("s", f"d{i}", 100 + i, grouping="g")
    w.write()
    return Db.open(spark, path)


def test_reopen_ignores_uncommitted_debris(spark, tmp_path):
    path = str(tmp_path / "a.esdb")
    db = _archive(spark, path)
    want = [r["data"] for r in db.find("s").scan("g").collect()]

    # simulate a torn write: leftover staging dir + hidden files
    part_dir = os.path.join(path, "space=s")
    os.makedirs(os.path.join(part_dir, "_temporary", "0"), exist_ok=True)
    with open(os.path.join(part_dir, "_temporary", "0", "part-999.parquet"), "wb") as fh:
        fh.write(b"\x00garbage not parquet")
    with open(os.path.join(part_dir, ".part-000.crc"), "wb") as fh:
        fh.write(b"junk")
    with open(os.path.join(path, "_started_12345"), "w") as fh:
        fh.write("")

    db2 = Db.open(spark, path)
    got = [r["data"] for r in db2.find("s").scan("g").collect()]
    assert got == want  # committed data only, debris invisible


def test_stream_reopen_sees_committed_prefix(spark, tmp_path):
    path = str(tmp_path / "s.stream")
    s = EventStream.new(spark, path)
    s.write_batch([(f"e{i}", {"k": "v"}) for i in range(5)])
    # uncommitted junk in the stream dir
    os.makedirs(os.path.join(path, "_temporary"), exist_ok=True)
    with open(os.path.join(path, ".nfs-tmp"), "wb") as fh:
        fh.write(b"xx")
    s2 = EventStream.open(spark, path)
    assert [r["data"] for r in s2.iterate().collect()] == [f"e{i}" for i in range(5)]
    # appends continue after the rebuilt tail
    s2.write("e5", {"k": "v"})
    assert s2.first("k", "v")["data"] == "e5"


def test_duckdb_reads_engine_archive(spark, tmp_path):
    """Interop: the archive is plain Hive-partitioned parquet — any
    engine can read it (no custom format lock-in, unlike the
    reference's bespoke .esdb layout)."""
    path = str(tmp_path / "i.esdb")
    _archive(spark, path)
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT space, data FROM read_parquet('{path}/*/*.parquet',
                                             hive_partitioning=true)
        WHERE grouping = 'g' ORDER BY ts DESC, seq ASC LIMIT 3
        """
    ).fetchall()
    assert [r[1] for r in rows] == ["d19", "d18", "d17"]
    assert all(r[0] == "s" for r in rows)


def test_fs_read_text_roundtrip(spark, tmp_path):
    """read_text must return real content: Py4J passes byte[] args BY
    VALUE, so the old stream.read(buf) filled a Java-side copy and
    returned all-NULs — silently breaking the streaming exactly-once
    ledger."""
    from esdb_spark import fs

    p = str(tmp_path / "ledger.txt")
    fs.touch(spark, p, "0\n1\n42\n")
    assert fs.read_text(spark, p) == "0\n1\n42\n"
    # non-trivial content and re-write
    fs.touch(spark, p, "päyload-βytes\n")
    assert fs.read_text(spark, p) == "päyload-βytes\n"
