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
