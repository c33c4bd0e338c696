"""Corpus snapshot MERGE (operators/versioning.py): upsert/delete
semantics, version-wins resolution, NULL handling, change accounting.
No reference analog (the reference archive is immutable — writer.go);
this is the §2.7 incremental-corpus-release operator."""

import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.versioning import merge_snapshot, merge_stats


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", "web"),
            (2, "bravo", "web"),
            (3, "charlie", "code"),
            (None, "nullid", "web"),
        ],
        "doc_id int, text string, source string",
    )


def test_upsert_delete_append(spark, base):
    updates = spark.createDataFrame(
        [
            (2, "bravo v2", "web", False),   # update
            (3, None, None, True),            # tombstone
            (9, "new doc", "crawl", False),   # append
        ],
        "doc_id int, text string, source string, deleted boolean",
    )
    out = {
        r["doc_id"]: r
        for r in merge_snapshot(base, updates, "doc_id", "deleted").collect()
    }
    assert set(out) == {1, 2, 9, None}
    assert out[2]["text"] == "bravo v2"
    assert out[9]["source"] == "crawl"
    assert out[1]["text"] == "alpha"  # untouched
    assert out[None]["text"] == "nullid"  # NULL id untouched rides along


def test_null_id_update_shadows_null_id_base(spark, base):
    updates = spark.createDataFrame(
        [(None, "nullid v2", "web", False)],
        "doc_id int, text string, source string, deleted boolean",
    )
    rows = merge_snapshot(base, updates, "doc_id", "deleted").collect()
    null_rows = [r for r in rows if r["doc_id"] is None]
    # null-safe anti-join: the NULL-id base row is REPLACED, not kept
    # alongside (a plain anti-join would keep both)
    assert len(null_rows) == 1 and null_rows[0]["text"] == "nullid v2"
    assert len(rows) == 4


def test_version_wins_and_deterministic_tiebreak(spark, base):
    updates = spark.createDataFrame(
        [
            (2, "old recrawl", "web", False, 1),
            (2, "new recrawl", "web", False, 3),
            (2, "mid recrawl", "web", False, 2),
        ],
        "doc_id int, text string, source string, deleted boolean, v int",
    )
    out = merge_snapshot(
        base, updates, "doc_id", deleted_col="deleted", version_col="v"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["text"] == "new recrawl"
    # a tombstone at the max version deletes even with older updates
    updates2 = spark.createDataFrame(
        [
            (2, "recrawl", "web", False, 1),
            (2, None, None, True, 5),
        ],
        "doc_id int, text string, source string, deleted boolean, v int",
    )
    out2 = merge_snapshot(
        base, updates2, "doc_id", deleted_col="deleted", version_col="v"
    )
    assert 2 not in {r["doc_id"] for r in out2.collect()}


def test_missing_columns_raise(spark, base):
    bad = spark.createDataFrame([(2, False)], "doc_id int, deleted boolean")
    with pytest.raises(ValueError, match="missing base columns"):
        merge_snapshot(base, bad, "doc_id", "deleted")
    with pytest.raises(ValueError, match="missing column"):
        merge_snapshot(base, base, "doc_id", deleted_col="nope")


def test_merge_stats_counts(spark, base):
    updates = spark.createDataFrame(
        [
            (1, "alpha", "web", False),      # unchanged (same fp)
            (2, "bravo v2", "web", False),   # updated
            (3, "x", "code", True),          # deleted
            (9, "new doc", "crawl", False),  # added
        ],
        "doc_id int, text string, source string, deleted boolean",
    )
    row = merge_stats(
        base, updates, "doc_id",
        compare_cols=["text", "source"], deleted_col="deleted",
    ).collect()[0]
    assert (
        row["n_added"], row["n_updated"], row["n_unchanged"],
        row["n_deleted"], row["n_untouched"],
    ) == (1, 1, 1, 1, 1)  # untouched = the NULL-id base row


def test_stats_fingerprint_null_vs_empty(spark):
    """The row fingerprint must not collide NULL with '' (concat_ws
    drops NULLs; the sentinel prevents it)."""
    b = spark.createDataFrame([(1, None)], "doc_id int, text string")
    u = spark.createDataFrame(
        [(1, "", False)], "doc_id int, text string, deleted boolean"
    )
    row = merge_stats(b, u, "doc_id", deleted_col="deleted").collect()[0]
    assert row["n_updated"] == 1 and row["n_unchanged"] == 0


def test_snapshot_plus_stats_agree(spark, base):
    updates = spark.createDataFrame(
        [
            (2, "bravo v2", "web", False),
            (3, None, None, True),
            (9, "new doc", "crawl", False),
        ],
        "doc_id int, text string, source string, deleted boolean",
    )
    merged_n = merge_snapshot(base, updates, "doc_id", "deleted").count()
    s = merge_stats(
        base, updates, "doc_id",
        compare_cols=["text", "source"], deleted_col="deleted",
    ).collect()[0]
    assert merged_n == base.count() + s["n_added"] - s["n_deleted"]


def test_fingerprint_field_boundary_unambiguous(spark):
    """Review r5: a raw '|'-join collided ('a|b','c') with ('a','b|c');
    per-field md5 tokens make boundaries fixed-width."""
    b = spark.createDataFrame([(1, "a|b", "c")], "doc_id int, text string, lang string")
    u = spark.createDataFrame(
        [(1, "a", "b|c", False)],
        "doc_id int, text string, lang string, deleted boolean",
    )
    row = merge_stats(
        b, u, "doc_id", compare_cols=["text", "lang"], deleted_col="deleted"
    ).collect()[0]
    assert row["n_updated"] == 1 and row["n_unchanged"] == 0


def test_streaming_release_folding(spark, tmp_path):
    """Continuous corpus releases: micro-batched update streams fold
    into successive snapshots via foreachBatch + merge_snapshot (the
    operator is a plain DataFrame transform, so it composes with
    Structured Streaming unchanged). Later releases override earlier
    ones, tombstones delete across releases."""
    import os

    base = spark.createDataFrame(
        [(1, "one", "web"), (2, "two", "web"), (3, "three", "code")],
        "doc_id int, text string, source string",
    )
    v0 = str(tmp_path / "snap_v0")
    base.write.parquet(v0)
    upd_dir = str(tmp_path / "updates")
    os.makedirs(upd_dir)
    schema = "doc_id int, text string, source string, deleted boolean"
    state = {"path": v0, "n": 0}

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        cur = spark.read.parquet(state["path"])
        merged = merge_snapshot(cur, batch_df, "doc_id", "deleted")
        state["n"] += 1
        out = str(tmp_path / f"snap_v{state['n']}")
        merged.write.parquet(out)
        state["path"] = out

    stream = spark.readStream.schema(schema).parquet(upd_dir)
    q = stream.writeStream.foreachBatch(fold).start()
    try:
        # release 1: update doc 2, add doc 9
        spark.createDataFrame(
            [(2, "two v2", "web", False), (9, "nine", "crawl", False)], schema
        ).write.mode("append").parquet(upd_dir)
        q.processAllAvailable()
        # release 2: tombstone doc 3, update doc 9 again
        spark.createDataFrame(
            [(3, None, None, True), (9, "nine v2", "crawl", False)], schema
        ).write.mode("append").parquet(upd_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    final = {
        r["doc_id"]: r for r in spark.read.parquet(state["path"]).collect()
    }
    assert set(final) == {1, 2, 9}
    assert final[2]["text"] == "two v2"
    assert final[9]["text"] == "nine v2"  # release 2 overrode release 1
    assert state["n"] >= 1  # at least one fold ran (micro-batches may
    # coalesce, but the final state is release-order correct either way)


def test_release_history_time_travel_and_diff(spark, tmp_path):
    """write_release / read_release / diff_releases: numbered
    immutable snapshots with a manifest-gated commit — the storage
    half of the MERGE story."""
    from esdb_spark.operators.versioning import (
        diff_releases,
        merge_snapshot,
        read_release,
        release_log,
        write_release,
    )

    root = str(tmp_path / "corpus")
    v0_df = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "doc_id int, text string"
    )
    assert write_release(spark, root, v0_df, note="initial") == 0
    upd = spark.createDataFrame(
        [(2, "two v2", False), (3, None, True), (9, "nine", False)],
        "doc_id int, text string, deleted boolean",
    )
    v1_df = merge_snapshot(read_release(spark, root), upd, "doc_id", "deleted")
    assert write_release(spark, root, v1_df, note="recrawl") == 1

    # time travel: v0 still reads exactly as written
    assert {r["doc_id"] for r in read_release(spark, root, 0).collect()} == {1, 2, 3}
    assert {r["doc_id"] for r in read_release(spark, root).collect()} == {1, 2, 9}
    log = release_log(spark, root)
    assert [e["version"] for e in log] == [0, 1]
    assert log[1]["note"] == "recrawl"

    d = diff_releases(spark, root, 0, 1, "doc_id").collect()[0]
    assert (d["n_added"], d["n_updated"], d["n_unchanged"],
            d["n_deleted_rows"]) == (1, 1, 1, 1)

    # unknown version fails fast; orphan dirs (crashed writer) are
    # SKIPPED, never adopted — the corpus self-heals to the next slot
    import pytest as _pt

    with _pt.raises(FileNotFoundError, match="not in"):
        read_release(spark, root, 7)
    import os
    os.makedirs(str(tmp_path / "corpus" / "v2"))
    assert write_release(spark, root, v0_df) == 3
    assert [e["version"] for e in release_log(spark, root)] == [0, 1, 3]
    assert read_release(spark, root, 3).count() == 3
    with _pt.raises(FileNotFoundError, match="no releases"):
        read_release(spark, str(tmp_path / "nowhere"))


def test_gated_release_refuses_bad_snapshots(spark, tmp_path):
    """Guarded releases: a failing expectations rule aborts the commit
    BEFORE anything lands; a passing gate commits normally."""
    from esdb_spark.operators.expectations import not_null, unique
    from esdb_spark.operators.versioning import (
        read_release,
        release_log,
        write_release,
    )

    root = str(tmp_path / "gated")
    good = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id int, text string")
    bad = spark.createDataFrame(
        [(1, "a"), (1, "dup"), (None, "x")], "doc_id int, text string"
    )
    rules = [not_null("doc_id"), unique("doc_id")]
    assert write_release(spark, root, good, gate=rules) == 0
    with pytest.raises(ValueError, match="expectations gate failed"):
        write_release(spark, root, bad, gate=rules)
    # nothing landed: log unchanged, latest still the good snapshot
    assert [e["version"] for e in release_log(spark, root)] == [0]
    assert read_release(spark, root).count() == 2


def test_manifest_write_once_enforced(spark, tmp_path):
    """A pre-existing manifest file at the number a writer is about to
    commit makes write_release raise (exclusive create) instead of
    silently last-wins rewriting history — the concurrent-writer race
    fails loudly and the loser's parquet dir is a skippable orphan."""
    from esdb_spark.operators.versioning import (
        release_log,
        write_release,
    )

    root = str(tmp_path / "excl")
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    assert write_release(spark, root, df) == 0
    # plant the manifest a racing writer would have claimed for v1:
    # UNPARSEABLE, so release_log's torn-newest fallback still reads
    # manifest-000000 and the next write targets version 1
    marker = str(tmp_path / "excl" / "_releases" / "manifest-000001.json")
    with open(marker, "w") as f:
        f.write("{torn")
    with pytest.raises(FileExistsError, match="already exists"):
        write_release(spark, root, df, note="loser")
    # history is untouched: the planted file still holds its bytes and
    # the committed log still shows only v0
    assert open(marker).read() == "{torn"
    assert [e["version"] for e in release_log(spark, root)] == [0]


# ---------------------------------------------------------------------------
# SCD Type-2 dimension builder
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def change_log(spark):
    # user 1: A→A→B→B→A (runs collapse, value revisits reopen)
    # user 2: single observation
    # user 3: NULL→X→NULL (null-safe transitions open versions)
    return spark.createDataFrame(
        [
            (1, 10, "A"), (1, 20, "A"), (1, 30, "B"),
            (1, 40, "B"), (1, 50, "A"),
            (2, 10, "X"),
            (3, 10, None), (3, 20, "X"), (3, 30, None),
        ],
        "uid int, ts int, status string",
    )


def test_scd2_runs_collapse_and_tile(spark, change_log):
    from esdb_spark.operators.versioning import scd2

    rows = sorted(
        (r["uid"], r["valid_from"], r["valid_to"], r["status"],
         r["is_current"])
        for r in scd2(change_log, ["uid"], ["status"], "ts").collect()
    )
    assert rows == [
        (1, 10, 30, "A", False),
        (1, 30, 50, "B", False),
        (1, 50, None, "A", True),
        (2, 10, None, "X", True),
        (3, 10, 20, None, False),
        (3, 20, 30, "X", False),
        (3, 30, None, None, True),
    ]


def test_scd2_intervals_are_gapless_per_entity(spark, change_log):
    from esdb_spark.operators.versioning import scd2

    out = scd2(change_log, ["uid"], ["status"], "ts").collect()
    by_uid = {}
    for r in out:
        by_uid.setdefault(r["uid"], []).append(r)
    for uid, vs in by_uid.items():
        vs.sort(key=lambda r: r["valid_from"])
        assert sum(v["is_current"] for v in vs) == 1
        assert vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]


def test_scd2_tiebreak_makes_equal_ts_deterministic(spark):
    from esdb_spark.operators.versioning import scd2

    df = spark.createDataFrame(
        [(1, 10, 1, "A"), (1, 10, 2, "B"), (1, 20, 3, "B")],
        "uid int, ts int, seq int, status string",
    )
    rows = sorted(
        (r["valid_from"], r["status"])
        for r in scd2(
            df, ["uid"], ["status"], "ts", tiebreak_cols=["seq"]
        ).collect()
    )
    # seq orders the ts=10 pair: A then B; B run extends through ts=20
    assert rows == [(10, "A"), (10, "B")]


def test_scd2_multi_tracked_and_multi_id(spark):
    from esdb_spark.operators.versioning import scd2

    df = spark.createDataFrame(
        [
            ("s", 1, 10, "A", 1), ("s", 1, 20, "A", 2),
            ("s", 1, 30, "A", 2), ("t", 1, 10, "A", 1),
        ],
        "src string, uid int, ts int, status string, tier int",
    )
    rows = sorted(
        (r["src"], r["uid"], r["valid_from"], r["status"], r["tier"])
        for r in scd2(
            df, ["src", "uid"], ["status", "tier"], "ts"
        ).collect()
    )
    assert rows == [
        ("s", 1, 10, "A", 1),
        ("s", 1, 20, "A", 2),
        ("t", 1, 10, "A", 1),
    ]


def test_scd2_single_exchange_plan(spark, change_log):
    from esdb_spark.operators.versioning import scd2

    plan = scd2(change_log, ["uid"], ["status"], "ts")._jdf.queryExecution(
    ).executedPlan().toString()
    # both windows share one hash partitioning on the entity id
    assert plan.count("hashpartitioning") <= 1
