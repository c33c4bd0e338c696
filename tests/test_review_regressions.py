"""Regression tests for code-review findings (round 1): each pins a
specific bug that was found and fixed."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from esdb_spark.operators.asof import asof_join, asof_join_bucketed
from esdb_spark.operators.dedup import dedup_exact, dedup_minhash_lsh
from esdb_spark.operators.text import with_language_guess


def test_dedup_exact_null_vs_shifted_columns(spark):
    # ("x", NULL) and (NULL, "x") are DISTINCT rows; naive concat
    # fingerprints collided them
    df = spark.createDataFrame(
        [(1, "x", None), (2, None, "x"), (3, "a\x1fb", "c"), (4, "a", "b\x1fc")],
        "id long, a string, b string",
    )
    out = dedup_exact(df, ["a", "b"], order_col="id")
    assert out.count() == 4  # nothing collides
    # both dedup modes agree
    assert dedup_exact(df, ["a", "b"]).count() == 4


def test_language_tiebreak_prefers_first_listed(spark):
    # exactly 2 en markers and 2 de markers → 'en' wins (listed first)
    df = spark.createDataFrame(
        [(1, "the market und das haus and more")], ["id", "text"]
    )
    # tokens: the(en) und(de) das(de) and(en) → 2-2 tie
    out = with_language_guess(df, "text").collect()[0]
    assert out.lang_guess == "en"


def test_minhash_empty_docs_not_paired(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, ""), (4, "real content words here")],
        ["doc_id", "text"],
    )
    out = dedup_minhash_lsh(df, "text", "doc_id", threshold=0.5, num_hashes=32, bands=8)
    # empty docs never pair with each other → all survive
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3, 4]


def test_asof_bucketed_keeps_duplicate_left_rows(spark):
    t = dt.datetime(2024, 1, 1, 10, 0, 0)
    left = spark.createDataFrame(
        [(1, t, "dup"), (1, t, "dup")], ["k", "ts", "tag"]
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 9, 0, 0), 42)], ["k", "rts", "v"]
    )
    exact = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    bucketed = asof_join_bucketed(
        left, right, on="k", left_ts="ts", right_ts="rts",
        bucket="1 hour", lookback_buckets=2,
    )
    assert exact.count() == 2
    assert bucketed.count() == 2  # identical rows both preserved
    assert all(r.v_r == 42 for r in bucketed.collect())


def test_archive_stats_escaped_space(spark, tmp_path):
    from esdb_spark import Db, Writer
    from esdb_spark.maintenance import archive_stats

    path = str(tmp_path / "esc.esdb")
    w = Writer(spark, path)
    w.add("a b", "1", 1)
    w.write()
    stats = archive_stats(Db.open(spark, path))
    assert stats[0]["space"] == "a b"
    assert stats[0]["n_files"] is not None  # unescaped keys line up
