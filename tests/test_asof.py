"""As-of join tests: semantics vs hand-computed + DuckDB ASOF JOIN."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from esdb_spark.operators.asof import asof_join, asof_join_bucketed


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:03"), 100.0),
            (1, _ts("2024-01-01T10:00:07"), 101.0),
            (2, _ts("2024-01-01T10:00:01"), 50.0),
            (3, _ts("2024-01-01T10:00:05"), 75.0),  # no quote for key 3
        ],
        ["key", "t_ts", "price"],
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 99.5),
            (1, _ts("2024-01-01T10:00:03"), 99.9),  # equal-time match
            (1, _ts("2024-01-01T10:00:06"), 100.5),
            (2, _ts("2024-01-01T10:00:02"), 49.5),  # after the only trade
        ],
        ["key", "q_ts", "bid"],
    )
    return trades, quotes


def test_asof_semantics(frames):
    trades, quotes = frames
    out = asof_join(trades, quotes, on="key", left_ts="t_ts", right_ts="q_ts")
    rows = {(r.key, r.t_ts.isoformat()): r.bid_r for r in out.collect()}
    assert rows[(1, "2024-01-01T10:00:03")] == 99.9  # >= convention
    assert rows[(1, "2024-01-01T10:00:07")] == 100.5
    assert rows[(2, "2024-01-01T10:00:01")] is None  # quote is later
    assert rows[(3, "2024-01-01T10:00:05")] is None  # key absent
    assert out.count() == trades.count()  # left join semantics


def test_asof_matches_duckdb(frames):
    trades, quotes = frames
    got = sorted(
        (r.key, r.t_ts.isoformat(), r.bid_r)
        for r in asof_join(
            trades, quotes, on="key", left_ts="t_ts", right_ts="q_ts"
        ).collect()
    )
    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    want = sorted(
        (int(k), t.isoformat(), b)
        for k, t, b in con.execute(
            """
            SELECT trades.key, t_ts, bid FROM trades
            ASOF LEFT JOIN quotes
            ON trades.key = quotes.key AND t_ts >= q_ts
            """
        ).fetchall()
    )
    assert got == want


def test_asof_bucketed_matches_exact(frames):
    trades, quotes = frames
    exact = sorted(
        (r.key, r.t_ts.isoformat(), r.bid_r)
        for r in asof_join(
            trades, quotes, on="key", left_ts="t_ts", right_ts="q_ts"
        ).collect()
    )
    bucketed = sorted(
        (r.key, r.t_ts.isoformat(), r.bid_r)
        for r in asof_join_bucketed(
            trades,
            quotes,
            on="key",
            left_ts="t_ts",
            right_ts="q_ts",
            bucket="1 minute",
            lookback_buckets=2,
        ).collect()
    )
    assert bucketed == exact


def test_asof_bucketed_same_ts_name(spark):
    """Both sides naming their timestamp 'ts' (the common call shape)
    must not trip an ambiguous-column error in the dedup window."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, "k", base + dt.timedelta(minutes=i)) for i in range(10)],
        ["lid", "k", "ts"],
    )
    right = spark.createDataFrame(
        [(i * 10, "k", base + dt.timedelta(minutes=i * 2)) for i in range(5)],
        ["val", "k", "ts"],
    )
    got = {
        r.lid: r.val_r
        for r in asof_join_bucketed(
            left, right, on="k", left_ts="ts", right_ts="ts",
            bucket="1 minute", lookback_buckets=3, right_cols=["val"],
        ).collect()
    }
    # each left row picks the latest right at-or-before its ts
    assert got[0] == 0 and got[5] == 20 and got[9] == 40


def test_asof_real_events_orders(spark):
    """Enrich each event with the user's most recent prior order."""
    from esdb_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("o_ts"),
        "o_orderkey",
    )
    out = asof_join(
        ev,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_ts",
        right_cols=["o_ts", "o_orderkey"],
    )
    assert out.count() == ev.count()
    # any enriched row must satisfy the as-of invariant
    bad = out.filter(F.col("o_ts_r") > F.col("ts")).count()
    assert bad == 0


def test_salted_join_and_count(spark):
    from esdb_spark.operators.skew import salted_count, salted_join

    # heavily skewed: 90% of rows share key 0
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(0, "hot"), (950, "cold")], ["k", "label"]
    )
    out = salted_join(left, right, on="k")
    assert out.count() == 901  # 900 hot + 1 cold
    counts = {r.k: r.n for r in salted_count(left, "k").collect()}
    assert counts[0] == 900
    # left outer keeps unmatched left rows exactly once
    assert salted_join(left, right, on="k", how="left").count() == 1000
    # right-preserving joins would duplicate replicated right rows
    import pytest

    for bad in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(left, right, on="k", how=bad)


def test_interval_join_bounds_and_bucket_boundaries(spark):
    from datetime import datetime

    from esdb_spark.operators.asof import interval_join

    def at(sec):
        return datetime(2024, 1, 1, 12, 0, 0).replace(
            minute=sec // 60, second=sec % 60
        )

    left = spark.createDataFrame([(1, "u", at(0))], ["lid", "k", "ts"])
    # right rows: exactly at lower bound, inside, exactly at upper
    # bound (30 min), just past it, wrong key
    right = spark.createDataFrame(
        [
            (10, "u", at(0)),
            (11, "u", at(17 * 60 + 29)),   # crosses the bucket boundary
            (12, "u", at(30 * 60)),
            (13, "u", at(30 * 60 + 1)),
            (14, "x", at(60)),
        ],
        ["rid", "k", "ts2"],
    )
    out = interval_join(
        left, right, on="k", left_ts="ts", right_ts="ts2",
        lower="0 seconds", upper="30 minutes", right_cols=["rid"],
    )
    assert sorted(r.rid_r for r in out.collect()) == [10, 11, 12]

    # negative lower bound: symmetric window picks up earlier rows
    sym = interval_join(
        left,
        spark.createDataFrame([(20, "u", at(0)), (21, "u", at(5 * 60))],
                              ["rid", "k", "ts2"]),
        on="k", left_ts="ts", right_ts="ts2",
        lower="-10 minutes", upper="10 minutes", right_cols=["rid"],
    )
    assert sorted(r.rid_r for r in sym.collect()) == [20, 21]


def test_bucketed_asof_keeps_null_ts_left_rows(spark):
    """A NULL left timestamp must null-extend (left-join contract),
    not vanish: a plain explode over the NULL probe sequence silently
    dropped the row."""
    import datetime as dt

    from esdb_spark.operators.asof import asof_join, asof_join_bucketed

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12), "a"), (1, None, "b")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 11), 10.0)],
        "k long, ts timestamp, v double",
    )
    plain = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    bucketed = asof_join_bucketed(
        left, right, on="k", left_ts="ts", right_ts="ts", bucket="1 hour"
    )
    assert plain.count() == bucketed.count() == 2
    nulls = bucketed.filter(F.col("tag") == "b").collect()
    assert len(nulls) == 1 and nulls[0]["v_r"] is None  # null-extended
