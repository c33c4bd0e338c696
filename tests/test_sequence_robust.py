"""Markov event transitions (operators/sequence.py) and MAD robust
outliers (operators/profile.robust_outliers)."""

import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.profile import robust_outliers
from esdb_spark.operators.sequence import event_transitions, top_next_events


@pytest.fixture(scope="module")
def log(spark):
    # user 1: a->b->a->c ; user 2: a->b->b ; user 3: c (no successor)
    rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 30, "a"), (1, 40, "c"),
        (2, 10, "a"), (2, 20, "b"), (2, 30, "b"),
        (3, 10, "c"),
    ]
    return spark.createDataFrame(rows, "u int, ts long, ev string")


def test_transition_counts_and_probs(spark, log):
    t = {
        (r["state"], r["next_state"]): r
        for r in event_transitions(log, "u", "ts", "ev").collect()
    }
    assert t[("a", "b")]["n"] == 2
    assert t[("b", "a")]["n"] == 1
    assert t[("b", "b")]["n"] == 1
    assert t[("a", "c")]["n"] == 1
    assert t[("a", "b")]["n_from"] == 3  # a->b twice, a->c once
    assert t[("a", "b")]["p"] == 2.0 / 3.0
    # last event of each user contributes nothing; user 3 has none
    assert sum(r["n"] for r in t.values()) == 5


def test_transition_max_gap_breaks_sequences(spark, log):
    t = {
        (r["state"], r["next_state"]): r["n"]
        for r in event_transitions(log, "u", "ts", "ev", max_gap=10)
        .collect()
    }
    assert sum(t.values()) == 5  # all gaps are exactly 10

    t2 = event_transitions(log, "u", "ts", "ev", max_gap=5).count()
    assert t2 == 0  # every gap exceeds 5


def test_top_next_events_ranking(spark, log):
    top = top_next_events(log, "u", "ts", "ev", k=1).collect()
    by_state = {r["state"]: r for r in top}
    assert by_state["a"]["next_state"] == "b"  # 2 beats 1
    assert by_state["a"]["rank"] == 1
    # b: b->a and b->b tie at 1 — lexicographically smallest wins
    assert by_state["b"]["next_state"] == "a"


def test_robust_outliers_flags_extreme_value(spark):
    rows = [("g", float(v)) for v in [10, 11, 12, 11, 10, 11, 1000]]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["v"]: r for r in robust_outliers(df, "g", "v").collect()}
    assert out[1000.0]["is_outlier"] is True
    assert out[10.0]["is_outlier"] is False
    # model: median=11, deviations [1,0,1,0,1,0,989] -> MAD=1
    assert out[1000.0]["med"] == 11.0
    assert out[1000.0]["mad"] == 1.0
    assert out[1000.0]["robust_z"] == 0.6745 * (1000.0 - 11.0) / 1.0
    # mean/stddev z-score would have been masked: sd ~ 373, z ~ 2.3
    # (below any usual cut) — the robust score is ~667


def test_robust_outliers_zero_mad_convention(spark):
    rows = [("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_outliers(df, "g", "v").collect()
    by_v = {}
    for r in out:
        by_v.setdefault(r["v"], r)
    assert by_v[5.0]["mad"] == 0.0
    assert by_v[5.0]["robust_z"] is None
    assert by_v[5.0]["is_outlier"] is False
    assert by_v[9.0]["is_outlier"] is True


def test_robust_outliers_grouped_independently(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
            ("b", 100.0), ("b", 101.0), ("b", 102.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_outliers(df, "g", "v", threshold=3.5).collect()
    flags = {(r["g"], r["v"]): r["is_outlier"] for r in out}
    assert flags[("a", 100.0)] is True
    assert flags[("b", 100.0)] is False  # normal in its own group


# ---------------------------------------------------------------------------
# profile_drift (round 6)
# ---------------------------------------------------------------------------


def test_profile_drift_flags(spark):
    from esdb_spark.operators.profile import profile_drift

    old = spark.createDataFrame(
        [(i, f"u{i}", float(i)) for i in range(100)],
        "id int, user string, v double",
    )
    # new snapshot: 10% null v (null-rate jump), user collapses to one
    # value (cardinality collapse), id intact
    new = spark.createDataFrame(
        [
            (i, "same", None if i < 10 else float(i))
            for i in range(100)
        ],
        "id int, user string, v double",
    )
    out = {r["column_name"]: r for r in profile_drift(old, new).collect()}
    assert out["v"]["flag_nulls"] and out["v"]["null_rate_delta"] == 0.1
    assert out["user"]["flag_distinct"] and out["user"]["new_distinct"] == 1
    assert not out["id"]["flag_nulls"] and not out["id"]["flag_distinct"]
    assert not any(r["flag_missing"] for r in out.values())


def test_profile_drift_schema_change(spark):
    from esdb_spark.operators.profile import profile_drift

    old = spark.createDataFrame([(1, "a")], "id int, gone string")
    new = spark.createDataFrame([(1, 2.0)], "id int, added double")
    out = {r["column_name"]: r for r in profile_drift(old, new).collect()}
    assert out["gone"]["flag_missing"] and out["gone"]["new_rows"] is None
    assert out["added"]["flag_missing"] and out["added"]["old_rows"] is None
    assert not out["id"]["flag_missing"]


def test_profile_drift_degenerate_snapshots_report_not_crash(spark):
    # all-NULL column (n_distinct=0) and an empty new side: under ANSI
    # a bare division would abort with DIVIDE_BY_ZERO; the report must
    # come back with NULL rates instead (review finding)
    from esdb_spark.operators.profile import profile_drift

    old = spark.createDataFrame(
        [(1, None), (2, None)], "id int, v string"
    )
    new = spark.createDataFrame([], "id int, v string")
    out = {r["column_name"]: r for r in profile_drift(old, new).collect()}
    assert out["v"]["old_distinct"] == 0
    assert out["v"]["distinct_ratio"] is None
    assert out["v"]["new_null_rate"] is None
    assert not out["v"]["flag_nulls"]


def test_profile_drift_explicit_cols_missing_column_flags(spark):
    from esdb_spark.operators.profile import profile_drift

    old = spark.createDataFrame([(1, "a")], "id int, gone string")
    new = spark.createDataFrame([(1,)], "id int")
    out = {
        r["column_name"]: r
        for r in profile_drift(old, new, cols=["id", "gone"]).collect()
    }
    assert out["gone"]["flag_missing"] and out["gone"]["new_rows"] is None
    import pytest as _pt
    with _pt.raises(ValueError):
        profile_drift(old, new, cols=["nope"])


def test_profile_columns_empty_list_profiles_nothing(spark):
    # explicit [] means "profile nothing" — NOT "all columns"; drift
    # relies on this when one side dropped every requested column
    from esdb_spark.operators.profile import profile_columns

    df = spark.createDataFrame([(1, "a")], "id int, v string")
    out = profile_columns(df, [])
    assert out.count() == 0
    assert out.columns == ["column_name", "n_rows", "n_nulls", "n_distinct"]


def test_profile_columns_split_distinct_identical_no_expand(spark):
    from esdb_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0), (3, "a", None), (None, "b", 2.0)],
        ["k", "v", "x"],
    )
    fused = profile_columns(df).collect()
    split = profile_columns(df, split_distinct=True).collect()
    assert fused == split
    plan = profile_columns(df, split_distinct=True)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Expand" not in plan, plan
    # the fused 3-distinct plan DOES expand — the hatch is the point
    fused_plan = profile_columns(df)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Expand" in fused_plan


def test_profile_drift_all_requested_cols_missing_one_side(spark):
    # every requested column absent from `new`: the report must carry
    # ONLY the requested columns (flag_missing on the gone ones), not
    # silently profile all of new's columns (ADVICE r6)
    from esdb_spark.operators.profile import profile_drift

    old = spark.createDataFrame([(1, "a", "x")], "id int, g1 string, g2 string")
    new = spark.createDataFrame([(1, "other")], "id int, unrelated string")
    out = {
        r["column_name"]: r
        for r in profile_drift(old, new, cols=["g1", "g2"]).collect()
    }
    assert set(out) == {"g1", "g2"}
    assert out["g1"]["flag_missing"] and out["g2"]["flag_missing"]
    assert out["g1"]["new_rows"] is None


def test_profile_drift_split_distinct_identical(spark):
    from esdb_spark.operators.profile import profile_drift

    old = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    new = spark.createDataFrame([(1, "a"), (2, None)], "id int, v string")
    a = profile_drift(old, new).collect()
    b = profile_drift(old, new, split_distinct=True).collect()
    assert a == b
