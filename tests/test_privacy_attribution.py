"""k-anonymity / l-diversity audits (operators/privacy.py) and
last-touch attribution (operators/attribution.py)."""

import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.attribution import last_touch_attribution
from esdb_spark.operators.privacy import (
    generalize_numeric,
    k_anonymity_report,
    k_anonymity_summary,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (30, "a", "flu"), (30, "a", "flu"), (30, "a", "cold"),
            (31, "a", "flu"),
            (40, "b", "flu"), (40, "b", "cold"),
        ],
        "age int, zone string, diagnosis string",
    )


def test_report_flags_small_and_undiverse_groups(spark, people):
    rep = {
        (r["age"], r["zone"]): r
        for r in k_anonymity_report(
            people, ["age", "zone"], k=2, sensitive_col="diagnosis"
        ).collect()
    }
    assert rep[(30, "a")]["group_size"] == 3
    assert not rep[(30, "a")]["at_risk"]
    assert not rep[(30, "a")]["low_diversity"]
    assert rep[(31, "a")]["at_risk"]
    assert rep[(31, "a")]["low_diversity"]  # 1 distinct < 2
    assert not rep[(40, "b")]["at_risk"]


def test_summary_and_generalization_repair(spark, people):
    s = k_anonymity_summary(people, ["age", "zone"], k=2).collect()[0]
    assert (
        s["n_groups"], s["k_min"], s["n_at_risk_groups"],
        s["n_rows_at_risk"],
    ) == (3, 1, 1, 1)
    # banding age to decades merges 30/31 → publishable
    g = people.withColumn("age_band", generalize_numeric("age", 10))
    s2 = k_anonymity_summary(g, ["age_band", "zone"], k=2).collect()[0]
    assert (s2["k_min"], s2["n_at_risk_groups"]) == (2, 0)


@pytest.fixture(scope="module")
def journey(spark):
    # user 1: click(10) view(20) purchase(30) purchase(35)
    # user 2: purchase(10) with no prior touch; click(20) purchase(200)
    #         outside a 100-gap lookback
    return spark.createDataFrame(
        [
            (1, 10, 1, "click"), (1, 20, 2, "view"),
            (1, 30, 3, "purchase"), (1, 35, 4, "purchase"),
            (2, 10, 5, "purchase"), (2, 20, 6, "click"),
            (2, 200, 7, "purchase"),
        ],
        "user int, ts int, eid int, etype string",
    )


def _attr(journey, lookback=None):
    return last_touch_attribution(
        journey,
        "user",
        "ts",
        F.col("etype").isin("click", "view"),
        F.col("etype") == "purchase",
        carry_cols=["eid", "etype"],
        lookback=lookback,
        tiebreak_cols=["eid"],
    )


def test_last_touch_basic(spark, journey):
    got = {r["eid"]: r for r in _attr(journey).collect()}
    assert set(got) == {3, 4, 5, 7}
    assert (got[3]["touch_eid"], got[3]["touch_etype"],
            got[3]["touch_gap"]) == (2, "view", 10)
    assert got[4]["touch_eid"] == 2  # both purchases credit the view
    assert got[5]["touch_eid"] is None  # no prior touch
    assert got[7]["touch_eid"] == 6


def test_lookback_voids_stale_touches(spark, journey):
    got = {r["eid"]: r for r in _attr(journey, lookback=100).collect()}
    assert got[7]["touch_eid"] is None  # click was 180 units earlier
    assert got[7]["touch_gap"] is None
    assert got[3]["touch_eid"] == 2


def test_touch_conversion_same_event_credits_previous(spark):
    df = spark.createDataFrame(
        [(1, 10, 1, "click"), (1, 20, 2, "click")],
        "user int, ts int, eid int, etype string",
    )
    out = last_touch_attribution(
        df, "user", "ts",
        F.col("etype") == "click",
        F.col("etype") == "click",  # every click is also a conversion
        carry_cols=["eid"], tiebreak_cols=["eid"],
    ).collect()
    got = {r["eid"]: r["touch_eid"] for r in out}
    assert got == {1: None, 2: 1}  # never self-attributes


def test_generalize_integral_exact_past_2_53(spark):
    from esdb_spark.operators.privacy import (
        generalize_integral,
        generalize_numeric,
    )

    v = 9007199254740995  # 2^53 + 3: double rounds it to ...996
    df = spark.createDataFrame([(v,)], "x long")
    exact = df.select(generalize_integral("x", 4).alias("b")).first()["b"]
    assert exact == (v // 4) * 4  # 9007199254740992
    # the double path demonstrably mis-bands here — that is WHY the
    # integral variant exists
    approx = df.select(
        generalize_numeric("x", 4).cast("long").alias("b")
    ).first()["b"]
    assert approx != exact
    # negatives floor like SQL, not truncate toward zero
    dfn = spark.createDataFrame([(-7,)], "x long")
    assert dfn.select(generalize_integral("x", 4).alias("b")).first()["b"] == -8
