"""Data-quality expectations (operators/expectations.py): one-pass
rule evaluation, NULL semantics, empty-frame behavior."""

import pytest

from esdb_spark.operators.expectations import (
    accepted_values,
    check,
    in_range,
    matches,
    not_null,
    null_rate_below,
    row_count_between,
    unique,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "en", 10.0, "a@x.com"),
        (2, "en", 55.0, "b@y.org"),
        (3, None, -5.0, "not-an-email"),
        (4, "de", 200.0, None),
        (4, "fr", 30.0, "c@z.net"),   # duplicate id
    ]
    return spark.createDataFrame(rows, "id int, lang string, v double, email string")


def test_rules_one_pass(spark, frame):
    out = {
        r["rule"]: r
        for r in check(
            frame,
            [
                not_null("id"),
                not_null("lang"),
                null_rate_below("lang", 0.5),
                unique("id"),
                unique("email"),
                in_range("v", 0.0, 100.0),
                accepted_values("lang", ["en", "de", "fr"]),
                row_count_between(1, 10),
                matches("email", r"^[^@]+@[^@]+\.[a-z]+$", p=0.7),
            ],
        ).collect()
    }
    assert out["not_null(id)"]["passed"] is True
    assert out["not_null(lang)"]["passed"] is False
    assert out["not_null(lang)"]["metric"] == pytest.approx(0.2)
    assert out["null_rate_below(lang,0.5)"]["passed"] is True
    assert out["unique(id)"]["passed"] is False
    assert out["unique(id)"]["metric"] == 1.0  # one excess duplicate
    assert out["unique(email)"]["passed"] is True  # NULL ignored
    assert out["in_range(v,0.0,100.0)"]["passed"] is False
    assert out["in_range(v,0.0,100.0)"]["metric"] == 2.0  # -5 and 200
    assert out["accepted_values(lang,en|de|fr)"]["passed"] is True  # NULL ignored
    assert out["row_count_between(1,10)"]["passed"] is True
    # 3 of 4 non-null emails match = 0.75 >= 0.7
    assert out["matches(email,^[^@]+@[^@]+\\.[a-z]+$,0.7)"]["passed"] is True
    assert out["matches(email,^[^@]+@[^@]+\\.[a-z]+$,0.7)"]["metric"] == pytest.approx(0.75)


def test_single_job_plan(spark, frame):
    """All rules evaluate in ONE aggregation: the plan carries exactly
    one Aggregate over the scan (the gate must not cost a job per
    rule at 100 TB)."""
    out = check(frame, [not_null("id"), unique("id"), in_range("v", 0, 1)])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1, plan


def test_empty_frame_semantics(spark):
    df = spark.createDataFrame([], "id int, v double")
    out = {
        r["rule"]: r
        for r in check(
            df,
            [not_null("id"), unique("id"), in_range("v", 0, 1),
             row_count_between(1, 10), matches("id", r"\d", p=0.5)],
        ).collect()
    }
    # evidence-free rules: unique/in_range pass vacuously; null-rate,
    # row-count and matches rules FAIL (avg over zero rows is NULL ->
    # coalesced to not-passed: an empty corpus is not a validated one)
    assert out["not_null(id)"]["passed"] is False
    assert out["not_null(id)"]["metric"] is None
    assert out["unique(id)"]["passed"] is True
    assert out["in_range(v,0.0,1.0)"]["passed"] is True
    assert out["row_count_between(1,10)"]["passed"] is False
    assert out["matches(id,\\d,0.5)"]["passed"] is False  # no evidence -> fail


def test_validation_errors(spark, frame):
    with pytest.raises(ValueError, match="empty rule"):
        check(frame, [])
    with pytest.raises(ValueError, match="duplicate rule"):
        check(frame, [not_null("id"), not_null("id")])


def test_split_distinct_avoids_expand(spark, frame):
    """split_distinct=True: with two unique() rules the default plan
    carries Spark's multi-distinct Expand (input replicated per
    distinct aggregate); split mode removes it — no Expand anywhere —
    at the cost of one extra pass, with identical results in the
    caller's rule order."""
    rules = [
        not_null("id"),
        unique("id"),
        unique("email"),
        in_range("v", 0.0, 100.0),
    ]
    fused = check(frame, rules)
    split = check(frame, rules, split_distinct=True)
    fused_plan = fused._jdf.queryExecution().executedPlan().toString()
    split_plan = split._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in fused_plan
    assert "Expand" not in split_plan
    f_rows = [tuple(r) for r in fused.collect()]
    s_rows = [tuple(r) for r in split.collect()]
    assert f_rows == s_rows
    assert [r[0] for r in f_rows] == [r["rule"] for r in rules]
    # degenerate split (≤1 unique rule): same single-pass plan as fused
    one = check(frame, [not_null("id"), unique("id")], split_distinct=True)
    assert "Expand" not in one._jdf.queryExecution().executedPlan().toString()
