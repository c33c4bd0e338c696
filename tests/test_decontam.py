"""Decontamination operator semantics (operators/decontam.py)."""

import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.decontam import decontaminate, ngram_contamination


@pytest.fixture(scope="module")
def corpora(spark):
    eval_rows = [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "pack my box with five dozen liquor jugs right now"),
    ]
    train_rows = [
        # verbatim copy of an eval doc -> fully contaminated
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        # shares a 5-gram window ("pack my box with five dozen")
        (2, "we pack my box with five dozen apples from the market stall"),
        # clean
        (3, "completely unrelated text about distributed query planning"),
        # too short for any 5-gram
        (4, "tiny doc"),
    ]
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    tr = spark.createDataFrame(train_rows, "doc_id long, text string")
    return tr, ev


def test_contamination_stats(spark, corpora):
    tr, ev = corpora
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(tr, ev, n=5, threshold=0.1).collect()
    }
    assert out[1]["contamination"] == 1.0 and out[1]["contaminated"]
    assert out[2]["matched_ngrams"] == 2  # two overlapping 5-gram windows
    assert out[2]["contaminated"]  # 2/8 = 0.25 >= 0.1
    assert out[3]["matched_ngrams"] == 0 and not out[3]["contaminated"]
    # zero-gram doc: present, 0/0 -> 0.0, clean
    assert out[4]["total_ngrams"] == 0
    assert out[4]["contamination"] == 0.0 and not out[4]["contaminated"]


def test_decontaminate_filters(spark, corpora):
    tr, ev = corpora
    kept = sorted(
        r["doc_id"] for r in decontaminate(tr, ev, n=5, threshold=0.1).collect()
    )
    assert kept == [3, 4]


def test_decontaminate_keeps_all_columns(spark, corpora):
    tr, ev = corpora
    assert decontaminate(tr, ev).columns == tr.columns


def test_eval_side_is_broadcast(spark, corpora):
    tr, ev = corpora
    plan = ngram_contamination(tr, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
