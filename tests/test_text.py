"""Text-analysis operator tests."""

import pytest
from pyspark.sql import functions as F

from esdb_spark.operators.text import (
    with_fingerprint,
    with_language_guess,
    with_quality,
    with_token_stats,
)
from esdb_spark.sources.tables import load_table


def test_token_stats(spark):
    df = spark.createDataFrame(
        [(1, "Hello  world  foo"), (2, ""), (3, "   ")], ["id", "text"]
    )
    out = {r.id: r for r in with_token_stats(df, "text").collect()}
    assert out[1].n_tokens == 3
    assert abs(out[1].avg_token_len - 13 / 3) < 1e-9  # (5+5+3)/3
    assert out[2].n_tokens == 0
    assert out[3].n_tokens == 0


def test_quality_score_bounds(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = with_quality(docs, "text")
    stats = out.agg(
        F.min("quality_score").alias("lo"), F.max("quality_score").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats.lo <= stats.hi <= 1.0
    # punctuation-free lowercase word soup → alpha ratio high, punct 0
    row = out.limit(1).collect()[0]
    assert row.punct_ratio == 0.0


def test_language_guess(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the market in the morning"),
            (2, "der hund und die katze ist nicht zu hause heute"),
            (3, "el perro y la gata en los campos de la casa"),
            (4, "xyzzy plugh qwerty"),
        ],
        ["id", "text"],
    )
    out = {r.id: r.lang_guess for r in with_language_guess(df, "text").collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        ["id", "text"],
    )
    out = {r.id: r for r in with_fingerprint(df, "text").collect()}
    # md5 fingerprint is whitespace/case-insensitive
    assert out[1].fingerprint_md5 == out[2].fingerprint_md5
    assert out[1].fingerprint_md5 != out[3].fingerprint_md5
    assert out[1].fingerprint_rolling == out[2].fingerprint_rolling
