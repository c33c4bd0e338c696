"""Grouped-map operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from esdb_spark.functions import epoch_us
from esdb_spark.operators.grouped import linear_fit_per_group, zscore_per_group
from esdb_spark.sources.tables import load_table


def test_linear_fit_recovers_known_slopes(spark):
    rows = []
    for g, (a, b) in {"g1": (2.0, 1.0), "g2": (-0.5, 3.0)}.items():
        for x in range(20):
            rows.append((g, float(x), a * x + b))
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    out = {r.key: r for r in linear_fit_per_group(df, "k", "x", "y").collect()}
    assert abs(out["g1"].slope - 2.0) < 1e-9
    assert abs(out["g1"].intercept - 1.0) < 1e-9
    assert out["g1"].r2 > 0.999999
    assert abs(out["g2"].slope + 0.5) < 1e-9
    assert out["g1"].n == 20


def test_linear_fit_degenerate_groups(spark):
    df = spark.createDataFrame(
        [("one", 1.0, 5.0), ("flat", 2.0, 7.0), ("flat", 2.0, 9.0)],
        ["k", "x", "y"],
    )
    out = {r.key: r for r in linear_fit_per_group(df, "k", "x", "y").collect()}
    assert out["one"].slope == 0.0 and out["one"].intercept == 5.0
    assert out["flat"].slope == 0.0 and out["flat"].intercept == 8.0


def test_linear_fit_real_events(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    fits = linear_fit_per_group(
        ev.select("event_type", epoch_us("ts").alias("t"), "value"),
        "event_type",
        "t",
        "value",
    ).collect()
    assert len(fits) == 5
    assert all(np.isfinite(r.slope) and 0 <= r.r2 <= 1 for r in fits)


def test_zscore_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)], ["k", "v"]
    )
    out = zscore_per_group(df, "k", "v").collect()
    zs = sorted(r.v_z for r in out if r.k == "a")
    assert abs(zs[1]) < 1e-12  # middle value → z = 0
    assert abs(zs[0] + zs[2]) < 1e-12  # symmetric
    assert [r.v_z for r in out if r.k == "b"] == [0.0]  # singleton → 0


def test_trimmed_mean_per_group_drops_outliers(spark):
    from esdb_spark.operators.grouped import trimmed_mean_per_group

    # 10 values: trim=0.1 drops 1 low + 1 high -> mean of the middle 8
    vals = [(1.0 * i) for i in range(1, 10)] + [1000.0]
    df = spark.createDataFrame([("a", v) for v in vals], ["k", "v"])
    row = trimmed_mean_per_group(df, "k", "v", trim=0.1).collect()[0]
    assert row["n"] == 10
    assert row["trimmed_mean"] == round(sum(range(2, 10)) / 8, 6)


def test_trimmed_mean_small_group_keeps_all(spark):
    from esdb_spark.operators.grouped import trimmed_mean_per_group

    df = spark.createDataFrame([("a", 1.0), ("a", 3.0)], ["k", "v"])
    row = trimmed_mean_per_group(df, "k", "v", trim=0.1).collect()[0]
    assert row["trimmed_mean"] == 2.0 and row["n"] == 2


def test_split_sentences_udtf(spark):
    from esdb_spark.operators.grouped import split_sentences

    df = spark.createDataFrame(
        [(1, "One here. Two there! Three maybe?  Four"), (2, "")],
        ["doc_id", "text"],
    )
    rows = sorted(
        (r["doc_id"], r["sentence_idx"], r["sentence"])
        for r in split_sentences(df, "text", "doc_id").collect()
    )
    assert rows == [
        (1, 0, "One here."),
        (1, 1, "Two there!"),
        (1, 2, "Three maybe?"),
        (1, 3, "Four"),
    ]  # empty doc yields no rows


def test_ewma_matches_pandas(spark):
    """Recurrence must equal pandas ewm(adjust=False) exactly — same
    multiply-add per step in float64."""
    import pandas as pd

    from esdb_spark.operators.grouped import ewma_per_key

    rows = [
        (k, i, float((i * 37 + k * 13) % 100) / 7.0)
        for k in range(5)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = (
        ewma_per_key(df, "k", ["t"], "v", alpha=0.25)
        .orderBy("k", "t")
        .toPandas()
    )
    pdf = pd.DataFrame(rows, columns=["k", "t", "v"]).sort_values(["k", "t"])
    want = pdf.groupby("k")["v"].transform(
        lambda s: s.ewm(alpha=0.25, adjust=False).mean()
    )
    assert (got["ewma"].to_numpy() == want.to_numpy()).all()


def test_ewma_stable_under_repartition(spark):
    from esdb_spark.operators.grouped import ewma_per_key

    rows = [(k, i, float(i % 13)) for k in range(3) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    a = ewma_per_key(df, "k", ["t"], "v", 0.25).orderBy("k", "t").collect()
    b = (
        ewma_per_key(df.repartition(7), "k", ["t"], "v", 0.25)
        .orderBy("k", "t")
        .collect()
    )
    assert a == b


def test_ewma_alpha_validation(spark):
    import pytest as _pytest

    from esdb_spark.operators.grouped import ewma_per_key

    df = spark.createDataFrame([(1, 1, 1.0)], "k long, t long, v double")
    with _pytest.raises(ValueError):
        ewma_per_key(df, "k", ["t"], "v", alpha=0.0)
    with _pytest.raises(ValueError):
        ewma_per_key(df, "k", ["t"], "v", alpha=1.5)


def test_ewma_carry_across_arrow_batches(spark):
    """Force multi-batch partitions (tiny Arrow batch size) so the
    batch-boundary carry path is exercised; results must be identical
    to the single-batch run."""
    from esdb_spark.operators.grouped import ewma_per_key

    rows = [(k, i, float((i * 7 + k) % 19)) for k in range(3) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, t long, v double").coalesce(1)
    base = ewma_per_key(df, "k", ["t"], "v", 0.25).orderBy("k", "t").collect()
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "13")  # splits every key's series across batches
    try:
        tiny = (
            ewma_per_key(df, "k", ["t"], "v", 0.25).orderBy("k", "t").collect()
        )
    finally:
        spark.conf.set(key, old)
    assert tiny == base


def test_trimmed_mean_skips_nulls_like_builtin_aggregates(spark):
    from esdb_spark.operators.grouped import trimmed_mean_per_group

    clean = spark.createDataFrame(
        [("a", float(v)) for v in range(10)], "k string, v double"
    )
    noisy = clean.unionByName(
        spark.createDataFrame([("a", None)], "k string, v double")
    )
    a = trimmed_mean_per_group(clean, "k", "v").collect()[0]
    b = trimmed_mean_per_group(noisy, "k", "v").collect()[0]
    assert a["trimmed_mean"] == b["trimmed_mean"]
    assert a["n"] == b["n"] == 10
