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
