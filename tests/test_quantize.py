"""int8 embedding storage codec (operators/quantize.py): roundtrip
error bounds, edge vectors, portable rounding."""

import math

import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.quantize import (
    dequantize_int8,
    quantization_error_stats,
    quantize_int8,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.001, 0.002, -0.003, 0.004]),
        (2, [0.0, 0.0, 0.0, 0.0]),           # zero vector
        (3, None),                             # NULL vector
        (4, [100.0, -100.0, 50.0, -50.0]),
        (5, [None, 1.0, None, -1.0]),          # NULL elements
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_codes_bounded_and_typed(spark, vecs):
    q = quantize_int8(vecs, "embedding")
    assert dict(q.dtypes)["q8"] == "array<tinyint>"
    rows = {r["vec_id"]: r for r in q.collect()}
    for vid, r in rows.items():
        if r["q8"] is None:
            assert vid == 3
            continue
        assert all(-127 <= c <= 127 for c in r["q8"])
    # extreme element maps to exactly ±127
    assert 127 in rows[4]["q8"] and -127 in rows[4]["q8"]
    # zero vector: scale 0, all-zero codes — NOT NULL
    assert rows[2]["q8_scale"] == 0.0 and set(rows[2]["q8"]) == {0}
    # NULL elements quantize to 0, length preserved
    assert rows[5]["q8"] == [0, 127, 0, -127]


def test_roundtrip_error_bound(spark, vecs):
    out = dequantize_int8(quantize_int8(vecs, "embedding")).collect()
    for r in out:
        if r["embedding"] is None:
            continue
        scale = r["q8_scale"]
        for x, xh in zip(r["embedding"], r["vec_hat"]):
            if x is None:
                continue
            # symmetric rounding: |x - x̂| <= scale/2
            assert abs(x - xh) <= scale / 2 + 1e-12, (x, xh, scale)


def test_error_stats_shape_and_bounds(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(v) for v in rng.standard_normal(64)], f"g{i % 2}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>, g string")
    glob = quantization_error_stats(df, "embedding").collect()[0]
    assert glob["n_vectors"] == 200
    # RMS error of symmetric int8 on N(0,1): <= max|x|/254 per dim in
    # the worst case; empirically ~1e-2 relative — assert a loose bound
    assert 0 < glob["mean_rms"] < 0.05
    assert glob["max_rms"] < 0.1
    per_g = quantization_error_stats(df, "embedding", ["g"]).collect()
    assert {r["g"] for r in per_g} == {"g0", "g1"}
    assert sum(r["n_vectors"] for r in per_g) == 200


def test_rounding_is_half_away_from_zero(spark):
    # scale = 1 exactly when max|x| = 127: codes are round-half-away(x)
    df = spark.createDataFrame(
        [(0, [127.0, 2.5, -2.5, 0.5, -0.5])],
        "vec_id int, embedding array<double>",
    )
    r = quantize_int8(df, "embedding").collect()[0]
    assert r["q8_scale"] == 1.0
    assert r["q8"] == [127, 3, -3, 1, -1]  # .5 rounds AWAY, both signs


def test_quantize_guards_and_composition(spark):
    """Review r5.2: pre-existing q8/q8_scale/vec_hat columns must
    raise, not be silently replaced; error stats compose with frames
    that already carry codes (projection isolates them)."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id int, embedding array<double>"
    )
    q = quantize_int8(df, "embedding")
    with pytest.raises(ValueError, match="already exists"):
        quantize_int8(q, "embedding")
    d = dequantize_int8(q)
    with pytest.raises(ValueError, match="already exists"):
        dequantize_int8(d)
    # error stats on an already-quantized frame: fine (projection)
    row = quantization_error_stats(q, "embedding").collect()[0]
    assert row["n_vectors"] == 1
    with pytest.raises(ValueError, match="reserved"):
        quantization_error_stats(
            q.withColumnRenamed("vec_id", "_rms"), "embedding", ["_rms"]
        )
