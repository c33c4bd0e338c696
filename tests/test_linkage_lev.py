"""Edit-distance linkage (operators/linkage.fuzzy_join_levenshtein):
symmetric-delete blocking must be lossless vs the brute-force
cross-join at d=1 and d=2."""

import itertools

import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.linkage import fuzzy_join_levenshtein


def _lev(a, b):
    # classic DP, for the pure-Python truth
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


NAMES = [
    "alpha", "alpho", "alpa", "beta", "betta", "bet", "gamma",
    "gama", "delta", "delta", "dalta", "x", "", "xy", "yx",
]


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NAMES)], "lid int, name string"
    )
    right = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(NAMES)],
        "rid int, name string",
    )
    return left, right


@pytest.mark.parametrize("d", [1, 2])
def test_matches_bruteforce(spark, sides, d):
    left, right = sides
    got = sorted(
        (r["lid"], r["rid"], r["dist"])
        for r in fuzzy_join_levenshtein(
            left, right, "name", "name", "lid", "rid", max_dist=d
        ).collect()
    )
    want = sorted(
        (i, 100 + j, _lev(a, b))
        for (i, a), (j, b) in itertools.product(
            enumerate(NAMES), enumerate(NAMES)
        )
        if _lev(a, b) <= d
    )
    assert got == want


def test_case_insensitive_and_dist_zero(spark):
    left = spark.createDataFrame([(1, "Widget")], "lid int, s string")
    right = spark.createDataFrame(
        [(2, "widget"), (3, "widgit"), (4, "gadget")],
        "rid int, s string",
    )
    got = {
        (r["rid"], r["dist"])
        for r in fuzzy_join_levenshtein(
            left, right, "s", "s", "lid", "rid", max_dist=1
        ).collect()
    }
    assert got == {(2, 0), (3, 1)}


def test_rejects_bad_distance(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join_levenshtein(
            left, right, "name", "name", "lid", "rid", max_dist=3
        )


def test_spark_levenshtein_matches_python(spark):
    # the verify step leans on Spark's levenshtein agreeing with the
    # textbook DP (and with DuckDB's — checked in oracle parity)
    pairs = [(a, b) for a in NAMES for b in NAMES]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = df.select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    ).collect()
    for r in got:
        assert r["d"] == _lev(r["a"], r["b"]), (r["a"], r["b"])
