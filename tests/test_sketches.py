"""Frequency-sketch operators: exact heavy hitters (Misra-Gries
candidates + exact recount) and the DataFrame-native count-min."""

import pytest
from pyspark.sql import functions as F

from esdb_spark.operators.sketches import (
    cms_estimate,
    count_min_table,
    heavy_hitters,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 10_000 rows: item "hot" 30%, "warm" 10%, long tail of 1-count ids
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 3, F.lit("hot"))
        .when(F.col("id") % 10 == 3, F.lit("warm"))
        .otherwise(F.concat(F.lit("tail"), F.col("id").cast("string")))
        .alias("item")
    )


def test_heavy_hitters_exact_matches_groupby(spark, skewed):
    """The sketch path must return exactly the HAVING-clause answer."""
    for k in (5, 20, 100):
        got = {
            (r["item"], r["cnt"])
            for r in heavy_hitters(skewed, "item", k=k).collect()
        }
        total = skewed.count()
        want = {
            (r["item"], r["n"])
            for r in skewed.groupBy("item")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") * k > total)
            .collect()
        }
        assert got == want, f"k={k}"
    assert ("hot", 3000) in got


def test_heavy_hitters_no_false_negatives_across_partitioning(spark, skewed):
    """The MG guarantee must hold however the data is partitioned."""
    # k=15 → threshold N/15 ≈ 667: both "hot" (3000) and "warm" (1000)
    # are true heavy hitters and must survive any partitioning
    for parts in (1, 7, 32):
        got = {
            r["item"]
            for r in heavy_hitters(skewed.repartition(parts), "item", k=15).collect()
        }
        assert {"hot", "warm"} <= got


def test_heavy_hitters_plan_never_shuffles_raw_keys(spark, skewed):
    """The only groupBy keys are broadcast-joined candidates; the raw
    key space must not be exchanged before the semi-join."""
    from esdb_spark.plans import physical_plan

    plan = physical_plan(heavy_hitters(skewed, "item", k=8))
    assert "BroadcastHashJoin" in plan


def test_heavy_hitters_k_validation(spark, skewed):
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(skewed, "item", k=0)


def test_count_min_overestimates_only(spark, skewed):
    table = count_min_table(skewed, "item", depth=5, width=256)
    assert table.count() <= 5 * 256
    exact = {
        r["item"]: r["n"]
        for r in skewed.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    ests = cms_estimate(
        table, ["hot", "warm", "tail77", "never-seen"], depth=5, width=256
    )
    assert ests["hot"] >= exact["hot"]
    assert ests["warm"] >= exact["warm"]
    assert ests["tail77"] >= 1
    # CM error bound: overestimate ≤ ~e·N/width with high probability;
    # allow a loose multiple to keep the test deterministic-friendly
    n = skewed.count()
    assert ests["hot"] - exact["hot"] <= 10 * n // 256
    assert ests["never-seen"] <= 10 * n // 256


def test_hll_rollup_accuracy_and_merge(spark):
    from esdb_spark.operators.sketches import hll_rollup, hll_union_estimate

    rows = [(i % 7, (i * 131) % 1000) for i in range(20000)]
    df = spark.createDataFrame(rows, "day int, user_id long")
    daily = hll_rollup(df, ["day"], "user_id", lg_k=12)
    assert daily.count() == 7
    # union the daily sketches to a global estimate and compare exact
    merged = hll_union_estimate(daily, [])
    est = merged.collect()[0]["approx_distinct"]
    exact = df.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05
    # merge algebra: union-of-daily must closely match one global sketch
    direct = df.groupBy().agg(
        __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
            "hll_sketch_estimate(hll_sketch_agg(user_id, 12))"
        ).alias("d")
    ).collect()[0]["d"]
    assert abs(est - direct) <= max(2, 0.01 * exact)


def test_quantile_rollup_rank_error_bound(spark):
    """percentile_approx guarantees rank error <= n/accuracy: the
    estimate must be a value whose exact rank is within that band of
    the target rank."""
    from esdb_spark.operators.sketches import quantile_rollup
    from esdb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    acc = 1000
    got = quantile_rollup(
        ev, "value", ["event_type"], probs=(0.25, 0.5, 0.75), accuracy=acc
    ).collect()
    assert len(got) > 0
    vals_by_type = {
        r["event_type"]: sorted(v["value"] for v in rows)
        for r in got
        for rows in [
            ev.filter(F.col("event_type") == r["event_type"])
            .select("value")
            .collect()
        ]
    }
    for r in got:
        vals = vals_by_type[r["event_type"]]
        n = len(vals)
        for p, col in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            est = r[col]
            # exact rank band of the estimate within the sorted values
            import bisect

            lo = bisect.bisect_left(vals, est)
            hi = bisect.bisect_right(vals, est)
            target = p * n
            slack = n / acc + 1
            assert lo - slack <= target <= hi + slack, (
                r["event_type"],
                col,
                est,
            )


def test_quantile_rollup_schema(spark):
    from esdb_spark.operators.sketches import quantile_rollup
    from esdb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = quantile_rollup(ev, "value", ["event_type"], probs=(0.1, 0.99))
    assert out.columns == ["event_type", "q10", "q99"]


def test_count_min_portable_matches_python_model(spark, skewed):
    """portable=True: md5-derived buckets are engine-replayable — a
    pure-python md5 model reconstructs the identical sketch cells and
    estimates (the property the DuckDB gate oracle relies on), and the
    lazy cms_estimate_df face agrees with the collect-based one."""
    import hashlib

    from esdb_spark.operators.sketches import cms_estimate_df

    depth, width = 5, 256
    table = count_min_table(
        skewed, "item", depth=depth, width=width, portable=True
    )
    cells = {(r["row"], r["bucket"]): r["cnt"] for r in table.collect()}

    def bucket(i, v):
        h = hashlib.md5(f"cms{i}|{v}".encode()).hexdigest()[:15]
        return int(h, 16) % width

    model = {}
    for r in skewed.collect():
        if r["item"] is None:
            continue
        for i in range(depth):
            k = (i, bucket(i, r["item"]))
            model[k] = model.get(k, 0) + 1
    assert cells == model

    items = ["hot", "warm", "tail77", "never-seen"]
    model_est = {
        v: min(model.get((i, bucket(i, v)), 0) for i in range(depth))
        for v in items
    }
    df_est = {
        r["item"]: r["est"]
        for r in cms_estimate_df(
            table,
            spark.createDataFrame([(v,) for v in items], ["x"]),
            "x",
            depth=depth,
            width=width,
            portable=True,
        ).collect()
    }
    assert df_est == model_est
    exact = {
        r["item"]: r["n"]
        for r in skewed.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    assert df_est["hot"] >= exact["hot"]


def test_merge_count_min_equals_rebuild(spark):
    # the linear-sketch invariant: cell-wise merge of two partial
    # sketches EQUALS the sketch of the union, cell for cell
    import pytest as _pt

    from esdb_spark.operators.sketches import (
        count_min_table,
        merge_count_min,
    )

    rows = [(i, f"v{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "id int, v string")
    a = df.filter("id % 3 = 0")
    b = df.filter("id % 3 != 0")
    merged = merge_count_min([
        count_min_table(a, "v", depth=3, width=64),
        count_min_table(b, "v", depth=3, width=64),
    ])
    full = count_min_table(df, "v", depth=3, width=64)
    key = lambda d: sorted((r["row"], r["bucket"], r["cnt"]) for r in d.collect())
    assert key(merged) == key(full)
    with _pt.raises(ValueError):
        merge_count_min([])
