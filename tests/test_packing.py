"""Sequence packing + weighted interleave operator semantics
(operators/packing.py) — invariants the oracle parity test can't
state directly."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.packing import interleave_sources, pack_greedy


@pytest.fixture(scope="module")
def sizes_df(spark):
    rows = [(i, (i * 37) % 900 + 100) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_respects_budget(spark, sizes_df):
    out = pack_greedy(sizes_df, "doc_id", "n_tokens", budget=1000, n_shards=4)
    joined = out.join(sizes_df, "doc_id").toPandas()
    fills = (
        joined.groupby(["shard", "bin"])["n_tokens"].sum().reset_index(name="fill")
    )
    per_bin_docs = joined.groupby(["shard", "bin"]).size()
    # a bin only exceeds the budget when a single oversized doc owns it
    for (_, _), fill, n_docs in zip(
        fills[["shard", "bin"]].itertuples(index=False),
        fills["fill"],
        per_bin_docs.values,
    ):
        assert fill <= 1000 or n_docs == 1


def test_pack_offsets_are_running_fills(spark, sizes_df):
    out = pack_greedy(sizes_df, "doc_id", "n_tokens", budget=1000, n_shards=4)
    joined = out.join(sizes_df, "doc_id").toPandas().sort_values("doc_id")
    for (_, _), grp in joined.groupby(["shard", "bin"]):
        grp = grp.sort_values("doc_id")
        expect = 0
        for _, row in grp.iterrows():
            assert row["offset"] == expect
            expect += row["n_tokens"]


def test_pack_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(0, 50), (8, 5000), (16, 60)], "doc_id long, n_tokens long"
    )  # one shard (all ids % 8 == 0)
    out = (
        pack_greedy(df, "doc_id", "n_tokens", budget=100, n_shards=8)
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(out["bin"]) == [0, 1, 2]
    assert list(out["offset"]) == [0, 0, 0]


def test_pack_deterministic(spark, sizes_df):
    a = pack_greedy(sizes_df, "doc_id", "n_tokens", budget=1000, n_shards=4)
    b = pack_greedy(sizes_df, "doc_id", "n_tokens", budget=1000, n_shards=4)
    pa = a.toPandas().sort_values("doc_id").reset_index(drop=True)
    pb = b.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb)


@pytest.fixture(scope="module")
def mix_df(spark):
    rows = []
    for s, w, n in [("web", 3.0, 90), ("code", 1.0, 30), ("math", 2.0, 60)]:
        for i in range(n):
            rows.append((s, w, hash(s) % 97 * 1000 + i))
    return spark.createDataFrame(rows, "source string, weight double, doc_id long")


def test_interleave_pos_is_permutation(spark, mix_df):
    out = interleave_sources(mix_df, "source", "weight", "doc_id").toPandas()
    assert sorted(out["pos"]) == list(range(1, len(out) + 1))


def test_interleave_rates_track_weights(spark, mix_df):
    out = (
        interleave_sources(mix_df, "source", "weight", "doc_id")
        .toPandas()
        .sort_values("pos")
    )
    head = out.head(60)
    counts = head["source"].value_counts()
    # weights 3:1:2 over the first 60 positions -> ~30/10/20 (stride
    # scheduling keeps running mix within one stride of exact)
    assert abs(counts.get("web", 0) - 30) <= 2
    assert abs(counts.get("code", 0) - 10) <= 2
    assert abs(counts.get("math", 0) - 20) <= 2


def test_interleave_source_order_preserved(spark, mix_df):
    out = (
        interleave_sources(mix_df, "source", "weight", "doc_id")
        .toPandas()
        .sort_values("pos")
    )
    for _, grp in out.groupby("source"):
        ids = list(grp["doc_id"])
        assert ids == sorted(ids)  # within a source, id order survives


def test_upsample_by_weight_semantics(spark):
    from esdb_spark.operators.packing import upsample_by_weight

    rows = [(i, "s", 2.0) for i in range(100)] + [
        (100 + i, "t", 0.5) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, weight double")
    out = upsample_by_weight(df, "weight", "doc_id", seed=1).toPandas()
    s = out[out["source"] == "s"]
    t = out[out["source"] == "t"]
    # integer weight 2.0: exactly two copies of every row, epoch_copy 0/1
    assert len(s) == 200
    assert set(s["epoch_copy"]) == {0, 1}
    # fractional 0.5: kept subset is a hash coin flip, near half, stable
    assert 60 <= len(t) <= 140
    assert set(t["epoch_copy"]) == {0}
    again = upsample_by_weight(df, "weight", "doc_id", seed=1).toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])
    other = upsample_by_weight(df, "weight", "doc_id", seed=2).toPandas()
    assert sorted(out["doc_id"]) != sorted(other["doc_id"])  # new epoch


def test_temperature_weights_sqrt_and_normalized(spark):
    from esdb_spark.operators.packing import temperature_weights

    import math

    df = spark.createDataFrame(
        [("a", i) for i in range(16)] + [("b", i) for i in range(4)],
        "source string, doc_id int",
    )
    raw = {r["source"]: r for r in temperature_weights(
        df, "source", alpha=0.5, normalize=False).collect()}
    assert raw["a"]["n_rows"] == 16 and raw["a"]["weight"] == 4.0
    assert raw["b"]["weight"] == 2.0
    norm = {r["source"]: r["weight"] for r in temperature_weights(
        df, "source", alpha=0.5).collect()}
    assert abs(norm["a"] - 4 / 6) < 1e-12 and abs(norm["b"] - 2 / 6) < 1e-12
    # alpha=1 keeps natural proportions; alpha=0 is uniform
    nat = {r["source"]: r["weight"] for r in temperature_weights(
        df, "source", alpha=1.0).collect()}
    assert abs(nat["a"] - 0.8) < 1e-12
    uni = {r["source"]: r["weight"] for r in temperature_weights(
        df, "source", alpha=0.0).collect()}
    assert abs(uni["a"] - 0.5) < 1e-12


def test_with_temperature_weight_broadcast_join(spark):
    from esdb_spark.operators.packing import with_temperature_weight

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), (None, 4)],
        "source string, doc_id int",
    )
    out = with_temperature_weight(df, "source")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 4  # NULL-source row survives the left join
    assert abs(rows[1]["weight"] - 2 ** 0.5) < 1e-12
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the docstring's contract: the join back IS a broadcast (no
    # corpus shuffle) — assert it positively
    assert "BroadcastHashJoin" in plan, plan
    # pre-existing out_col must be rejected, not silently duplicated
    import pytest

    with pytest.raises(ValueError, match="already exists"):
        with_temperature_weight(out, "source")


def test_interleave_checkpointed_input(spark):
    """Regression (round 5): the in-plan offsets self-join resolved
    ambiguously when the input was a checkpointed frame
    (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at bind time) — qualified
    aliases in the join condition fix it. Checkpointed inputs are the
    common composed shape (scale probe, pipeline stages)."""
    rows = [(i, f"src{i % 3}", 1.0 + (i % 3)) for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, weight double"
    ).localCheckpoint(eager=True)
    out = interleave_sources(df, "source", "weight", "doc_id").toPandas()
    assert sorted(out["pos"]) == list(range(1, 61))


def test_interleave_extra_columns_keeps_null_id(spark):
    """Review r5: the payload join-back used a null-unsafe name
    equi-join, silently dropping a NULL-id row the ranks had counted
    (hole in pos). eqNullSafe join-back fixes it."""
    df = spark.createDataFrame(
        [(1, "a", 1.0, "x"), (2, "a", 1.0, "y"), (None, "b", 2.0, "z")],
        "doc_id int, source string, weight double, text string",
    )
    out = interleave_sources(df, "source", "weight", "doc_id").collect()
    assert len(out) == 3
    assert sorted(r["pos"] for r in out) == [1, 2, 3]
    assert {r["text"] for r in out} == {"x", "y", "z"}


def test_interleave_url_ids_spread_buckets(spark):
    """Review r5: string ids sharing a long common prefix (URL-shaped)
    collapsed to ONE monotone key → one id-bucket → whole-source
    single-task rank. The corpus-wide LCP is now stripped before the
    8-byte cut."""
    from pyspark.sql import functions as F, types as T

    from esdb_spark.operators.packing import (
        _common_prefix_len,
        _monotone_double,
    )

    rows = [
        (f"https://example.com/articles/{i:06d}", "web", 1.0)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, weight double")
    lcp = _common_prefix_len(df, "doc_id", T.StringType())
    assert lcp >= len("https://example.com/articles/")
    n_keys = (
        df.select(
            _monotone_double(F.col("doc_id"), T.StringType(), lcp).alias("mk")
        )
        .distinct()
        .count()
    )
    assert n_keys == 500  # fully spread once the prefix is stripped
    # and the operator end-to-end still yields an exact permutation
    out = interleave_sources(df, "source", "weight", "doc_id").toPandas()
    assert sorted(out["pos"]) == list(range(1, 501))
    ordered = out.sort_values("pos")["doc_id"].tolist()
    assert ordered == sorted(ordered)  # id order preserved within source
