"""Market-basket co-occurrence (operators/cooccur.py): pair counts,
supports, lift, set semantics, the max_basket s² guard."""

import pytest

from esdb_spark.operators.cooccur import cooccurrence_pairs


@pytest.fixture(scope="module")
def baskets(spark):
    return spark.createDataFrame(
        [
            (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "a"),  # duplicate observation: counts once
            (4, "b"), (4, "c"),
        ],
        "basket int, item string",
    )


def test_pair_counts_supports_and_lift(spark, baskets):
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_pairs(baskets, "basket", "item").collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["n_both"], ab["n_a"], ab["n_b"], ab["n_groups"]) == (
        2, 3, 3, 4,
    )
    assert ab["lift"] == pytest.approx(2 * 4 / (3 * 3))
    bc = out[("b", "c")]
    assert (bc["n_both"], bc["n_a"], bc["n_b"]) == (2, 3, 2)


def test_min_pairs_filters(spark, baskets):
    out = cooccurrence_pairs(
        baskets, "basket", "item", min_pairs=2
    ).collect()
    assert sorted((r["item_a"], r["item_b"]) for r in out) == [
        ("a", "b"), ("b", "c"),
    ]


def test_max_basket_prunes_universe(spark, baskets):
    # basket 1 (3 items) dropped; all counts describe the remainder
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_pairs(
            baskets, "basket", "item", max_basket=2
        ).collect()
    }
    assert set(out) == {("a", "b"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["n_both"], ab["n_a"], ab["n_b"], ab["n_groups"]) == (
        1, 2, 2, 3,
    )


def test_single_item_baskets_yield_nothing(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y")], "basket int, item string"
    )
    assert cooccurrence_pairs(df, "basket", "item").count() == 0


def test_cooccurrence_similarity_cosine_model(spark):
    from esdb_spark.operators.cooccur import cooccurrence_similarity

    # baskets: {1,2} x3, {1,3} x1 -> support 1:4, 2:3, 3:1
    rows = [(g, i) for g in range(3) for i in (1, 2)] + [(9, 1), (9, 3)]
    df = spark.createDataFrame(rows, "g int, item int")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_similarity(df, "g", "item").collect()
    }
    import math

    assert out[(1, 2)]["n_both"] == 3
    assert out[(1, 2)]["sim"] == 3 / math.sqrt(4.0 * 3.0)
    assert out[(1, 3)]["sim"] == 1 / math.sqrt(4.0 * 1.0)


def test_cooccurrence_similarity_topk(spark):
    import pytest as _pt

    from esdb_spark.operators.cooccur import cooccurrence_similarity

    # item 1 pairs strongly with 2 and weakly with 3 and 4; items 3,4
    # pair strongly with each other. k=1: (1,2) survives (both sides'
    # top-1), (3,4) survives, and the weak (1,3)/(1,4) pairs are
    # top-1 on NEITHER side -> they must be EXCLUDED (the k filter
    # must actually filter — review finding)
    rows = (
        [(g, i) for g in range(5) for i in (1, 2)]
        + [(g, i) for g in range(10, 14) for i in (3, 4)]
        + [(20, 1), (20, 3), (21, 1), (21, 4), (21, 3)]
    )
    df = spark.createDataFrame(rows, "g int, item int")
    got = {
        (r["item_a"], r["item_b"])
        for r in cooccurrence_similarity(df, "g", "item", k=1).collect()
    }
    assert (1, 2) in got and (3, 4) in got
    assert (1, 3) not in got and (1, 4) not in got
    with _pt.raises(ValueError):
        cooccurrence_similarity(df, "g", "item", k=0)


def test_guard_basket_raises_on_degenerate_basket(spark):
    import pytest as _pt

    from esdb_spark.operators.cooccur import cooccurrence_pairs

    # one 40-item basket predicts 780 pairs; guard at 100 must raise
    # naming the worst basket BEFORE the self-join runs
    rows = [(1, i) for i in range(40)] + [(2, 1), (2, 2)]
    df = spark.createDataFrame(rows, "g int, item int")
    with _pt.raises(ValueError, match="worst basket 1"):
        cooccurrence_pairs(df, "g", "item", guard_basket=100)
    # under the bound: identical output to the unguarded call
    guarded = cooccurrence_pairs(
        df, "g", "item", guard_basket=10_000
    ).collect()
    plain = cooccurrence_pairs(df, "g", "item").collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, plain))
    # max_basket prunes FIRST: the degenerate basket drops, so the
    # guard sees only the surviving fanout and passes
    pruned = cooccurrence_pairs(
        df, "g", "item", max_basket=5, guard_basket=100
    ).collect()
    assert len(pruned) == 1  # just (1, 2) from basket 2
