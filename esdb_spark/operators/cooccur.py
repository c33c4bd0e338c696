"""Item co-occurrence / market-basket analysis: which items appear
together in the same group, with support counts and lift.

The classic association shape (Agrawal & Srikant's frequent-itemset
setting, restricted to pairs — the level that matters for "customers
who bought X also bought Y" and for corpus work like "sources that
co-cite", "tags that co-occur"). Counts are integers and lift is one
fixed per-row IEEE expression, so the whole output is engine-exact.

Scale posture: the only data-sized shuffle keys on the GROUP id (the
basket). Pair generation is a per-group self-join — fanout is
``s·(s-1)/2`` per basket of ``s`` distinct items, which is fine for
real baskets (tens of items) and fatal for degenerate ones (a "basket"
of a million items), so ``max_basket`` drops oversized groups BEFORE
the join with pruned-universe semantics mirroring
``linkage.fuzzy_join_trigram(max_posting=...)``: pair counts, item
supports, and the group total are all computed over the surviving
baskets only, keeping lift internally consistent. Item supports are a
partial-agged (item) count whose join onto the pair table broadcasts
(|items| ≪ |pairs|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_pairs: int = 1,
    max_basket: int | None = None,
    guard_basket: int | None = None,
) -> DataFrame:
    """Pairwise co-occurrence counts with supports and lift.

    Output: one row per unordered item pair seen in ≥ ``min_pairs``
    groups — ``(item_a, item_b, n_both, n_a, n_b, n_groups, lift)``
    with ``item_a < item_b``; ``n_a``/``n_b`` are the items' group
    supports, ``n_groups`` the total group count, and
    ``lift = (n_both·n_groups)/(n_a·n_b)`` (>1 ⇒ the pair co-occurs
    more than independence predicts). Duplicate (group, item)
    observations count once — baskets are sets.

    ``max_basket``: drop groups with more distinct items than this
    before pair generation (the s² guard); all counts then describe
    the pruned universe.

    ``guard_basket``: opt-in pre-flight probe mirroring
    ``linkage.fuzzy_join_trigram(guard_product=...)`` — before
    building the pair join, compute the exact predicted pair fanout
    ``Σ s·(s−1)/2`` over surviving baskets (one |groups|-row
    aggregation, a tiny fraction of the join it predicts) and raise
    ``ValueError`` naming the worst basket if it exceeds the bound. A
    single degenerate basket (one group holding 10⁶ items) otherwise
    detonates silently inside the self-join. Opt-in because it runs an
    eager Spark job at plan-build time; lazy composition (the
    driver-gate contract) stays the default.
    """
    from esdb_spark.operators.dedup import _estimated_input_bytes

    basket = df.select(
        F.col(group_col).alias("_co_g"), F.col(item_col).alias("_co_i")
    ).distinct()
    if max_basket is not None:
        sizes = basket.groupBy("_co_g").agg(
            F.count("*").alias("_co_sz")
        )
        basket = (
            basket.join(sizes, "_co_g")
            .filter(F.col("_co_sz") <= max_basket)
            .drop("_co_sz")
        )
    # r13 (r12 verdict ask #5): FIVE legs consume `basket` — both
    # sides of the pair self-join, the item supports, and the group
    # total — and the r12 driver bench showed the scan+distinct
    # subtree executing once PER LEG (plans/r13/parts_bought_together
    # _before.txt: five Scan parquet + distinct chains; exchange reuse
    # did not fire). The multi-leg materialize-once rule (the
    # dedup/search discipline): one LAZY localCheckpoint bounds the
    # corpus distinct to ONE execution; blocks release with the result.
    # A checkpointed frame carries no size stats, so the downstream
    # joins would all fall back to sort-merge — explicit broadcasts
    # are gated on the INPUT's free Catalyst size estimate (the
    # dedup_simhash posture): the broadcast sides are the distinct
    # basket (≤ input rows, two scalars each) and the |items|-row
    # supports. Bigger inputs keep the shuffle plans — at 100 TB the
    # self-join and support joins shuffle by construction.
    basket = basket.localCheckpoint(eager=False)
    small = _estimated_input_bytes(df) <= 32 << 20
    if guard_basket is not None:
        per_group = basket.groupBy("_co_g").agg(
            F.count("*").cast("long").alias("_co_s")
        )
        # integer arithmetic end-to-end: `div` is bigint floor-div
        # (s·(s−1) is even, so it is exact) — a float `/` would lose
        # precision past 2^53 and contradict the guard's exactness
        fan = per_group.select(
            "_co_g",
            F.expr("_co_s * (_co_s - 1) div 2").alias("_co_fan"),
        )
        stats = fan.agg(
            F.sum("_co_fan").alias("total"),
            F.max_by("_co_g", "_co_fan").alias("worst"),
            F.max("_co_fan").alias("worst_fan"),
        ).collect()[0]
        if stats["total"] is not None and stats["total"] > guard_basket:
            raise ValueError(
                f"cooccurrence_pairs: predicted pair fanout "
                f"{stats['total']} exceeds guard_basket={guard_basket}; "
                f"worst basket {stats['worst']!r} alone contributes "
                f"{stats['worst_fan']} pairs — set max_basket to drop "
                f"oversized baskets (pruned-universe semantics) or "
                f"raise the guard"
            )
    totals = basket.agg(
        F.countDistinct("_co_g").cast("long").alias("n_groups")
    )
    left = basket.select("_co_g", F.col("_co_i").alias("item_a"))
    right = basket.select("_co_g", F.col("_co_i").alias("item_b"))
    if small:
        right = F.broadcast(right)
    pairs = (
        left.join(right, "_co_g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_both"))
        .filter(F.col("n_both") >= min_pairs)
    )
    support = basket.groupBy("_co_i").agg(
        F.count("*").cast("long").alias("_co_n")
    )
    sa = support.select(
        F.col("_co_i").alias("item_a"), F.col("_co_n").alias("n_a")
    )
    sb = support.select(
        F.col("_co_i").alias("item_b"), F.col("_co_n").alias("n_b")
    )
    if small:  # |items| rows of two scalars — same bound as the self-join
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            "n_both",
            "n_a",
            "n_b",
            "n_groups",
            (
                (F.col("n_both").cast("double")
                 * F.col("n_groups").cast("double"))
                / (F.col("n_a").cast("double")
                   * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


def cooccurrence_similarity(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_pairs: int = 1,
    max_basket: int | None = None,
    k: int | None = None,
    guard_basket: int | None = None,
) -> DataFrame:
    """Item-item collaborative-filtering similarity on top of
    :func:`cooccurrence_pairs`: cosine over binary basket-membership
    vectors, ``sim = n_both / sqrt(n_a · n_b)`` — the classic
    "customers who bought X also bought Y" score with the popularity
    correction lift lacks (a blockbuster item no longer dominates
    every pair).

    Output: ``(item_a, item_b, n_both, sim)`` with ``item_a <
    item_b``; with ``k``, only each item's top-``k`` partners survive
    (a pair stays if it is in EITHER side's top-k — the usual
    serving-table contract), ranked by (sim desc, partner asc).

    Engine-exact: integer counts, one multiply, one IEEE sqrt
    (correctly rounded per IEEE-754 — the round-4 lesson's GOOD case),
    one division — so catalog rows carry full value-hash oracles.

    Scale: inherits :func:`cooccurrence_pairs`'s posture (the
    ``max_basket`` s² guard, hash-only shuffles); the top-k pass is
    two bounded windows over the pair table keyed by item.
    """
    if k is not None and k < 1:
        raise ValueError("cooccurrence_similarity: k must be >= 1")
    pairs = cooccurrence_pairs(
        df, group_col, item_col, min_pairs, max_basket, guard_basket
    )
    scored = pairs.select(
        "item_a",
        "item_b",
        "n_both",
        (
            F.col("n_both")
            / F.sqrt(F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("sim"),
    )
    if k is None:
        return scored
    from pyspark.sql import Window

    # the top-k path references `scored` three times (semi-join left
    # side + both union branches) — a lazy localCheckpoint bounds the
    # s² pair generation to ONE execution and GC-releases with the
    # result (the graph.py reused-frame discipline)
    scored = scored.localCheckpoint(eager=False)

    both = scored.select(
        F.col("item_a").alias("item"), F.col("item_b").alias("partner"),
        "n_both", "sim",
    ).unionByName(
        scored.select(
            F.col("item_b").alias("item"), F.col("item_a").alias("partner"),
            "n_both", "sim",
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("sim"), F.asc("partner"))
    kept = (
        both.withColumn("_cs_rk", F.row_number().over(w))
        .filter(F.col("_cs_rk") <= k)
        .select(
            F.least("item", "partner").alias("item_a"),
            F.greatest("item", "partner").alias("item_b"),
        )
        .distinct()
    )
    return scored.join(kept, ["item_a", "item_b"], "left_semi")
