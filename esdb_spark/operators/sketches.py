"""Frequency sketches: exact distributed heavy hitters and count-min.

The reference engine has no aggregation layer at all (SURVEY.md §2.6);
these are part of the training-data-pipeline capability set — finding
dominant domains/users/tokens in a corpus without a full groupBy on an
unbounded key space.

Scale design:

- :func:`heavy_hitters` is the two-pass Misra-Gries scheme: phase 1
  runs an MG summary per partition (bounded memory: ``k`` counters,
  Arrow-batched), emitting at most ``k`` candidate items per
  partition. By the averaging argument any item with global frequency
  > N/k exceeds n_p/k in at least one partition, so the candidate
  union is a superset of every true heavy hitter. Phase 2 recounts
  ONLY the candidates exactly (semi-join then groupBy on a key set
  bounded by k × partitions, not by the raw cardinality) and filters
  with integer arithmetic ``cnt * k > N``. Output is exact and
  engine-independent — a plain SQL HAVING clause is its oracle.
- :func:`count_min_table` builds a count-min sketch AS a DataFrame
  (≤ depth×width rows, one partial-aggregating pass, xxhash64 cells) —
  mergeable, joinable, and hash-consistent with
  :func:`cms_estimate`'s probe path; for approximate point
  frequencies when even the candidate recount is too much. Cell
  layout is hash-engine-specific, so queries exposing it are
  rows-only in the oracle gate.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def _mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidates: ≤ k items per partition,
    guaranteed to include every item with partition frequency > n_p/k.
    Each partition also emits ONE count row (item NULL, n_rows set) so
    the caller learns N from this same pass instead of scanning again.
    """
    schema = T.StructType(
        [
            T.StructField("item", T.StringType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            # batch-level exact counts first (vectorized), then fold
            # into the bounded MG summary — same guarantee, far fewer
            # dict operations than item-at-a-time
            for item, cnt in pdf["item"].value_counts().items():
                if item in counters:
                    counters[item] += int(cnt)
                elif len(counters) < k:
                    counters[item] = int(cnt)
                else:
                    # decrement-all by the smallest deficit; evict zeros
                    dec = min(int(cnt), min(counters.values()))
                    counters = {
                        i: c - dec for i, c in counters.items() if c > dec
                    }
                    rem = int(cnt) - dec
                    if rem > 0 and len(counters) < k:
                        counters[item] = rem
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "n_rows": [None] * len(counters) + [seen],
            }
        )

    return df.select(F.col(col).cast("string").alias("item")).mapInPandas(
        op, schema
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """All NON-NULL items of ``col`` with frequency strictly greater
    than N/k (N counts non-null rows), with their EXACT counts —
    (item, cnt), no order guaranteed.

    NULL is excluded explicitly, up front: the pandas ``value_counts``
    in the candidate pass and the recount equi-join both drop NaN/NULL
    anyway, so a heavy NULL group could never surface — making the
    exclusion part of the contract (and of N) keeps the operator
    consistent with itself instead of silently diverging when nulls
    are frequent. Equivalent SQL (the oracle):

        SELECT item, count(*) AS cnt FROM t WHERE item IS NOT NULL
        GROUP BY item
        HAVING count(*) * k > (SELECT count(*) FROM t
                               WHERE item IS NOT NULL)

    Never shuffles the raw key space: the only wide operations run on
    the ≤ k×partitions candidate set.
    """
    if k < 1:
        raise ValueError(f"heavy_hitters: k must be >= 1, got {k}")
    df = df.filter(F.col(col).isNotNull())
    items = df.select(F.col(col).cast("string").alias("item"))
    # one pass yields both the candidate set and N (per-partition count
    # rows) — a separate count(*) pass over the raw data would be a
    # third full scan
    cand_and_counts = _mg_candidates(df, col, k)
    candidates = (
        cand_and_counts.filter(F.col("item").isNotNull())
        .select("item")
        .distinct()
    )
    counted = (
        items.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    # lazy total from the count rows: a broadcast 1-row frame keeps the
    # whole operator one deferred plan; integer arithmetic keeps the
    # threshold comparison engine-exact
    total = cand_and_counts.agg(F.sum("n_rows").alias("_n"))
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("_n"))
        .drop("_n")
    )


def _cms_buckets(col_expr, depth: int, width: int, portable: bool = False):
    """(row, bucket) hash pairs for one value — xxhash64 with the row
    index as seed, pmod'd into the width. Pure built-in expressions.

    ``portable=True`` swaps xxhash64 for the repo's md5-derived 60-bit
    hash family (``conv(substring(md5('cms{i}|' || value), 1, 15), 16,
    10)`` — the same idiom as the portable minhash path): bucket
    placement is then engine-replayable, so a DuckDB oracle rebuilds
    the identical sketch cell-for-cell. md5 costs ~4× the xxhash mix;
    the sketch pass is aggregation-bounded either way."""
    def bucket(i: int):
        if portable:
            h = F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(f"cms{i}"), col_expr)),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
        else:
            h = F.xxhash64(col_expr, F.lit(i))
        return F.pmod(h, F.lit(width))

    return F.array(
        *[
            F.struct(F.lit(i).alias("row"), bucket(i).alias("bucket"))
            for i in range(depth)
        ]
    )


def count_min_table(
    df: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 2048,
    portable: bool = False,
) -> DataFrame:
    """Count-min sketch as a (row, bucket, cnt) DataFrame — at most
    depth × width rows regardless of input size.

    One pass over the data: each value emits ``depth`` (row, bucket)
    pairs (xxhash64 seeded by row index), and a partial-aggregating
    groupBy sums them. The result is mergeable (sum matching cells) and
    tiny — collect it, persist it, or join point queries against it.
    Estimates over-count only, by ≤ e·N/width per row with probability
    1 - e^-depth (standard CM bounds).

    NULLs are excluded up front (same contract as heavy_hitters, and N
    counts non-null rows): xxhash64 ignores null children, so every
    null row would otherwise pile into ONE cell per depth row and blow
    the over-count bound for any item colliding with the null pile."""
    df = df.filter(F.col(col).isNotNull())
    return (
        df.select(
            F.explode(
                _cms_buckets(
                    F.col(col).cast("string"), depth, width, portable
                )
            ).alias("rb")
        )
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate_df(
    table_df: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 5,
    width: int = 2048,
    portable: bool = False,
) -> DataFrame:
    """Lazy DataFrame face of :func:`cms_estimate`: point estimates
    for every row of ``items`` → (item, est), no driver collect. The
    probe side explodes to ``depth`` cells per item and left-joins the
    (≤ depth×width row) sketch — AQE broadcasts whichever side is
    small. Must be called with the same ``depth/width/portable`` the
    table was built with (the hash family is part of the sketch)."""
    probes = (
        items.select(F.col(item_col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .distinct()
        .select(
            "item",
            F.explode(
                _cms_buckets(F.col("item"), depth, width, portable)
            ).alias("rb"),
        )
        .select(
            "item",
            F.col("rb.row").alias("row"),
            F.col("rb.bucket").alias("bucket"),
        )
    )
    return (
        probes.join(table_df, ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("item")
        .agg(F.min("cnt").alias("est"))
    )


def cms_estimate(
    table_df: DataFrame, items: list[str], depth: int = 5, width: int = 2048
) -> dict[str, int]:
    """Point-frequency estimates for ``items`` against a
    :func:`count_min_table` result: min over the item's depth cells.
    The probe is a broadcast join of the (small) item list against the
    (≤ depth×width) table — no driver-side hashing, so the estimates
    use exactly the same hash functions the table was built with."""
    if not items:
        return {}  # createDataFrame([]) cannot infer a schema
    spark = table_df.sparkSession
    probes = (
        spark.createDataFrame([(s,) for s in items], ["item"])
        .select(
            "item",
            F.explode(_cms_buckets(F.col("item"), depth, width)).alias("rb"),
        )
        .select("item", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    )
    rows = (
        probes.join(table_df, ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("item")
        .agg(F.min("cnt").alias("est"))
        .collect()
    )
    return {r["item"]: int(r["est"]) for r in rows}


def hll_rollup(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key mergeable distinct-count sketches: (key_cols...,
    hll_sketch binary) via ``hll_sketch_agg`` (Apache DataSketches
    HllSketch under the hood).

    The point of emitting the SKETCH rather than the estimate is
    scale: sketches built per partition-key (e.g. per day) union in
    O(sketch size) with :func:`hll_union_estimate` — the 100 TB rollup
    pattern where re-scanning raw data per reporting window would be
    prohibitive. lg_k=12 → ~2.5 KB per sketch, ~1.6% standard error.
    """
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(value_col), lg_k).alias("hll_sketch")
    )


def hll_union_estimate(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Merge per-key sketches up a coarser grouping and estimate:
    (group_cols..., approx_distinct bigint). Sketch union is exact
    merge algebra — the estimate after union equals the estimate of a
    sketch built over the concatenated raw inputs."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(
            "approx_distinct"
        )
    )


def quantile_rollup(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
    exact: bool = False,
) -> DataFrame:
    """Per-key approximate quantiles: (key_cols..., q<pp> double ...)
    via ``percentile_approx`` — Spark's Greenwald-Khanna-style sketch,
    a single partial-aggregating pass with rank error ≤ 1/accuracy.

    The mergeable-sketch alternative to the exact interpolated
    percentiles (``order_price_deciles``) and the ntile/range-join
    variants (``order_price_quartiles*``): those need either a sort or
    a recount per boundary; this streams once, combines map-side, and
    its error bound is independent of data size — the only option when
    the value column is a 100 TB fact and the grouping is fine-grained.
    Estimates are data-deterministic up to sketch merge order, so gate
    queries exposing raw estimates are rows-only; the error bound vs
    exact quantiles is asserted in test_sketches.py.

    ``exact=True`` swaps the sketch for Spark's exact interpolated
    ``percentile`` aggregate — a sort-based per-group pass whose
    interpolation is bit-identical to DuckDB ``quantile_cont``
    (verified; see ``median_value_by_type``), making the rollup
    oracle-exact. Use it when groups fit an aggregation buffer; the
    sketch remains the 100 TB default.
    """
    agg_fn = (
        (lambda c, p: F.percentile(c, p))
        if exact
        else (lambda c, p: F.percentile_approx(c, p, accuracy))
    )
    aggs = [
        agg_fn(F.col(value_col), float(p))
        .cast("double")
        .alias(f"q{int(round(p * 100)):02d}")
        for p in probs
    ]
    return df.groupBy(*key_cols).agg(*aggs)


def merge_count_min(
    tables: list[DataFrame],
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Merge count-min sketch tables built by :func:`count_min_table`
    with the SAME (depth, width, hash family): cell-wise count
    addition — ``merge(cms(A), cms(B)) == cms(A ∪ B)`` EXACTLY, which
    is the whole point of a linear sketch and what makes CMS state
    incrementally maintainable (fold each new partition/day/feed's
    tiny table into the standing one; the base data is never
    rescanned). With the portable hash family the invariant is
    engine-portable, so catalog rows carry full value-hash oracles.

    Merging sketches of DIFFERENT geometry is silent corruption (the
    min-readout can then UNDER-count, breaking CMS's over-count-only
    bound) and nothing in a (row, bucket, cnt) table records its
    geometry — pass ``depth``/``width`` to get an execution-time raise
    on any cell outside the declared grid (catches a bigger sketch
    mixed in; a smaller-geometry table is indistinguishable from a
    sparsely-populated one, so declare geometry everywhere you can).

    Scale posture: inputs are ≤ depth × width rows each whatever the
    data size; the merge is one union + one tiny aggregation.
    """
    if not tables:
        raise ValueError("merge_count_min: no input tables")
    u = tables[0]
    for t in tables[1:]:
        u = u.unionByName(t)
    if depth is not None or width is not None:
        bad = F.lit(False)
        if depth is not None:
            bad = bad | (F.col("row") >= depth) | (F.col("row") < 0)
        if width is not None:
            bad = bad | (F.col("bucket") >= width) | (F.col("bucket") < 0)
        u = u.filter(
            F.when(
                bad,
                F.raise_error(
                    F.lit(
                        "merge_count_min: cell outside the declared "
                        f"depth={depth} width={width} grid — inputs were "
                        "built with mismatched sketch geometry"
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
    return u.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
