"""Data-layout clustering: Z-order (Morton) interleaving for
multi-dimensional row-group pruning.

A single-column sort gives Parquet tight min/max footer stats on that
column only; a predicate on any *other* column scans everything. At
100 TB the dominant cost of ad-hoc queries is row groups that cannot
be skipped. Z-ordering writes rows sorted by the bit-interleaving of
several columns' bucket ranks, so every file covers a small hyper-cube
of the key space and min/max stats prune on EVERY clustered column
(the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`; here as a
plain DataFrame transform over open Spark primitives).

Scale design:

- per-column bucket boundaries come from ``approx_percentile`` over a
  single stats pass (equi-depth, so skewed columns still spread across
  buckets); boundaries are a driver-side list bounded by
  ``2**bits_per_col`` — metadata, not data;
- the bucket id is a binary-search CASE tree over the literal
  boundaries (``_bucket_expr`` — log2(buckets) comparisons per value,
  codegen'd, no UDF), no shuffle beyond the final range partition;
- the Morton key interleaves bucket bits with shift/or arithmetic
  (bitwise — ANSI-safe), then one ``repartitionByRange`` +
  ``sortWithinPartitions`` lays files out along the curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket_expr(col: str, boundaries: list[float]) -> F.Column:
    """Equi-depth bucket id (0..len(boundaries)) of ``col`` given
    sorted interior boundaries, as a codegen'd expression.

    Generated as a binary-search CASE tree — log2(buckets) comparisons
    per row instead of the 2^bits a linear ``filter`` scan of the
    boundary array costs (255 vs 8 at the default 8 bits; the bucket
    pass runs over every row of the table being clustered, so the
    inner loop matters)."""
    v = f"cast(`{col}` as double)"

    def tree(lo: int, hi: int) -> str:
        # returns the bucket id for values in boundary range [lo, hi)
        if lo == hi:
            return str(lo)
        mid = (lo + hi) // 2
        # boundaries[mid] <= v  →  bucket > mid
        return (
            f"(CASE WHEN {repr(float(boundaries[mid]))} <= {v} "
            f"THEN {tree(mid + 1, hi)} ELSE {tree(lo, mid)} END)"
        )

    if not boundaries:
        return F.expr("0")
    return F.expr(tree(0, len(boundaries)))


def zorder_key(
    df: DataFrame, cols: list[str], bits_per_col: int = 8
) -> DataFrame:
    """Add a ``_z`` Morton key column interleaving the equi-depth
    bucket ranks of ``cols`` (each quantized to ``bits_per_col`` bits).

    Runs one eager ``approx_percentile`` stats job to learn boundaries
    (bounded driver payload: ``len(cols) * 2**bits_per_col`` doubles).
    Null values bucket to 0 (sort first — the usual convention).
    """
    if len(cols) * bits_per_col > 63:
        # bit 63 is the long sign bit (negative _z keys sort first and
        # scramble the curve) and JVM shifts wrap mod 64 beyond that —
        # both would silently destroy the clustering property
        raise ValueError(
            f"{len(cols)} cols x {bits_per_col} bits = "
            f"{len(cols) * bits_per_col} key bits; max is 63 — lower "
            "bits_per_col or cluster fewer columns"
        )
    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    prob_arr = "array({})".format(", ".join(repr(p) for p in probs))
    stats = df.select(
        *[
            F.expr(
                f"approx_percentile(cast(`{c}` as double), {prob_arr}, 10000)"
            ).alias(c)
            for c in cols
        ]
    ).first()
    key = None
    for ci, c in enumerate(cols):
        # dedupe boundaries (low-cardinality columns produce repeats;
        # repeats would waste bucket ids on empty ranges)
        bounds = sorted(set(stats[c] or []))[: n_buckets - 1]
        bucket = _bucket_expr(c, bounds).cast("long")
        # spread bucket bit b of column ci to position b*len(cols)+ci
        spread = None
        for b in range(bits_per_col):
            piece = F.shiftleft(
                F.shiftrightunsigned(bucket, b).bitwiseAND(F.lit(1)),
                b * len(cols) + ci,
            )
            spread = piece if spread is None else spread.bitwiseOR(piece)
        key = spread if key is None else key.bitwiseOR(spread)
    return df.withColumn("_z", key)


def cluster_zorder(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows ordered along the Z-curve of ``cols`` — write the result
    with ``.write.parquet(...)`` and every file's min/max footer stats
    cover a tight hyper-cube in all ``cols``. The ``_z`` key is dropped
    from the output (it is a layout device, not data)."""
    keyed = zorder_key(df, cols, bits_per_col)
    parts = (
        keyed.repartitionByRange(num_partitions, "_z")
        if num_partitions
        else keyed.repartitionByRange("_z")
    )
    return parts.sortWithinPartitions("_z").drop("_z")
