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
    sorted interior boundaries — the shared binary-search CASE tree
    (:func:`esdb_spark.functions.bucket_tree`; log2(buckets)
    comparisons per row instead of the 2^bits a linear scan costs).
    Non-strict: a value exactly on a boundary belongs to the UPPER
    bucket (``#{b : b <= v}``) — the convention the original
    expr-string tree used, preserved so existing clustered layouts
    reproduce."""
    from esdb_spark.functions import bucket_tree

    return bucket_tree(
        F.expr(f"cast(`{col}` as double)"), list(boundaries), strict=False
    )


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


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zvalue",
) -> DataFrame:
    """ORACLE-EXACT z-value: min-max (equi-WIDTH) discretization in
    pure 64-bit integer arithmetic, complementing :func:`zorder_key`'s
    equi-depth variant (approx_percentile boundaries spread skewed
    columns better but are sketch-merge-order-dependent, so not
    engine-portable). Here: ``((v - min) * (2^bits - 1)) div
    (max - min)`` with driver-collected literal bounds (EAGER: one
    min/max aggregation job now) — truncating division equals floor
    for these non-negative operands, and DuckDB replays it verbatim
    with ``//``, so the whole curve is reproducible across engines
    (the ``events_zorder_top200`` gate query). NULLs discretize to 0;
    constant/all-NULL columns contribute constant bits; ranges too
    wide for the 64-bit product are pre-shifted down (coarser low
    bits, same curve — NOT mirrored in the oracle, whose test ranges
    never need it). Timestamps go through the NTZ-safe ``epoch_us``.
    """
    from esdb_spark.functions import epoch_us

    if out_col in df.columns:
        raise ValueError(f"with_zorder: column {out_col!r} already exists")
    n = len(cols)
    if n == 0:
        raise ValueError("with_zorder: need at least one column")
    if n * bits > 63:
        raise ValueError(
            f"with_zorder: {n} cols x {bits} bits = {n * bits} > 63 bits"
        )
    casted = []
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        if dt in ("timestamp", "timestamp_ntz"):
            casted.append(epoch_us(F.col(c)))
        elif dt == "date":
            casted.append(F.datediff(F.col(c), F.lit("1970-01-01")))
        else:
            casted.append(F.col(c).cast("long"))
    row = df.agg(
        *[F.min(e).alias(f"mn_{i}") for i, e in enumerate(casted)],
        *[F.max(e).alias(f"mx_{i}") for i, e in enumerate(casted)],
    ).collect()[0]
    top = (1 << bits) - 1
    tmp = df
    # collision-proof temp names (an input column named _zq_0 would
    # otherwise be silently clobbered AND dropped)
    suffix = ""
    while any(f"_zq{suffix}_{i}" in df.columns for i in range(len(casted))):
        suffix += "x"
    names = []
    for i, e in enumerate(casted):
        mn, mx = row[f"mn_{i}"], row[f"mx_{i}"]
        name = f"_zq{suffix}_{i}"
        names.append(name)
        if mn is None or mx is None or mx == mn:
            tmp = tmp.withColumn(name, F.lit(0).cast("long"))
            continue
        # Shift BEFORE subtracting: (v - mn) itself overflows signed 64
        # when the column spans more than 2^63 (e.g. xxhash64-derived
        # ids, mn ≈ -2^63, mx ≈ 2^63) — ANSI sessions raise, non-ANSI
        # silently wraps. Arithmetic right-shift preserves order, and
        # Python's >> on ints matches Java's >> on longs (floor), so
        # the driver-side shifted bounds agree with the per-row
        # expression bit-for-bit. The loop bounds BOTH the shifted
        # span (subtraction fits) and the span*top product (div input
        # fits).
        shift = 0
        while ((mx >> shift) - (mn >> shift)) * top >= (1 << 63):
            shift += 1
        smn, span = mn >> shift, (mx >> shift) - (mn >> shift)
        sv = F.coalesce(e, F.lit(mn).cast("long"))
        if shift:
            sv = F.shiftright(sv, shift)
        tmp = tmp.withColumn(name, sv - F.lit(smn).cast("long"))
        if span == 0:  # range collapsed entirely under the shift
            tmp = tmp.withColumn(name, F.lit(0).cast("long"))
            continue
        # true integer division via the SQL `div` operator (float `/`
        # + cast loses exactness above 2^53)
        tmp = tmp.withColumn(name, F.expr(f"({name} * {top}L) div {span}L"))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, name in enumerate(names):
            bit = F.shiftright(F.col(name), b).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, b * n + i)
    return tmp.withColumn(out_col, z).drop(*names)


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
