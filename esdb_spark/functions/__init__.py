"""Column-expression helpers shared by operators.

Everything here returns Spark Column expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python
in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def bucket_tree(col: Column, bounds: list[float], strict: bool = True) -> Column:
    """``#{b in bounds : b < col}`` (``strict``, default) or
    ``#{b : b <= col}`` as a binary-search CASE tree over sorted
    literal boundaries — log2(len(bounds)) comparisons per row,
    codegen'd.

    This is the ONE bucket-search builder (packing's rank buckets and
    layout's z-order buckets both delegate here; they differ only in
    the tie convention, hence ``strict``). Two properties matter:
    explicit comparisons keep the column references VISIBLE to
    Catalyst — a ``size(filter(lit_array, lambda))`` formulation hides
    them, and when the aliased bucket later feeds a join key,
    InferFiltersFromConstraints pushes the apparently column-free
    expression onto the other join side (unbindable ``!Filter``,
    INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at execution) — and the tree
    depth stays log-bounded where a linear chain costs O(n) per row
    and seconds of one-time Janino compile at thousands of buckets.
    NULL input lands in bucket 0 (every comparison fails down the
    ELSE side), matching NULLS-FIRST ordering."""
    if not bounds:
        return F.lit(0)

    def tree(lo: int, hi: int) -> Column:
        # bucket id for rows whose answer lies in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        b = F.lit(float(bounds[mid - 1]))
        pred = (col > b) if strict else (col >= b)
        return F.when(pred, tree(mid, hi)).otherwise(tree(lo, mid - 1))

    return tree(0, len(bounds))


def epoch_us(col) -> Column:
    """Epoch microseconds of a timestamp column, NTZ-safe.

    The driver's parquet carries TIMESTAMP(MICROS, isAdjustedToUTC=
    false), which Spark 4 reads as TIMESTAMP_NTZ — and ``unix_micros``
    rejects NTZ outright. ``to_utc_timestamp(col, 'UTC')`` reads the
    naive wall clock as UTC (exactly DuckDB's ``epoch_us`` semantics on
    the same files) UNDER THE ENGINE'S PINNED-UTC SESSIONS (session.py
    and __spark_entry__._ensure_conf both pin spark.sql.session.timeZone
    to UTC): an NTZ input is implicitly cast through the session zone
    first, so an unpinned non-UTC session would shift it. Code that
    must be correct under arbitrary session timezones (streaming's
    ``_instant``) uses ``timestampdiff`` against the NTZ epoch instead —
    pure wall-clock arithmetic, no timezone anywhere. Call sites keep
    the raw column in filters where possible so parquet pushdown is
    preserved — this helper is for projections and arithmetic.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(F.to_utc_timestamp(col, "UTC"))


def tokens(col) -> Column:
    """Lowercased whitespace tokens of a text column (empty array for
    blank text)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != F.lit("")
    )


def word_shingles(tok: Column, n: int) -> Column:
    """Distinct n-word shingles from a token array (JVM-side; no UDF).

    ``sequence(0, size-n)`` enumerates start offsets; ``slice`` +
    ``concat_ws`` builds each shingle. Documents shorter than n words
    contribute their full text as a single shingle so they still
    participate in dedup.
    """
    shingled = F.transform(
        F.sequence(F.lit(0), F.size(tok) - n),
        lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(tok) >= n, shingled).otherwise(
            F.array(F.concat_ws(" ", tok))
        )
    )


def hash_sample(key: Column, buckets_kept: int, prefix_len: int = 2) -> Column:
    """Deterministic sampling predicate: keep rows whose md5(key) hex
    prefix is below a cutoff — ``buckets_kept`` of the 16^prefix_len
    buckets survive (e.g. buckets_kept=40, prefix_len=2 ≈ 15.6%).

    Unlike ``df.sample()`` (seeded RNG over partition iteration order,
    so the kept set changes under repartitioning, engine, or re-run),
    the kept set here is a pure function of the key: stable across
    runs, partitionings, and engines — the property that makes samples
    joinable with each other and auditable at 100 TB. Lowercase-hex
    string comparison is numeric comparison (0-9 < a-f in ASCII), so
    the same predicate runs verbatim in any SQL engine with md5().
    """
    cutoff = format(buckets_kept, "x").zfill(prefix_len)
    if len(cutoff) > prefix_len:
        raise ValueError("hash_sample: buckets_kept exceeds bucket space")
    return F.substring(F.md5(key.cast("string")), 1, prefix_len) < F.lit(cutoff)


def stratified_hash_sample(
    key: Column, stratum: Column, fractions: dict, prefix_len: int = 2
) -> Column:
    """Per-stratum deterministic sampling predicate: like
    :func:`hash_sample` but with a different kept-bucket count per
    stratum value (e.g. downsample the majority class, keep all of a
    rare one). Strata absent from ``fractions`` are dropped.
    ``fractions`` maps stratum value → kept buckets out of
    16^prefix_len."""
    space = 16 ** prefix_len
    pred = F.lit(False)
    prefix = F.substring(F.md5(key.cast("string")), 1, prefix_len)
    for value, kept in fractions.items():
        if not 0 <= kept <= space:
            raise ValueError(f"stratified_hash_sample: {kept} not in [0, {space}]")
        if kept == space:  # keep-all: no hex cutoff exists above 'f…f'
            pred = pred | (stratum == F.lit(value))
            continue
        cutoff = format(kept, "x").zfill(prefix_len)
        pred = pred | (
            (stratum == F.lit(value)) & (prefix < F.lit(cutoff))
        )
    return pred


def sample_key(key: Column, seed: str = "") -> Column:
    """The deterministic sampling sort key: ``md5(seed‖'|'‖key)``.
    A pure function of (seed, key) — distinct seeds give independent
    samples over the same data, and the hex ordering is identical in
    any engine with md5 (same portability argument as
    :func:`hash_sample`)."""
    return F.md5(F.concat_ws("|", F.lit(seed), key.cast("string")))


def hash_sample_k(df, key: Column, k: int, seed: str = ""):
    """Deterministic EXACT-k uniform sample: the ``k`` rows with the
    smallest :func:`sample_key` digests.

    Where :func:`hash_sample` fixes the sampling *rate* (row count
    varies with data size), this fixes the *count* — the "give me
    exactly 100k eval documents" shape. Physically:

    - small ``k`` (≤10k): ORDER BY+LIMIT compiles to
      TakeOrderedAndProject — per-partition k-row heaps, no global
      sort. Cheap everywhere.
    - larger ``k``: a bare ORDER BY+LIMIT is a scale hazard in BOTH
      Spark regimes — under Spark 3's default
      ``topKSortFallbackThreshold`` (10k) it silently falls back to a
      FULL GLOBAL SORT of the input; under Spark 4's effectively
      unbounded default it stays TakeOrdered but every partition heaps
      and ships k rows to one merge point (partitions × k volume —
      100M rows driver-side at 1000 partitions, k=100k). So above 10k
      the input is first cut to ~3k expected rows by a hash-prefix
      threshold on the same digest (the k winners all have small
      digests, so the filter cannot lose them unless the corpus has
      <k rows under the cutoff — verified with a count, falling back
      to the plain sort in that vanishing case), and only the
      surviving sliver is top-k'd. Result rows are IDENTICAL to the
      unfiltered sort on either path, so engine-portable oracles that
      replay ``ORDER BY md5(...) LIMIT k`` still match (EAGER: the
      large-k path runs two count jobs at call time)."""
    if k <= 0:
        raise ValueError("hash_sample_k: k must be positive")
    sk = sample_key(key, seed)
    if k <= 10_000:
        return df.orderBy(sk).limit(k)
    n = df.count()
    if n <= 3 * k:
        return df.orderBy(sk).limit(k)
    # keep digests whose first-8-hex value is under p*2^32, p = 3k/n:
    # expected survivors 3k; P(<k survivors) is Chernoff-negligible for
    # k above the 10k threshold, and the count() below makes even that
    # case correct rather than merely improbable
    cutoff = format(int(3 * k / n * (1 << 32)), "08x")
    filtered = df.filter(F.substring(sk, 1, 8) < F.lit(cutoff))
    if filtered.count() < k:
        return df.orderBy(sk).limit(k)
    return filtered.orderBy(sk).limit(k)


def hash_sample_k_per_group(
    df, key: Column, group: Column, k: int, seed: str = ""
):
    """Deterministic exact-k sample PER GROUP (e.g. k eval docs per
    language): rank rows within each group by :func:`sample_key` and
    keep ranks ≤ k. One shuffle on the group key; the window is
    rank-truncated so only k rows per group survive the filter."""
    if k <= 0:
        raise ValueError("hash_sample_k_per_group: k must be positive")
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(sample_key(key, seed))
    return (
        df.withColumn("_skg_rn", F.row_number().over(w))
        .filter(F.col("_skg_rn") <= k)
        .drop("_skg_rn")
    )


def sample_uniform(key: Column, seed: str = "") -> Column:
    """Deterministic uniform draw in (0, 1]: the first 13 hex digits
    (52 bits — exactly a double's mantissa) of :func:`sample_key`,
    mapped to ``(v + 1) / (2^52 + 1)``. Every step is either exact
    integer-in-double arithmetic or one IEEE division, so any engine
    computes the identical double from the identical key."""
    v = F.conv(F.substring(sample_key(key, seed), 1, 13), 16, 10).cast(
        "double"
    )
    return (v + F.lit(1.0)) / F.lit(float((1 << 52) + 1))


def weighted_sample_k(df, key: Column, weight: Column, k: int, seed: str = ""):
    """Deterministic weighted sample of exactly ``k`` rows without
    replacement: inclusion probability proportional to ``weight``
    (e.g. sample documents ∝ quality score or length).

    Efraimidis & Spirakis 2006 via the exponential race: each row
    draws ``e = -ln(u) / w`` with ``u`` from :func:`sample_uniform`
    and the ``k`` smallest ``e`` win — equivalent to their
    ``u^(1/w)`` keys but with better float behavior. Rows with
    non-positive weight are excluded. Like :func:`hash_sample_k` the
    draw is a pure function of (seed, key), and the physical plan is
    TakeOrderedAndProject — per-partition k-heaps, no global sort."""
    if k <= 0:
        raise ValueError("weighted_sample_k: k must be positive")
    e = -F.log(sample_uniform(key, seed)) / weight
    return df.filter(weight > 0).orderBy(e).limit(k)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns — zip_with +
    aggregate, fully codegen'd (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two vector columns; NULL when either side
    has zero norm (no defined cosine). The ``nullif`` guard matters
    under Spark 4's default ANSI mode, where a bare 0/0 division is a
    runtime DIVIDE_BY_ZERO error, not NaN — a single zero vector in a
    joined pair would otherwise kill the whole job."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def hash_split(
    key: Column, fractions: dict[str, float], prefix_len: int = 4
) -> Column:
    """Deterministic train/val/test split label: the md5-hex prefix of
    the key is bucketed by cumulative fraction cutoffs. Like
    :func:`hash_sample`, assignment is a pure function of the key —
    reproducible across runs, partitionings, and engines, and disjoint
    by construction (one label per row). The last split absorbs
    rounding remainder. Fractions must sum to 1 (±0.1%).

    >>> df.withColumn("split", hash_split(F.col("doc_id"),
    ...     {"train": 0.98, "val": 0.01, "test": 0.01}))
    """
    space = 16 ** prefix_len
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"hash_split: fractions sum to {total}, want 1")
    if len(fractions) < 2:
        raise ValueError("hash_split: need at least two splits")
    prefix = F.substring(F.md5(key.cast("string")), 1, prefix_len)
    items = list(fractions.items())
    expr = None
    cum = 0
    for name, frac in items[:-1]:
        buckets = int(round(frac * space))
        if buckets == 0:
            # a zero-width bucket would silently assign NO rows to this
            # split; demand more hash resolution instead
            raise ValueError(
                f"hash_split: fraction {frac} for {name!r} rounds to zero "
                f"buckets at prefix_len={prefix_len}; raise prefix_len"
            )
        cum += buckets
        if cum >= space:
            # a silent clamp here would hand the top hash bucket to the
            # wrong split; demand more resolution instead
            raise ValueError(
                "hash_split: non-final splits round to the whole bucket "
                f"space ({cum}/{space}); raise prefix_len"
            )
        cutoff = F.lit(format(cum, "x").zfill(prefix_len))
        cond = prefix < cutoff
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return expr.otherwise(F.lit(items[-1][0]))


def shuffle_key(key: "Column", seed: int = 0) -> "Column":
    """Deterministic corpus-shuffle key: ``md5(seed || key)``.

    Sorting by this key is the reproducible replacement for a seeded
    RNG shuffle of a training corpus — the order is a pure function of
    (seed, key), so it survives repartitioning, re-runs, and engine
    changes (the same property as :func:`hash_sample`), and a new seed
    gives an independent epoch order. Sort with ``orderBy`` (sampled
    range partition — no single-task sort) or feed to
    ``repartitionByRange`` to produce shuffled training shards.
    """
    return F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")))
