"""Training-batch assembly operators: sequence packing and
deterministic source interleaving.

Both are north-star LLM-pipeline operators (SURVEY §2.7) with no
reference analog — they sit at the end of a data pipeline, turning a
cleaned corpus into the exact order/grouping a trainer consumes.

**Sequence packing** (:func:`pack_greedy`): concatenate documents into
fixed token-budget contexts ("bins") so short documents don't waste
padded positions. Semantics here are *deterministic sharded greedy
fill*: documents are sharded by a pure function of their id, each
shard is walked in id order, and a document opens a new bin exactly
when it does not fit in the current one (a document larger than the
whole budget occupies a bin alone). Determinism is the point — the
same corpus always packs identically, so a training run is
reproducible and resumable.

Scale: each shard packs independently in one linear ``applyInPandas``
pass over (id, size) pairs — the text itself never moves; the output
is a doc_id → (shard, bin, offset) assignment the trainer joins back.
Shard count bounds both parallelism and per-task state (a shard's rows
must fit one task — pick shards so ~10-100 MB of (id,size) pairs per
shard; 100 TB of docs at ~16 B/row needs only ~10k shards).

**Weighted interleaving** (:func:`interleave_sources`): produce the
global training order that mixes sources at given rates (e.g. 3 parts
web, 1 part code) using stride scheduling — source ``s`` with weight
``w`` emits its ``k``-th document at virtual time ``(k - 0.5) / w``;
sorting all documents by virtual time yields an order whose running
source mix converges to the weights, deterministically (no RNG). The
total order is produced without a sampled range shuffle: bucket
boundaries are driver-computed literals (quantiles for the id rank,
closed-form stride arithmetic for the vtime rank), so no single task
sees the whole relation and nothing needs pinning between jobs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F, types as T


def pack_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each row to (shard, bin, offset) by sharded greedy fill.

    shard = id % n_shards (pure, reproducible); within a shard, rows
    are walked in ascending ``id_col`` and appended to the current bin
    while ``fill + size <= budget``, else a new bin starts. ``offset``
    is the fill before the row was placed. Bins are numbered from 0 per
    shard.

    Returns (id_col, shard, bin, offset) — one row per input row.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("shard", T.IntegerType()),
            T.StructField("bin", T.LongType()),
            T.StructField("offset", T.LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        bins, offsets = [], []
        cur_bin, fill = 0, 0
        first = True
        for size in pdf["size"]:
            size = int(size)
            if not first and fill + size > budget:
                cur_bin += 1
                fill = 0
            first = False
            offsets.append(fill)
            bins.append(cur_bin)
            fill += size
        return pd.DataFrame(
            {
                "id": pdf["id"].values,
                "shard": pdf["shard"].values,
                "bin": bins,
                "offset": offsets,
            }
        )

    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        # a silent cast('long') would turn string ids into NULLs and
        # every downstream join-back would drop all rows without error
        raise TypeError(
            f"pack_greedy needs an integral {id_col!r} (got {id_type}); "
            "hash non-numeric ids to a long (e.g. xxhash64) first"
        )
    prepared = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(size_col).cast("long").alias("size"),
    )
    return (
        prepared.groupBy("shard")
        .applyInPandas(pack, out_schema)
        .withColumnRenamed("id", id_col)
    )


def pack_oracle_sql(
    size_expr: str, budget: int, n_shards: int, table: str = "documents"
) -> str:
    """DuckDB oracle for :func:`pack_greedy`: the same greedy fill as a
    recursive CTE stepping row-by-row per shard (one recursion level
    per shard position; all shards advance in the same level)."""
    return f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, CAST(doc_id % {n_shards} AS INTEGER) AS shard,
         CAST({size_expr} AS BIGINT) AS size,
         row_number() OVER (PARTITION BY doc_id % {n_shards}
                            ORDER BY doc_id) AS rn
  FROM {table}
),
rec AS (
  SELECT shard, rn, doc_id, size,
         CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS "offset",
         size AS fill
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.size,
         CASE WHEN r.fill + d.size > {budget} THEN r.bin + 1 ELSE r.bin END,
         CASE WHEN r.fill + d.size > {budget} THEN CAST(0 AS BIGINT)
              ELSE r.fill END,
         CASE WHEN r.fill + d.size > {budget} THEN d.size
              ELSE r.fill + d.size END
  FROM rec r JOIN docs d ON d.shard = r.shard AND d.rn = r.rn + 1
)
SELECT doc_id, shard, bin, "offset"
FROM rec
ORDER BY doc_id
"""


def _monotone_double(
    col: "F.Column", dtype: T.DataType, skip_prefix: int = 0
) -> "F.Column":
    """A double-valued image of ``col`` that is monotone NON-DECREASING
    in the column's sort order (ties allowed — callers only use it to
    cut bucket boundaries, never to order within a bucket). Numerics
    cast directly (int64→double rounding is monotone); strings/binary
    skip their ``skip_prefix``-byte shared prefix (the caller passes
    the corpus-wide longest common prefix — without it, URL-shaped ids
    like 'https://example.com/...' collapse into ONE bucket and the
    per-source rank funnels through a single task) and map the next 8
    bytes to an unsigned integer, left-justified so byte-lexicographic
    order survives ('b' > 'abc' holds)."""
    if isinstance(dtype, T.NumericType):
        return col.cast("double")
    if isinstance(dtype, (T.DateType, T.TimestampType)):
        return col.cast("timestamp").cast("double")
    if isinstance(dtype, T.StringType):
        raw = F.encode(col, "UTF-8")
    elif isinstance(dtype, T.BinaryType):
        raw = col
    else:
        raise TypeError(
            f"interleave_sources: unsupported id type {dtype.simpleString()}"
        )
    h = F.rpad(
        F.substring(F.hex(raw), 2 * skip_prefix + 1, 16), 16, "0"
    )
    return F.conv(h, 16, 10).cast("double")


def _common_prefix_len(slim: DataFrame, id_col: str, dtype) -> int:
    """Longest common byte-prefix of every id — for a SORTED domain
    this is just lcp(min, max), one tiny aggregation."""
    if not isinstance(dtype, (T.StringType, T.BinaryType)):
        return 0
    row = slim.agg(
        F.min(id_col).alias("mn"), F.max(id_col).alias("mx")
    ).collect()[0]
    mn, mx = row["mn"], row["mx"]
    if mn is None or mx is None:
        return 0
    bmn = mn.encode("utf-8") if isinstance(mn, str) else bytes(mn)
    bmx = mx.encode("utf-8") if isinstance(mx, str) else bytes(mx)
    i = 0
    while i < min(len(bmn), len(bmx)) and bmn[i] == bmx[i]:
        i += 1
    return i


def _bucket_expr(col: "F.Column", bounds: list[float]) -> "F.Column":
    """``#{b in bounds : col > b}`` — delegates to the shared
    binary-search CASE tree (see :func:`esdb_spark.functions.
    bucket_tree` for why: visible references beat HOF lambdas for
    Catalyst constraint propagation, and log-depth beats a linear
    chain at thousands of buckets). Strict comparison: a row exactly
    on a boundary belongs to the LOWER bucket, consistently with the
    driver-side ``_cum_counts`` (vtime <= t)."""
    from esdb_spark.functions import bucket_tree

    return bucket_tree(col, bounds, strict=True)


def interleave_sources(
    df: DataFrame,
    source_col: str = "source",
    weight_col: str = "weight",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    materialize_slim: bool = True,
) -> DataFrame:
    """Deterministic weighted interleave: global training position per
    row such that sources appear at rates proportional to their weight.

    ``weight_col`` must be a positive double column (constant per
    source — enforced). Stride scheduling: the k-th row of a source
    (k = 1-based rank by ``id_col``, which must be unique) gets virtual
    time (k - 0.5) / weight; the global order sorts by
    (vtime, source, id) — total, deterministic, RNG-free.

    Neither rank uses an unpartitioned window (that funnels the whole
    relation through one task) or a sampled range shuffle (whose
    boundaries differ between jobs, forcing the data to be pinned —
    the round-4 version materialized the corpus in a localCheckpoint
    just to keep two jobs consistent). Instead:

    1. ONE metadata-sized job aggregates per source: row count, weight
       (constant-ness enforced), and approximate id-quantiles
       (``percentile_approx``). Driver-merged, these yield
       ``n_buckets`` id-bucket boundary LITERALS — approximate is fine
       because boundaries only balance the buckets; correctness never
       depends on where they fall.
    2. one metadata-sized job collects exact (source, bucket) counts;
       their running sums re-enter the plan as broadcast-joined
       literals — the per-source rank offsets. Boundaries being
       literals, this job and the final job see identical bucketing:
       no cross-job consistency to pin.
    3. vtime bucket boundaries and their rank offsets need NO pass at
       all: each source's vtimes are the arithmetic sequence
       (k-0.5)/w, so ``#rows with vtime <= t`` is computed exactly on
       the driver by per-source binary search with the same float
       expression Spark evaluates.

    The result is two metadata jobs plus one data-bearing job (scan →
    bucket-window rank → vtime → bucket-window rank), two shuffles of
    only (id, source, weight) — other columns are joined back by id at
    the end. With ``materialize_slim`` (the default) the
    (id, source, weight) projection is materialized ONCE via
    ``localCheckpoint`` so an expensive upstream lineage (a dedup or
    filter pipeline) is not re-executed by the stats/counts/final
    jobs; at three slim columns this is 50-100× smaller than
    checkpointing the corpus (the round-4 design), and the blocks
    release with the result. Pass ``materialize_slim=False`` when the
    input is a bare table projection — re-scanning a column-pruned
    parquet read three times is cheaper than writing it out once. The
    corpus itself is never pinned either way.

    Returns the input columns plus ``pos`` (1-based global position).
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    extra_cols = [c for c in df.columns if c not in (source_col, weight_col, id_col)]
    # one execution of df's lineage for the three rank passes (the
    # join-back at the end scans df itself once more for the payload)
    slim = df.select(source_col, weight_col, id_col)
    if materialize_slim:
        slim = slim.localCheckpoint(eager=True)
    id_dtype = df.schema[id_col].dataType
    mk = _monotone_double(
        F.col(id_col), id_dtype, _common_prefix_len(slim, id_col, id_dtype)
    )

    # -- the one stats job: per-source totals, weights, id-quantiles --
    probs = [i / n_buckets for i in range(1, n_buckets)]
    stats = (
        slim.withColumn("_mk", mk)
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n"),
            F.min(weight_col).alias("wmin"),
            F.max(weight_col).alias("wmax"),
            F.percentile_approx(
                "_mk", F.array(*[F.lit(p) for p in probs])
            ).alias("pq"),
        )
        .collect()
    )
    totals: dict = {}
    weights: dict = {}
    for row in stats:
        src = row[source_col]
        w = row["wmax"]
        if w is None or row["wmin"] != w or not w > 0:
            raise ValueError(
                "interleave_sources: weight must be a positive constant "
                f"per source (source {src!r} has min={row['wmin']} "
                f"max={row['wmax']})"
            )
        weights[src] = w
        totals[src] = row["n"]
    n_total = sum(totals.values())

    # Merge the per-source quantiles into ~n_buckets global boundaries:
    # each per-source quantile value stands for ~n_s/n_buckets rows;
    # walk the weighted merge and cut every n_total/n_buckets of mass.
    samples = sorted(
        (float(q), totals[row[source_col]] / max(1, n_buckets))
        for row in stats
        if row["pq"] is not None
        for q in row["pq"]
        if q is not None
    )
    bounds = []
    acc, step = 0.0, n_total / n_buckets if n_buckets else float("inf")
    nxt = step
    for v, mass in samples:
        acc += mass
        if acc >= nxt:
            bounds.append(v)
            nxt += step
    bounds = sorted(set(bounds))
    b1 = slim.withColumn("_mk", mk).withColumn(
        "_b", _bucket_expr(F.col("_mk"), bounds).cast("int")
    ).drop("_mk")

    # -- driver-side: vtime boundaries + exact cumulative counts.
    # C(t) = sum_s #{k in 1..n_s : (k-0.5)/w_s <= t}, evaluated with
    # the SAME double arithmetic Spark uses (numpy float64 IS IEEE
    # binary64, single-rounded like the JVM): a closed-form k estimate
    # floor(t*w + 0.5) corrected by exact-float comparisons — the
    # estimate is within ±1 for any k < 2^52, and the correction loops
    # + the final invariant assert make even that assumption checked,
    # not trusted. Vectorized over (sources × boundaries); the earlier
    # pure-Python per-boundary bisection cost ~0.5 s of driver time at
    # 32 buckets.
    import numpy as np

    ns = np.array(list(totals.values()), dtype=np.float64)
    ws = np.array(
        [float(weights[s]) for s in totals], dtype=np.float64
    )

    def _cum_counts(ts: "np.ndarray") -> "np.ndarray":
        if len(ns) == 0 or len(ts) == 0:
            return np.zeros(len(ts), dtype=np.float64)
        t = ts[None, :]
        w = ws[:, None]
        n = ns[:, None]
        k = np.clip(np.floor(t * w + 0.5), 0.0, n)
        for _ in range(4):  # (k+1 - 0.5) = k + 0.5
            up = (k < n) & ((k + 0.5) / w <= t)
            if not up.any():
                break
            k = k + up
        for _ in range(4):
            down = (k > 0.0) & ((k - 0.5) / w > t)
            if not down.any():
                break
            k = k - down
        # invariant: k is the EXACT count — k+1 fails, k passes
        ok = ((k >= n) | ((k + 0.5) / w > t)) & (
            (k <= 0.0) | ((k - 0.5) / w <= t)
        )
        if not ok.all():
            raise AssertionError(
                "interleave_sources: stride-count correction did not "
                "converge (k beyond float estimate bounds)"
            )
        return k.sum(axis=0)

    vmax = float(((ns - 0.5) / ws).max()) if len(ns) else 0.0
    targets = np.array(
        [j * n_total // n_buckets for j in range(1, n_buckets)],
        dtype=np.int64,
    )
    lo = np.zeros(len(targets))
    hi = np.full(len(targets), vmax)
    for _ in range(60):  # bisection to float resolution, all at once
        mid = (lo + hi) / 2
        less = _cum_counts(mid) < targets
        lo = np.where(less, mid, lo)
        hi = np.where(less, hi, mid)
    vbounds = sorted({float(x) for x in hi})
    voffsets = [0] + [
        int(c) for c in _cum_counts(np.array(vbounds, dtype=np.float64))
    ]  # rank offset per vbucket

    # -- exact (bucket, source) counts -> per-source rank offsets.
    # A metadata-sized collect (|sources × buckets| rows), re-entering
    # the plan as a createDataFrame with FRESH attribute ids. An
    # in-plan formulation (cumsum window over the cells re-aggregation,
    # self-joined back) was tried and reverted: the offs subtree shares
    # b1's expression ids, and Catalyst's column pruning mis-bound the
    # shared attributes under an aggregate consumer
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) — literal offsets make the
    # counts and the ranks below agree by construction, with no
    # cross-branch id sharing at all. Bucket boundaries are literals,
    # so this job and the final job see identical bucketing.
    cells = b1.groupBy(source_col, "_b").count().collect()
    running: dict = {}
    off_rows = []
    # (str(src), _b) only fixes the ITERATION order; offsets accumulate
    # in a dict keyed by the real value, and each source's entries stay
    # _b-ascending within any such interleaving — so a str() collision
    # (or NULL vs 'None') cannot corrupt the running offsets.
    for row in sorted(cells, key=lambda r: (str(r[source_col]), r["_b"])):
        src = row[source_col]
        off_rows.append((row["_b"], src, running.get(src, 0)))
        running[src] = running.get(src, 0) + row["count"]
    off_df = spark.createDataFrame(
        off_rows,
        schema=T.StructType(
            [
                T.StructField("_ob", T.IntegerType(), False),
                T.StructField("_osrc", df.schema[source_col].dataType),
                T.StructField("_soff", T.LongType(), False),
            ]
        ),
    )
    # eqNullSafe keeps NULL-source rows (the windows already grouped
    # them; a plain equi-join would silently drop them here)
    joined = b1.join(
        F.broadcast(off_df),
        (b1["_b"] == off_df["_ob"])
        & b1[source_col].eqNullSafe(off_df["_osrc"]),
    ).drop("_ob", "_osrc")
    w_src_local = Window.partitionBy("_b", source_col).orderBy(id_col)
    k = F.row_number().over(w_src_local) + F.col("_soff")
    with_vt = joined.withColumn(
        "vtime", (k - F.lit(0.5)) / F.col(weight_col)
    ).drop("_b", "_soff")
    vbucket = _bucket_expr(F.col("vtime"), vbounds)
    voff_map = F.create_map(
        *[
            x
            for i, off in enumerate(voffsets)
            for x in (F.lit(i), F.lit(off).cast("long"))
        ]
    )
    w_global = Window.partitionBy("_vb").orderBy("vtime", source_col, id_col)
    slim_pos = (
        with_vt.withColumn("_vb", vbucket.cast("int"))
        .withColumn(
            "pos",
            (F.row_number().over(w_global) + voff_map[F.col("_vb")]).cast("long"),
        )
        .drop("vtime", "_vb")
    )
    if not extra_cols:
        return slim_pos.select(*df.columns, "pos")
    # other columns never ride through the rank shuffles — join them
    # back by the (unique) id, NULL-SAFE: a plain name equi-join would
    # silently drop a NULL-id row that the ranks above dutifully
    # counted, leaving a hole in the pos sequence
    pos_tbl = slim_pos.select(F.col(id_col).alias("_pos_id"), "pos")
    return (
        df.join(pos_tbl, df[id_col].eqNullSafe(pos_tbl["_pos_id"]))
        .select(*df.columns, "pos")
    )


def upsample_by_weight(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted repetition: each row appears
    ``floor(weight)`` times plus one more with probability
    ``frac(weight)`` — decided by the md5 hash of (seed, id), not an
    RNG, so the upsampled multiset is reproducible and disjoint seeds
    give independent epochs.

    Output adds an ``epoch_copy`` column (0-based repeat index) so
    downstream shuffling/packing can keep copies apart. Expected row
    count = sum(weight) exactly in distribution and exactly
    reproducible per key. The explode is the only plan node — no
    shuffle, no RNG, scan-parallel.
    """
    # integer compare, not float division: hash32 < floor(frac * 2^32)
    # is exact and reproduces verbatim in any engine with md5 + hex
    # casting (cf. hash_sample's hex-prefix convention)
    hash32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    frac = F.col(weight_col) - F.floor(weight_col)
    cutoff = F.floor(frac * F.lit(4294967296.0)).cast("bigint")
    n_copies = (
        F.floor(F.col(weight_col))
        + F.when(hash32 < cutoff, F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("epoch_copy", F.explode(F.expr("sequence(0, _n - 1)")))
        .drop("_n")
    )


def temperature_weights(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    normalize: bool = True,
) -> DataFrame:
    """Temperature-based mixture weights per source: ``w_s ∝ n_s^α``
    — the standard multi-corpus sampling rule (α = 1 keeps natural
    proportions, α → 0 approaches uniform; α ≈ 0.3-0.7 is the usual
    multilingual/multi-source compromise that keeps small sources from
    drowning). Returns ``(source, n_rows, weight)``.

    One aggregation over the corpus (map-side combined; output bounded
    by the source count); the normalization window runs on that
    SOURCE-sized table, never the data — an unpartitioned window over
    |sources| rows is metadata work. ``normalize=False`` returns raw
    ``n^α`` — exactly what the stride scheduler
    (:func:`interleave_sources`) and :func:`upsample_by_weight` need
    (both are scale-free in the weight), and for α = 0.5 the raw
    weight is ``sqrt(n)``, which IEEE 754 rounds correctly — so the
    raw form is bit-reproducible across engines while the normalized
    form inherits the float-sum ordering of its denominator.
    """
    if alpha < 0:
        raise ValueError("temperature_weights: alpha must be >= 0")
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_rows"))
    if alpha == 0.5:
        raw = F.sqrt(F.col("n_rows"))  # correctly-rounded, engine-portable
    else:
        raw = F.pow(F.col("n_rows"), F.lit(float(alpha)))
    out = counts.withColumn("weight", raw)
    if normalize:
        out = out.withColumn(
            "weight",
            F.col("weight")
            / F.sum("weight").over(Window.partitionBy()),
        )
    return out


def with_temperature_weight(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    out_col: str = "weight",
) -> DataFrame:
    """Attach each row's (raw) temperature weight — the one-call shape
    that feeds :func:`interleave_sources` / :func:`upsample_by_weight`:
    the per-source table is source-count-sized, so the join back is a
    broadcast; the corpus never shuffles."""
    if out_col in df.columns:
        raise ValueError(
            f"with_temperature_weight: column {out_col!r} already exists "
            "— pass a different out_col (a silent duplicate would make "
            "every downstream reference ambiguous)"
        )
    w = temperature_weights(df, source_col, alpha, normalize=False).select(
        source_col, F.col("weight").alias(out_col)
    )
    return df.join(F.broadcast(w), source_col, "left")
