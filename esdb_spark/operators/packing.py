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
``w`` emits its ``k``-th document at virtual time ``(k + 0.5) / w``;
sorting all documents by virtual time yields an order whose running
source mix converges to the weights, deterministically (no RNG). The
global sort is inherent to producing a total order; Spark's
``orderBy`` handles it as a sampled range partition, so no single task
sees the whole relation.
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


def interleave_sources(
    df: DataFrame,
    source_col: str = "source",
    weight_col: str = "weight",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted interleave: global training position per
    row such that sources appear at rates proportional to their weight.

    ``weight_col`` must be a positive double column (constant per
    source). Stride scheduling: the k-th row of a source (k = 1-based
    rank by ``id_col``) gets virtual time (k - 0.5) / weight; the
    global order sorts by (vtime, source, id) — total, deterministic,
    RNG-free.

    A global rank is NOT computed with an unpartitioned window (that
    funnels the whole relation through one task). Instead: range-
    partition on the sort key, rank within each partition in parallel,
    and add per-partition offsets derived from partition counts — the
    counts collect is bounded by the partition count (metadata, not
    data). The resulting ``pos`` is a pure function of the total order,
    independent of where the sampled range boundaries land. Note this
    runs one Spark job at construction time (the counts pass).

    Returns the input columns plus ``pos`` (1-based global position).
    """
    # Per-source rank k WITHOUT Window.partitionBy(source): that window
    # funnels each entire source through ONE task — fatal when one
    # source is most of the corpus. Same partition-offset pattern as
    # the global rank below: range-partition on (source, id) so each
    # task holds a contiguous slice of one-or-more sources, rank
    # locally per (partition, source), and add offsets from a
    # metadata-sized (partitions × sources) counts job, broadcast back.
    spark = df.sparkSession
    ranked_src = (
        df.repartitionByRange(source_col, id_col)
        .sortWithinPartitions(source_col, id_col)
        .withColumn("_spid", F.spark_partition_id())
        .persist()  # pin boundaries between the counts job and consumers
    )
    scounts = ranked_src.groupBy("_spid", source_col).count().collect()
    running: dict = {}
    off_rows = []
    # (str(src), _spid) only fixes the ITERATION order; offsets
    # accumulate in the `running` dict keyed by the real value, and
    # each source's entries stay _spid-ascending within any such
    # interleaving — so a str() collision (or NULL vs 'None') cannot
    # corrupt the running offsets.
    for row in sorted(scounts, key=lambda r: (str(r[source_col]), r["_spid"])):
        src = row[source_col]
        off_rows.append((row["_spid"], src, running.get(src, 0)))
        running[src] = running.get(src, 0) + row["count"]
    # schema derived from the input: a hardcoded `string` here broke
    # integer/date source columns at createDataFrame time
    off_df = spark.createDataFrame(
        off_rows,
        schema=T.StructType(
            [
                T.StructField("_spid", T.IntegerType(), False),
                T.StructField(source_col, df.schema[source_col].dataType),
                T.StructField("_soff", T.LongType(), False),
            ]
        ),
    )
    w_src_local = Window.partitionBy("_spid", source_col).orderBy(id_col)
    k = F.row_number().over(w_src_local) + F.col("_soff")
    vtime = (k - F.lit(0.5)) / F.col(weight_col)
    sort_cols = ["vtime", source_col, id_col]
    # eqNullSafe keeps NULL-source rows (the window above already
    # grouped them; a plain equi-join would silently drop them here)
    off_b = F.broadcast(off_df)
    sorted_df = (
        ranked_src.join(
            off_b,
            (ranked_src["_spid"] == off_b["_spid"])
            & ranked_src[source_col].eqNullSafe(off_b[source_col]),
        )
        .drop(off_b["_spid"])
        .drop(off_b[source_col])
        .withColumn("vtime", vtime)
        .drop("_spid", "_soff")
        .repartitionByRange(*sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        # Pin the sampled range boundaries: without this, the counts
        # job and the consumer's job would re-sample independently and
        # the offsets could describe a different partitioning than the
        # one the final job executes. localCheckpoint (MEMORY_AND_DISK:
        # spills, never OOMs), not persist(): the blocks are released
        # when the result is garbage-collected instead of accumulating
        # in the cache manager across composed invocations, and the
        # severed lineage also frees ranked_src's cache below. The
        # lineage cut means an executor lost after this point fails
        # the query rather than recomputing — the price of boundary
        # pinning either way (recomputed boundaries would be WRONG,
        # not just slow: re-sampling breaks offset consistency).
        .localCheckpoint(eager=True)
    )
    # the checkpoint above materialized everything downstream of
    # ranked_src — its pinned partitions are no longer referenced
    ranked_src.unpersist()
    # One metadata-sized job: rows per range partition -> rank offsets.
    counts = sorted_df.groupBy("_pid").count().collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    within = Window.partitionBy("_pid").orderBy(*sort_cols)
    return (
        sorted_df.withColumn(
            "pos",
            (F.row_number().over(within) + off_map[F.col("_pid")]).cast("long"),
        )
        .drop("vtime", "_pid")
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
