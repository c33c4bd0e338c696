"""Bloom-filter membership: incremental dedup against a seen corpus
without shuffling either side.

The reference engine has no sketch layer (SURVEY.md §2.6); this is
part of the training-data-pipeline capability set — the standard way
to ask "has this document been seen before?" against a multi-billion
row reference corpus where even the fingerprint anti-join
(:func:`esdb_spark.operators.corpus.dedup_against`) would shuffle
both sides on the fingerprint.

Scale design:

- The filter is built AS a DataFrame of sparse ``(word_idx, bits)``
  longs (:func:`bloom_table`): one partial-aggregating pass over the
  seen corpus (``bit_or`` combines map-side, so the shuffle carries at
  most ``m/64`` rows per partition — sketch-sized, not data-sized).
  Tables are mergeable with :func:`bloom_merge`, so per-day / per-shard
  filters union into a corpus-wide one without touching raw data.
- Probing (:func:`with_bloom_flag`) collects the sketch to the driver
  — BOUNDED by construction: ``2^num_bits_log2`` bits is 1 MiB at the
  default ``num_bits_log2=23`` regardless of corpus size — and ships
  it to executors as one broadcast numpy array (same posture as the
  IVF centroids in ``similarity.py``). Bit positions are computed
  JVM-side with the same seeded ``xxhash64`` used at build time; the
  Arrow-batched pandas UDF only does a vectorized numpy gather — the
  probed corpus itself never shuffles and never leaves the scan
  pipeline.
- False negatives are impossible (a Bloom filter never forgets an
  inserted key); false positives drop unique documents at rate
  ``(1 - e^(-k·n/m))^k`` — at the defaults (k=5 hashes, m=2^23 bits)
  that is < 1e-11 per probe for n=10k seen keys and ~1.6e-3 at n=1M;
  size ``num_bits_log2`` ≈ log2(10·n) to hold ~0.1%.

NOTE: :func:`with_bloom_flag` is EAGER at call time — it runs the
build aggregation and collects the (bounded) sketch before returning
the lazy probe plan, the same documented posture as
``ngram_jaccard_pairs``'s vocabulary probe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _positions(key: F.Column, num_bits_log2: int, num_hashes: int) -> F.Column:
    """``array<long>`` of ``num_hashes`` bit positions for a key.

    Each hash is ``xxhash64(seed_i, key)`` — seeding via a leading
    literal column, the engine-portable way to get independent hash
    families from one primitive (same convention as the minhash
    permutations in ``dedup.py``). The modulo is a mask because ``m``
    is a power of two: ``h & (m-1)`` of a negative two's-complement
    long is still the low bits, hence non-negative.
    """
    mask = (1 << num_bits_log2) - 1
    return F.array(
        *[
            F.xxhash64(F.lit(i), key).bitwiseAND(F.lit(mask))
            for i in range(num_hashes)
        ]
    )


def bloom_table(
    df: DataFrame,
    key_col: str,
    num_bits_log2: int = 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a sparse DataFrame of
    ``(word_idx: long, bits: long)`` 64-bit words (only words with at
    least one set bit appear).

    One aggregation pass: each key explodes to ``num_hashes``
    ``(word, mask)`` pairs and ``bit_or`` folds them — partial
    aggregation combines map-side, so the shuffle is bounded by the
    sketch size (≤ ``2^(num_bits_log2-6)`` rows), never the corpus.

    NULL keys are skipped (SQL membership semantics: NULL never
    matches). Without the filter, ``xxhash64(lit(i), NULL)``
    degenerates to the seed-only hash — one NULL in the corpus would
    set a constant bit pattern that every NULL probe then "finds".
    """
    pos = F.explode(
        _positions(F.col(key_col), num_bits_log2, num_hashes)
    ).alias("_bf_pos")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            F.shiftrightunsigned("_bf_pos", 6).alias("word_idx"),
            F.expr("shiftleft(1L, cast(_bf_pos % 64 as int))").alias("_bf_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bf_mask").alias("bits"))
    )


def bloom_merge(tables: list[DataFrame]) -> DataFrame:
    """Union Bloom tables built with identical (m, k) parameters into
    one — ``bit_or`` over the sparse words. Lets per-shard filters
    roll up without re-reading any corpus."""
    if not tables:
        raise ValueError("bloom_merge: need at least one table")
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def _dense_words(bloom: DataFrame, num_bits_log2: int) -> np.ndarray:
    """Collect the sparse sketch into a dense uint64 word array —
    bounded at ``2^(num_bits_log2-6)`` longs (1 MiB at the default)."""
    n_words = 1 << max(num_bits_log2 - 6, 0)
    words = np.zeros(n_words, dtype=np.uint64)
    for row in bloom.collect():  # sketch-sized by construction
        words[int(row["word_idx"])] = np.uint64(row["bits"] & ((1 << 64) - 1))
    return words


def with_bloom_flag(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    flag_col: str = "in_bloom",
    num_bits_log2: int = 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Add boolean ``flag_col``: true iff ``key_col`` is *possibly* in
    the filter (never-false for inserted keys; spuriously true at the
    documented false-positive rate).

    EAGER: collects the (bounded) sketch now; the returned probe plan
    is lazy. Positions are computed JVM-side (whole-stage codegen);
    the pandas UDF is a pure numpy bit-gather per Arrow batch.

    A NULL key flags ``false`` (SQL membership semantics — NULL is
    never a member; ``bloom_table`` never inserts NULLs either), so
    build and probe agree on the NULL contract even when these
    primitives are used outside ``dedup_against_bloom``.
    """
    words = _dense_words(bloom, num_bits_log2)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(words)

    @F.pandas_udf("boolean")
    def probe(pos: pd.Series) -> pd.Series:
        w = bc.value
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        p = np.stack(pos.to_numpy()).astype(np.int64)  # (n, k)
        word = w[p >> 6]  # uint64 gather
        bit = (word >> (p & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series((bit == 1).all(axis=1))

    return df.withColumn(
        flag_col,
        F.when(F.col(key_col).isNull(), F.lit(False)).otherwise(
            probe(_positions(F.col(key_col), num_bits_log2, num_hashes))
        ),
    )


def dedup_against_bloom(
    df: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits_log2: int = 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Approximate incremental dedup: drop rows of ``df`` whose
    ``text_col`` content fingerprint is (possibly) present in ``seen``.

    The approximate twin of ``corpus.dedup_against`` (the exact
    fingerprint anti-join): every true duplicate is removed (no false
    negatives), and unique rows are spuriously dropped at the Bloom
    false-positive rate — < 1e-11 per row at the defaults for a 10k
    seen corpus, so at gate scale the output equals the exact
    anti-join (the DuckDB oracle). Keys are md5 content fingerprints
    (``dedup_exact`` convention), so neither build nor probe ever
    moves document bodies.
    """
    # NULL text must match SQL anti-join semantics (NULL = never
    # equal): exclude NULL fingerprints from the build AND from the
    # drop predicate — xxhash64 would otherwise hash every NULL key to
    # the same constant and one NULL in `seen` would drop them all
    bloom = bloom_table(
        seen.select(F.md5(F.col(text_col)).alias("_bf_key")).filter(
            F.col("_bf_key").isNotNull()
        ),
        "_bf_key",
        num_bits_log2,
        num_hashes,
    )
    flagged = with_bloom_flag(
        df.withColumn("_bf_key", F.md5(F.col(text_col))),
        bloom,
        "_bf_key",
        flag_col="_bf_hit",
        num_bits_log2=num_bits_log2,
        num_hashes=num_hashes,
    )
    return flagged.filter(
        F.col("_bf_key").isNull() | ~F.col("_bf_hit")
    ).drop("_bf_key", "_bf_hit")
