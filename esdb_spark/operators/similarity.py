"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — exact brute-force top-k: cross join with the
  (broadcast) query set, cosine via zip_with/aggregate (codegen'd, no
  UDF), per-query top-k via window. The correctness baseline; cost is
  |queries| × |corpus| row pairs, so at 100 TB it is for query batches,
  not all-pairs.
- :func:`hyperplane_buckets` / :func:`ann_topk_lsh` — the scale path:
  random-hyperplane (sign) LSH. Each vector gets a ``bits``-bit bucket
  id from the signs of dot products with fixed pseudo-random
  hyperplanes; candidates co-bucket under one or more rotations.
  Deterministic: hyperplanes derive from xxhash64(seed, dim, bit) — no
  RNG state, reproducible across runs/executors.

Normalization: both paths L2-normalize once up front so cosine becomes
a dot product (saves the per-pair norm).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from esdb_spark.functions import dot, l2_norm


def normalized(df: DataFrame, vec_col: str) -> DataFrame:
    """L2-normalize a vector column (double precision)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(
        vec_col,
        F.transform(v, lambda x: x / F.nullif(l2_norm(v), F.lit(0.0))),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k nearest corpus rows per query row by cosine.

    Returns (query_id, id, cos, rank). Queries are broadcast — the
    corpus never shuffles, which is the property that matters when the
    corpus is the 100 TB side. Self-matches (same id) are excluded when
    both sides share the id column.
    """
    query_id_col = query_id_col or id_col
    c = normalized(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        "vec",
    )
    q = normalized(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        ),
        "qvec",
    )
    scored = (
        c.join(F.broadcast(q), F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            "id",
            dot(F.col("vec"), F.col("qvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, bit: int, seed: int) -> Column:
    """A deterministic pseudo-random hyperplane as an array<double>.

    Component j = xxhash64(seed, bit, j) scaled to [-1, 1]. Uniform
    signs are all LSH needs (Charikar sign-LSH does not require
    Gaussian components for unbiased angle estimates in practice).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.xxhash64(F.lit(seed), F.lit(bit), j).cast("double")
            / F.lit(float(2 ** 63))
        ),
    )


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    bits: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """(id, vec, bucket): sign-LSH bucket id from ``bits`` hyperplanes."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = sum(
        [
            F.when(dot(v, _hyperplane(dim, b, seed)) > 0, F.lit(1 << b)).otherwise(
                F.lit(0)
            )
            for b in range(bits)
        ],
        F.lit(0),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        bucket.cast("bigint").alias("bucket"),
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    bits: int = 8,
    rotations: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: union of ``rotations`` independent sign-LSH
    bucketings; candidates are corpus rows sharing a bucket with the
    query under any rotation; exact cosine re-ranks within candidates.

    The join is an equi-join on (rotation, bucket) — shuffle keys are
    tiny, the corpus partitions by bucket, and skew is bounded by
    2^bits × rotations buckets (AQE skew-join handles hot buckets).
    """
    dim = len(corpus.select(vec_col).first()[0])

    def bucketed(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        parts = []
        for r in range(rotations):
            parts.append(
                hyperplane_buckets(
                    df, vec_col, idc, bits=bits, seed=seed + r, dim=dim
                ).select(
                    F.col("id").alias(out_id),
                    F.col("vec").alias(out_id + "_vec"),
                    F.lit(r).alias("rot"),
                    "bucket",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    c = bucketed(normalized(corpus.select(id_col, vec_col), vec_col), id_col, "id")
    q = bucketed(
        normalized(queries.select(id_col, vec_col), vec_col), id_col, "query_id"
    )
    cands = (
        c.join(q, ["rot", "bucket"])
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            "id",
            dot(F.col("id_vec"), F.col("query_id_vec")).alias("cos"),
        )
        .dropDuplicates(["query_id", "id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("id").asc()
    )
    return cands.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
