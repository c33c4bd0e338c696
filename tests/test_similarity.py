"""Similarity search tests: brute-force exactness + LSH recall."""

import math

import pytest
from pyspark.sql import functions as F

from esdb_spark.operators.similarity import (
    ann_topk_lsh,
    cosine_topk,
    hyperplane_buckets,
    normalized,
)
from esdb_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def _numpy_topk(pdf, query_ids, k):
    import numpy as np

    mat = np.array(pdf["embedding"].tolist(), dtype="float64")
    ids = pdf["vec_id"].to_numpy()
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for qid in query_ids:
        qi = int(np.where(ids == qid)[0][0])
        sims = mat @ mat[qi]
        order = sorted(
            [(s, i) for s, i in zip(sims, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )
        out[qid] = [i for _, i in order[:k]]
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    got = cosine_topk(emb, queries, "embedding", "vec_id", k=5)
    got_map = {}
    for r in got.orderBy("query_id", "rank").collect():
        got_map.setdefault(r.query_id, []).append(r.id)
    want = _numpy_topk(emb.toPandas(), list(range(5)), 5)
    assert got_map == want


def test_cosine_topk_excludes_self(spark, emb):
    out = cosine_topk(emb, emb.limit(3), "embedding", "vec_id", k=3)
    assert out.filter(F.col("query_id") == F.col("id")).count() == 0


def test_hyperplane_buckets_deterministic(spark, emb):
    b1 = hyperplane_buckets(emb, "embedding", "vec_id", bits=8).collect()
    b2 = hyperplane_buckets(emb, "embedding", "vec_id", bits=8).collect()
    assert {(r.id, r.bucket) for r in b1} == {(r.id, r.bucket) for r in b2}
    buckets = {r.bucket for r in b1}
    assert len(buckets) > 4  # spreads across buckets


def test_ann_lsh_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "embedding", "vec_id", k=10)
    approx = ann_topk_lsh(
        emb, queries, "embedding", "vec_id", k=10, bits=4, rotations=8
    )
    e = {(r.query_id, r.id) for r in exact.collect()}
    a = {(r.query_id, r.id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # Uniformly random 64-d vectors are sign-LSH's worst case (neighbor
    # cosine barely above 0): 4 bits × 8 rotations measured ~0.6 recall
    # here; real embedding corpora cluster and do far better. Assert
    # well above chance (10/500 = 2%).
    assert recall > 0.4, f"recall {recall}"


def test_normalized_unit_length(spark, emb):
    from esdb_spark.functions import l2_norm

    norms = (
        normalized(emb.limit(20), "embedding")
        .select(l2_norm(F.col("embedding")).alias("n"))
        .collect()
    )
    assert all(abs(r.n - 1.0) < 1e-9 for r in norms)


def test_ann_ivf_recall_beats_chance(spark, emb):
    from esdb_spark.operators.similarity import ann_topk_ivf

    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "embedding", "vec_id", k=10)
    ivf = ann_topk_ivf(
        emb, queries, "embedding", "vec_id", k=10, n_centroids=8, n_probe=3
    )
    e = {(r.query_id, r.id) for r in exact.collect()}
    a = {(r.query_id, r.id) for r in ivf.collect()}
    recall = len(e & a) / len(e)
    # probing 3/8 cells on uniform random vectors: recall tracks the
    # probed corpus fraction; assert clearly above chance (2%)
    assert recall > 0.3, f"recall {recall}"
    # each query returns exactly k rows (corpus cells are never empty
    # at 500 rows / 8 cells)
    counts = ivf.groupBy("query_id").count().collect()
    assert all(r["count"] == 10 for r in counts)


def test_ann_ivf_full_probe_equals_exact(spark, emb):
    from esdb_spark.operators.similarity import ann_topk_ivf

    queries = emb.filter(F.col("vec_id") < 3)
    exact = cosine_topk(emb, queries, "embedding", "vec_id", k=5)
    full = ann_topk_ivf(
        emb, queries, "embedding", "vec_id", k=5, n_centroids=4, n_probe=4
    )
    e = {(r.query_id, r.id, r.rank) for r in exact.collect()}
    f = {(r.query_id, r.id, r.rank) for r in full.collect()}
    assert e == f  # probing every cell degenerates to brute force
