"""Spherical k-means (operators/cluster.py): assignment verified
definitionally against numpy, determinism, degenerate inputs, and the
IVF integration that shares the helpers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from esdb_spark.operators.cluster import (
    cluster_stats,
    kmeans_assign,
    kmeans_cluster,
    kmeans_fit,
)

SF_DIR = "/root/testdata/sf0.001"


def _toy(spark, n=60, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    # three well-separated direction bundles
    basis = np.eye(dim)[:3]
    rows = []
    for i in range(n):
        v = basis[i % 3] * 10 + rng.normal(0, 0.3, dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_assignment_matches_numpy_argmax(spark):
    df = _toy(spark)
    cent = kmeans_fit(df, "embedding", "vec_id", k=3)
    assert cent.shape[0] == 3
    # centroids are unit-norm (spherical)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
    out = kmeans_assign(df, cent, "embedding", "vec_id").collect()
    vecs = {r["vec_id"]: r for r in df.collect()}
    for r in out:
        v = np.array(vecs[r["id"]]["embedding"], dtype=np.float64)
        v = v / np.linalg.norm(v)
        sims = v @ cent.T
        assert int(np.argmax(sims)) == r["cluster"]
        assert abs(float(np.max(sims)) - r["sim"]) < 1e-12


def test_separated_bundles_land_in_distinct_clusters(spark):
    df = _toy(spark)
    out = kmeans_cluster(df, "embedding", "vec_id", k=3).collect()
    by_mod = {}
    for r in out:
        by_mod.setdefault(r["id"] % 3, set()).add(r["cluster"])
    # each direction bundle maps to exactly one cluster, all distinct
    assert all(len(s) == 1 for s in by_mod.values())
    assert len(set.union(*by_mod.values())) == 3


def test_deterministic_across_runs(spark):
    df = _toy(spark)
    a = kmeans_fit(df, "embedding", "vec_id", k=3, seed=7)
    b = kmeans_fit(df, "embedding", "vec_id", k=3, seed=7)
    assert np.array_equal(a, b)


def test_k_larger_than_corpus_shrinks(spark):
    df = _toy(spark, n=4)
    cent = kmeans_fit(df, "embedding", "vec_id", k=16)
    assert cent.shape[0] == 4  # k_eff = sample size


def test_zero_vectors_excluded_from_fit_but_assigned(spark):
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cent = kmeans_fit(df, "embedding", "vec_id", k=2)
    assert cent.shape[0] == 2
    out = {r["id"]: r for r in kmeans_assign(df, cent, "embedding", "vec_id").collect()}
    assert len(out) == 3  # zero vector still produces a row
    assert out[0]["sim"] == 0.0


def test_empty_and_bad_k_raise(spark):
    df = _toy(spark, n=3)
    with pytest.raises(ValueError):
        kmeans_fit(df.limit(0), "embedding", "vec_id", k=2)
    with pytest.raises(ValueError):
        kmeans_fit(df, "embedding", "vec_id", k=0)


def test_cluster_stats_rollup(spark):
    df = _toy(spark)
    assigned = kmeans_cluster(df, "embedding", "vec_id", k=3)
    stats = cluster_stats(assigned).collect()
    assert sum(r["n_vecs"] for r in stats) == 60
    for r in stats:
        assert 0.0 < r["min_sim"] <= r["avg_sim"] <= 1.0 + 1e-12


def test_real_embeddings_no_shuffle_plan(spark):
    """Assignment plan over the real table: scan → mapInPandas, no
    exchange (the broadcast-GEMM contract)."""
    from esdb_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    cent = kmeans_fit(emb, "embedding", "vec_id", k=4)
    plan = (
        kmeans_assign(emb, cent, "embedding", "vec_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_ivf_still_correct_after_refactor(spark):
    """ann_topk_ivf shares kmeans_fit/kmeans_assign: recall vs exact
    cosine must hold (the pre-refactor contract)."""
    from esdb_spark.operators.similarity import ann_topk_ivf, cosine_topk
    from esdb_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["id"])
        for r in cosine_topk(emb, queries, "embedding", "vec_id", k=5).collect()
    }
    approx = {
        (r["query_id"], r["id"])
        for r in ann_topk_ivf(
            emb, queries, "embedding", "vec_id", k=5, n_centroids=4, n_probe=4
        ).collect()
    }
    # n_probe == n_centroids degenerates to brute force → exact recall
    assert approx == exact


def test_null_and_ragged_vectors_degrade_to_null(spark):
    """NULL / wrong-dimension vectors get NULL cluster+sim, valid rows
    still assign (round-4 review find)."""
    rows = [
        (0, [1.0, 0.0]),
        (1, None),
        (2, [1.0, 0.0, 5.0]),  # ragged
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cent = kmeans_fit(df, "embedding", "vec_id", k=2)
    out = {r["id"]: r for r in kmeans_assign(df, cent, "embedding", "vec_id").collect()}
    assert out[1]["cluster"] is None and out[1]["sim"] is None
    assert out[2]["cluster"] is None
    assert out[0]["cluster"] is not None and out[3]["cluster"] is not None


def test_kmeans_assign_works_on_streams(spark, tmp_path):
    """kmeans_assign is a stateless mapInPandas — it must compose with
    Structured Streaming unchanged (fit offline, assign on the
    stream)."""
    import numpy as np

    rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    src = str(tmp_path / "vecs")
    df.write.parquet(src)
    cent = kmeans_fit(df, "embedding", "vec_id", k=3)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = kmeans_assign(stream, cent, "embedding", "vec_id")
    q = (out.writeStream.format("memory").queryName("km_stream")
         .outputMode("append").start())
    q.processAllAvailable(); q.stop()
    got = {r["id"]: r["cluster"] for r in spark.sql(
        "SELECT * FROM km_stream").collect()}
    assert len(got) == 30
    batch = {r["id"]: r["cluster"] for r in kmeans_assign(
        df, cent, "embedding", "vec_id").collect()}
    assert got == batch  # stream == batch, row for row


def test_fit_sample_never_global_sorts_the_corpus(spark):
    """kmeans_fit/pq sample via hash_sample_k: above the 10k
    topKSortFallbackThreshold a bare orderBy+limit compiles to a FULL
    GLOBAL SORT of the input (verdict r4 #3). The large-k path must
    instead sort only a digest-prefix sliver, and must return the
    IDENTICAL rows (engine-portable oracles replay the unfiltered
    ORDER BY md5 LIMIT k)."""
    from pyspark.sql import functions as F

    from esdb_spark.functions import hash_sample_k, sample_key

    df = spark.range(40_000).select(F.col("id").alias("doc_id"))
    k = 12_000  # > threshold (large-k path), 3k < 40k (filter engages)
    sampled = hash_sample_k(df, F.col("doc_id"), k, seed="s")
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    # the sort's input is the prefix-filtered sliver, not the corpus
    assert "substring(md5" in plan, plan
    assert "Filter" in plan, plan
    naive = df.orderBy(sample_key(F.col("doc_id"), "s")).limit(k)
    got = sorted(r["doc_id"] for r in sampled.collect())
    want = sorted(r["doc_id"] for r in naive.collect())
    assert got == want
