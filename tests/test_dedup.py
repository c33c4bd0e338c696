"""Dedup operator tests at sf0.001 + synthetic near-dup fixtures."""

import pytest
from pyspark.sql import functions as F

from esdb_spark.operators.dedup import (
    dedup_embedding_cosine,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_simhash,
    minhash_jaccard_estimate,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "into the deep green forest to find some food for the long winter"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("quick", "speedy")),  # near dup of 0
        (3, "completely different text about spark sql engines and columnar storage formats"),
        (4, "yet another unrelated document mentioning parquet files compression and statistics"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact_keeps_smallest_id(docs):
    out = dedup_exact(docs, ["text"], order_col="doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [0, 2, 3, 4]


def test_dedup_exact_unordered(docs):
    assert dedup_exact(docs, ["text"]).count() == 4


def test_minhash_estimates_jaccard(docs):
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=128)
    pairs = docs.selectExpr("doc_id as id_a").crossJoin(
        docs.selectExpr("doc_id as id_b")
    ).filter("id_a < id_b")
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_jaccard_estimate(sigs, pairs).collect()
    }
    assert est[(0, 1)] == 1.0  # identical docs
    assert est[(0, 2)] > 0.5  # near dup
    assert est[(0, 3)] < 0.2  # unrelated


def test_lsh_finds_near_pairs(docs):
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=128)
    pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs, bands=32).collect()}
    assert (0, 1) in pairs
    assert (0, 2) in pairs


def test_dedup_minhash_lsh(docs):
    out = dedup_minhash_lsh(docs, "text", "doc_id", threshold=0.5)
    kept = sorted(r.doc_id for r in out.collect())
    assert 0 in kept and 1 not in kept and 2 not in kept
    assert 3 in kept and 4 in kept


def test_simhash_hamming(docs):
    hashes = simhash(docs, "text", "doc_id")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(hashes, max_hamming=10).collect()
    }
    assert pairs[(0, 1)] == 0  # identical
    assert (0, 2) in pairs  # near dup within 10 bits
    out = dedup_simhash(docs, "text", "doc_id", max_hamming=10)
    kept = sorted(r.doc_id for r in out.collect())
    assert 0 in kept and 1 not in kept


def test_ngram_jaccard_exact(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.4).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.5 < pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_dedup_embedding_cosine(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),  # ~dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = dedup_embedding_cosine(df, "embedding", "vec_id", threshold=0.95)
    assert sorted(r.vec_id for r in out.collect()) == [0, 2, 3]


def test_dedup_real_documents(spark):
    from esdb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # all 500 texts are distinct → exact dedup is the identity
    assert dedup_exact(docs, ["text"], order_col="doc_id").count() == docs.count()
    # minhash runs end-to-end on real data and keeps a sane fraction
    kept = dedup_minhash_lsh(
        docs, "text", "doc_id", threshold=0.9, num_hashes=64, bands=16
    ).count()
    assert kept > 0.5 * docs.count()


def test_dedup_embedding_bucketed_path_matches_brute_force(spark):
    """The LSH-bucketed scale path (brute_force_limit exceeded) must
    agree with brute force on exact duplicates: an identical vector
    hashes to the same bucket in every table, so recall is 1.0
    regardless of LSH parameters."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(100, 16))
    rows = [(i, base[i].tolist()) for i in range(100)]
    # ids 100..129 are exact copies of vectors 0..29 → must be dropped
    rows += [(100 + i, base[i].tolist()) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    brute = dedup_embedding_cosine(
        df, "embedding", "vec_id", threshold=0.999, brute_force_limit=1000
    )
    bucketed = dedup_embedding_cosine(
        df, "embedding", "vec_id", threshold=0.999, brute_force_limit=0
    )
    want = sorted(range(100))
    assert sorted(r.vec_id for r in brute.collect()) == want
    assert sorted(r.vec_id for r in bucketed.collect()) == want


def test_dup_clusters_transitive(spark):
    """A≈B, B≈C chain must land A, B, C in one cluster (min id) even
    though A and C share no edge; disconnected pair forms its own."""
    from esdb_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dup_clusters_empty(spark):
    from esdb_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    assert dup_clusters(pairs).count() == 0


def test_dedup_by_cluster_keeps_one_per_component(spark):
    from esdb_spark.operators.dedup import dedup_by_cluster

    rows = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(1, 7)], ["doc_id", "text"]
    )
    # components {1,2,3} (chain) and {4,5}; 6 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], ["id_a", "id_b"]
    )
    kept = sorted(
        r.doc_id for r in dedup_by_cluster(rows, pairs, "doc_id").collect()
    )
    assert kept == [1, 4, 6]


def test_ngram_jaccard_bitset_and_inverted_agree(spark):
    """The adaptive fast path (≤192-shingle vocabulary → bitset join)
    and the general inverted-index path must produce identical pairs.
    A 300-word vocabulary forces the inverted path; restricting the
    same docs to a 50-word vocabulary takes the bitset path; a shared
    20-doc corpus built from both vocab sizes is scored through the
    internal helpers directly and compared."""
    import random

    from esdb_spark.functions import tokens, word_shingles
    from esdb_spark.operators.dedup import (
        _jaccard_pairs_bitset,
        _jaccard_pairs_inverted,
    )
    from pyspark.sql import functions as F

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(120)]
    docs = []
    for i in range(20):
        base_words = rng.sample(vocab, 12)
        docs.append((i, " ".join(base_words * 2)))
        if i % 3 == 0:  # near-dup neighbor
            docs.append((100 + i, " ".join(base_words[:10] + ["extra"])))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    base = df.select(
        F.col("doc_id").alias("id"),
        word_shingles(tokens("text"), 1).alias("sh"),
    )
    vlist = sorted(
        r.s for r in base.select(F.explode("sh").alias("s")).distinct().collect()
    )
    assert len(vlist) <= 192  # bitset-eligible by construction
    got_bitset = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in _jaccard_pairs_bitset(base, vlist, 0.5).collect()
    }
    got_inverted = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in _jaccard_pairs_inverted(base, 0.5).collect()
    }
    assert got_bitset == got_inverted
    assert got_bitset  # the corpus does contain qualifying pairs


def test_dedup_by_cluster_quality_keeper(spark):
    """score_col keeps the best-quality doc per component (ties ->
    smaller id); default still keeps min id (round-4 addition)."""
    from esdb_spark.operators.dedup import dedup_by_cluster

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (10, None), (11, 0.1)],
        "doc_id int, quality double",
    )
    # components: {1,2,3} via chain, {10,11}; 4 isolated
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a int, id_b int"
    )
    best = dedup_by_cluster(docs, pairs, "doc_id", score_col="quality")
    kept = sorted(r["doc_id"] for r in best.collect())
    # {1,2,3}: 2 and 3 tie at 0.9 -> keep 2; {10,11}: NULL loses -> 11
    assert kept == [2, 4, 11]
    default = dedup_by_cluster(docs, pairs, "doc_id")
    assert sorted(r["doc_id"] for r in default.collect()) == [1, 4, 10]


def test_dedup_audit_lineage(spark):
    """dedup_audit emits (dropped, kept, cluster) consistent with
    dedup_by_cluster under both keeper policies."""
    from esdb_spark.operators.dedup import dedup_audit, dedup_by_cluster

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (10, None), (11, 0.1)],
        "doc_id int, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a int, id_b int"
    )
    audit = {r["dropped_id"]: r for r in dedup_audit(
        docs, pairs, "doc_id", score_col="quality").collect()}
    assert set(audit) == {1, 3, 10}
    assert audit[1]["kept_id"] == 2 and audit[3]["kept_id"] == 2
    assert audit[10]["kept_id"] == 11
    # audit's dropped set == complement of dedup_by_cluster's kept set
    kept = {r["doc_id"] for r in dedup_by_cluster(
        docs, pairs, "doc_id", score_col="quality").collect()}
    assert set(audit).isdisjoint(kept)
    assert set(audit) | kept == {1, 2, 3, 4, 10, 11}
    # min-id policy default
    audit_min = {r["dropped_id"]: r["kept_id"] for r in dedup_audit(
        docs, pairs, "doc_id").collect()}
    assert audit_min == {2: 1, 3: 1, 11: 10}
