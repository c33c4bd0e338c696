"""End-to-end corpus pipeline (pipelines.build_pretraining_corpus):
stage accounting, monotone shrinkage, determinism, packed output
integrity."""

import pytest

from pyspark.sql import functions as F

from esdb_spark.pipelines import build_pretraining_corpus
from esdb_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def result(spark):
    docs = load_table(spark, SF_DIR, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return build_pretraining_corpus(
        train, eval_docs, min_quality=0.5, pack_budget=256, pack_shards=8
    )


def test_audit_monotone_and_complete(result):
    a = result.audit
    order = ["input", "quality_filter", "exact_dedup", "near_dedup",
             "decontaminated", "packed"]
    assert list(a) == order
    counts = [a[k] for k in order]
    assert all(x >= y for x, y in zip(counts, counts[1:]))
    assert a["input"] == 475
    assert a["decontaminated"] < a["input"]  # something was cleaned


def test_corpus_schema_and_rows(result):
    c = result.corpus
    for col in ["doc_id", "text", "split", "shuffle_key", "shard", "bin", "offset"]:
        assert col in c.columns
    assert c.count() == result.audit["packed"]
    # every doc packed exactly once
    assert c.select("doc_id").distinct().count() == c.count()


def test_splits_cover_all_rows(result):
    got = {r["split"] for r in result.corpus.select("split").distinct().collect()}
    assert got <= {"train", "val", "test"}
    assert "train" in got


def test_pipeline_with_optional_cleaning_stages(spark):
    docs = load_table(spark, SF_DIR, "documents")
    # frame with chrome so the boilerplate stage has something to strip
    framed = docs.select(
        "doc_id",
        F.concat(
            F.lit("hdr "), F.col("source"), F.lit("\n"),
            F.col("text"), F.lit("\nshared footer line"),
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    res = build_pretraining_corpus(
        framed,
        eval_docs=None,
        min_quality=0.0,
        boilerplate_min_docs=5,
        min_lm_score=-10.0,  # permissive: keeps all, exercises the stage
        dup_span_n=4,
        pack_budget=256,
        pack_shards=8,
    )
    a = res.audit
    assert list(a) == [
        "input", "boilerplate_strip", "quality_filter", "lm_filter",
        "exact_dedup", "near_dedup", "span_removal_docs", "packed",
    ]
    assert a["boilerplate_strip"] == a["input"]  # strip rewrites, not drops
    counts = [a[k] for k in list(a)[1:]]
    assert all(x >= y for x, y in zip(counts, counts[1:]))
    # the chrome is gone from the surviving text
    sample = res.corpus.select("text").first()["text"]
    assert "shared footer line" not in sample and "hdr " not in sample


def test_pipeline_deterministic(spark, result):
    docs = load_table(spark, SF_DIR, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    again = build_pretraining_corpus(
        train, eval_docs, min_quality=0.5, pack_budget=256, pack_shards=8
    )
    assert again.audit == result.audit
    a = result.corpus.select("doc_id", "split", "shard", "bin", "offset")
    b = again.corpus.select("doc_id", "split", "shard", "bin", "offset")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pipeline_with_bpe_tokenizer_sizing(spark):
    """bpe_merges sizes packing bins by real tokenizer counts: every
    (shard, bin) must respect the budget under re-encoding with the
    same merges, and the audit reports the trained merge count."""
    from esdb_spark.operators.bpe import bpe_encode, train_bpe

    docs = load_table(spark, SF_DIR, "documents")
    res = build_pretraining_corpus(
        docs,
        min_quality=0.0,
        pack_budget=512,
        pack_shards=4,
        bpe_merges=40,
    )
    assert res.audit["bpe_merges"] == 40
    # re-derive the merges the pipeline trained (same data, same cap:
    # deterministic) and check bin budgets against true token counts
    kept = res.corpus
    merges = train_bpe(kept, "text", num_merges=40)
    counted = bpe_encode(kept, merges, "text").withColumn(
        "_n", F.size("bpe_tokens")
    )
    over = (
        counted.groupBy("shard", "bin")
        .agg(F.sum("_n").alias("tot"), F.count("*").alias("docs"))
        # a single doc longer than the budget gets its own bin — allowed
        .filter((F.col("tot") > 512) & (F.col("docs") > 1))
        .count()
    )
    assert over == 0
