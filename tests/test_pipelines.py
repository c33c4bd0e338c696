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
