"""Training-corpus sink (sources/training_sink.py): partition layout,
per-file ordering, manifest accounting, and round-trip."""

import glob
import json
import os

import pytest

from pyspark.sql import functions as F

from esdb_spark.pipelines import build_pretraining_corpus
from esdb_spark.sources.tables import load_table
from esdb_spark.sources.training_sink import (
    read_training_split,
    write_training_shards,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def packed(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return build_pretraining_corpus(
        docs, min_quality=0.0, pack_budget=256, pack_shards=4
    ).corpus


def test_layout_and_manifest(spark, packed, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sink") / "corpus")
    manifest = write_training_shards(packed, out, token_col="_n_tokens")
    # split directories exist and carry parquet files
    split_dirs = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out, "split=*"))
    )
    assert split_dirs == sorted(
        "split=" + s for s in manifest["splits"]
    )
    # manifest counts reconcile with the source exactly
    assert manifest["total_rows"] == packed.count()
    per_split = {
        r["split"]: r["n"]
        for r in packed.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    for s, entry in manifest["splits"].items():
        assert entry["n_rows"] == per_split[s]
        assert sum(e["n_rows"] for e in entry["shards"].values()) == entry["n_rows"]
        assert all(e["n_tokens"] > 0 for e in entry["shards"].values())
    # the manifest file itself round-trips
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        assert json.load(f) == manifest


def test_rows_ordered_within_each_file(spark, packed, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sink") / "corpus")
    write_training_shards(packed, out)
    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(out, "split=*", "shard=*", "*.parquet"))
    assert files
    for fname in files:
        t = pq.read_table(fname, columns=["shuffle_key"]).to_pandas()
        keys = list(t["shuffle_key"])
        assert keys == sorted(keys), fname


def test_exactly_one_file_per_split_shard(spark, packed, tmp_path_factory):
    """The loader contract: every (split, shard) directory holds ONE
    parquet file (hash repartition on the pair + writer partitionBy —
    not range sampling, which only approximated this)."""
    out = str(tmp_path_factory.mktemp("sink") / "corpus")
    manifest = write_training_shards(packed, out)
    n_pairs = sum(len(e["shards"]) for e in manifest["splits"].values())
    shard_dirs = glob.glob(os.path.join(out, "split=*", "shard=*"))
    assert len(shard_dirs) == n_pairs
    for d in shard_dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, d


def test_roundtrip_and_split_pruning(spark, packed, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sink") / "corpus")
    write_training_shards(packed, out)
    train = read_training_split(spark, out, "train")
    want = packed.filter(F.col("split") == "train")
    assert train.count() == want.count()
    got_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    want_ids = {r["doc_id"] for r in want.select("doc_id").collect()}
    assert got_ids == want_ids
    from esdb_spark.plans import has_partition_pruning

    assert has_partition_pruning(train, "split")


def test_refuses_overwrite_and_missing_columns(spark, packed, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sink") / "corpus")
    write_training_shards(packed, out)
    with pytest.raises(Exception):
        write_training_shards(packed, out)  # errorifexists
    with pytest.raises(ValueError):
        write_training_shards(packed.drop("shard"), out + "2")
