"""Training-corpus sink: materialize a packed corpus as the artifact
a trainer consumes.

The output end of ``pipelines.build_pretraining_corpus`` (the
reference engine's sinks stop at `.esdb` archives — writer.go; this
is the §2.7 training-pipeline counterpart): parquet partitioned by
split (``split=train/`` etc. directories prune at the scan), one file
per pack shard, and rows inside each file already in epoch-shuffle
order — so a data loader reads files sequentially with zero further
shuffling or sorting.

Scale design:

- Hash ``repartition`` on (split, shard) puts ALL of a pair's rows in
  exactly one task, and the writer's ``partitionBy(split, shard)``
  splits each task's output by directory — so every (split, shard)
  directory holds exactly one file, deterministically. (An earlier
  revision range-partitioned and wrote one directory per split: the
  sampled boundaries only *approximate* 1 task per pair, so two small
  shards could share a file — a silent break of the loader contract.)
  A hash collision merely makes one task write two directories
  sequentially. One data shuffle; the corpus is persisted for the
  sink's three reads (partition count, write, manifest) so the
  upstream pipeline lineage executes once.
- ``sortWithinPartitions`` orders rows by the deterministic shuffle
  key inside each task — a per-task sort of shard-sized data, never a
  global sort.
- The manifest aggregates per (split, shard) — output bounded by the
  shard count, collected once; at 100 TB that is thousands of rows,
  not data-sized.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_training_shards(
    corpus: DataFrame,
    out_path: str,
    split_col: str = "split",
    shard_col: str = "shard",
    order_col: str = "shuffle_key",
    token_col: str | None = None,
) -> dict:
    """Write the corpus as ``out_path/split=<s>/shard=<k>/…`` parquet,
    exactly one file per (split, shard), rows in ``order_col`` order
    within each file. Returns (and writes alongside, as
    ``_MANIFEST.json``) a manifest: per-split/shard row counts
    (+ token totals when ``token_col``).

    The manifest is the loader's unit of work accounting — resuming a
    run or assigning shards to data-parallel ranks needs counts, not a
    re-scan.
    """
    for c in (split_col, shard_col, order_col):
        if c not in corpus.columns:
            raise ValueError(f"write_training_shards: missing column {c!r}")
    # the sink reads the corpus three times (partition count, write,
    # manifest) and the input is typically the tail of an expensive
    # pipeline (dedup + LSH + packing) — persist once so that lineage
    # executes once, not three times
    corpus = corpus.persist()
    n_parts = corpus.select(split_col, shard_col).distinct().count()
    (
        corpus.repartition(
            max(n_parts, 1), F.col(split_col), F.col(shard_col)
        )
        .sortWithinPartitions(split_col, shard_col, order_col)
        .write.partitionBy(split_col, shard_col)
        .mode("errorifexists")
        .parquet(out_path)
    )
    aggs = [F.count("*").alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    rows = (
        corpus.groupBy(split_col, shard_col).agg(*aggs).collect()
    )  # bounded by shard count
    manifest = {
        "splits": {},
        "total_rows": 0,
    }
    for r in sorted(rows, key=lambda r: (r[split_col], r[shard_col])):
        sp = manifest["splits"].setdefault(
            str(r[split_col]), {"n_rows": 0, "shards": {}}
        )
        entry = {"n_rows": r["n_rows"]}
        if token_col is not None:
            entry["n_tokens"] = r["n_tokens"]
        sp["shards"][str(r[shard_col])] = entry
        sp["n_rows"] += r["n_rows"]
        manifest["total_rows"] += r["n_rows"]
    spark = corpus.sparkSession
    corpus.unpersist()
    _write_text(
        spark, os.path.join(out_path, "_MANIFEST.json"),
        json.dumps(manifest, indent=1, sort_keys=True),
    )
    return manifest


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    """Small-file write through the Hadoop FileSystem API, so the sink
    works on any configured filesystem (local, HDFS, object stores),
    same as the lifecycle markers in writer.py."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_training_split(
    spark: SparkSession, path: str, split: str, split_col: str = "split"
) -> DataFrame:
    """Read one split back; the partition directory prunes at the scan
    (only ``split=<split>/`` files are listed). Row order within each
    file is the written epoch-shuffle order — parquet readers preserve
    it per file."""
    return spark.read.parquet(path).filter(F.col(split_col) == split)
