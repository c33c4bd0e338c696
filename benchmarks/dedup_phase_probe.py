#!/usr/bin/env python
"""Phase-timed probe for dedup_minhash_docs / dedup_simhash_docs (r12
verdict ask #6): split each row's wall-clock into (a) the signature
pass (tokenize + hash aggregates, materialized exactly the way the
operator does), (b) the operator's small bookkeeping job (minhash's
row-count broadcast gate), and (c) the candidate-pair + anti-join tail
— so the next change targets the phase that actually costs.

Usage: python benchmarks/dedup_phase_probe.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esdb_spark import get_spark
from esdb_spark.sources.tables import load_table


def t(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="dedup_phase_probe")
    sc = spark.sparkContext

    from esdb_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_simhash,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash,
        simhash_near_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")

    def calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 8).selectExpr(
            "sum(id * 3 % 7) as s"
        ).collect()
        return time.perf_counter() - t0

    # warm up
    dedup_minhash_lsh(
        docs, "text", "doc_id", threshold=0.8, num_hashes=64, bands=16
    ).count()
    dedup_simhash(docs, "text", "doc_id", max_hamming=3).count()
    cal = sorted(calibrate() for _ in range(5))[2]

    out: dict = {"cal": round(cal, 4)}
    for rep in range(reps):
        r: dict = {}
        # ---- minhash phases (num_hashes=64, bands=16 — the bench row)
        sc.setJobDescription("probe:minhash_sigs")
        sigs_holder = {}

        def mh_sigs():
            sigs_holder["sigs"] = minhash_signatures(
                docs, "text", "doc_id", 64, 3
            ).localCheckpoint(eager=True)

        r["mh_sigs"] = t(mh_sigs)
        sigs = sigs_holder["sigs"]
        sc.setJobDescription("probe:minhash_count")
        r["mh_count"] = t(lambda: sigs.count())
        sc.setJobDescription("probe:minhash_tail")

        def mh_tail():
            cand = lsh_candidate_pairs(
                sigs, bands=16, num_hashes=64, broadcast=True
            )
            sig_a = F.broadcast(
                sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
            )
            sig_b = F.broadcast(
                sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
            )
            est = F.expr(
                "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
                " / 64"
            )
            drop_ids = F.broadcast(
                cand.join(sig_a, "id_a")
                .join(sig_b, "id_b")
                .filter(est >= 0.8)
                .select(F.col("id_b").alias("id"))
                .distinct()
            )
            docs.join(
                drop_ids, docs["doc_id"] == drop_ids["id"], "left_anti"
            ).select("doc_id").orderBy("doc_id").count()

        r["mh_tail"] = t(mh_tail)
        sc.setJobDescription("probe:minhash_whole")
        r["mh_whole"] = t(
            lambda: dedup_minhash_lsh(
                docs, "text", "doc_id", threshold=0.8, num_hashes=64, bands=16
            )
            .select("doc_id")
            .orderBy("doc_id")
            .count()
        )

        # ---- simhash phases (max_hamming=3 — the bench row)
        sc.setJobDescription("probe:simhash_sigs")
        h_holder = {}

        def sh_sigs():
            h_holder["h"] = simhash(docs, "text", "doc_id").localCheckpoint(
                eager=True
            )

        r["sh_sigs"] = t(sh_sigs)
        hashes = h_holder["h"]
        sc.setJobDescription("probe:simhash_tail")

        def sh_tail():
            pairs = simhash_near_pairs(hashes, 3, broadcast=True)
            drop_ids = F.broadcast(
                pairs.select(F.col("id_b").alias("id")).distinct()
            )
            docs.join(
                drop_ids, docs["doc_id"] == drop_ids["id"], "left_anti"
            ).select("doc_id").orderBy("doc_id").count()

        r["sh_tail"] = t(sh_tail)
        sc.setJobDescription("probe:simhash_whole")
        r["sh_whole"] = t(
            lambda: dedup_simhash(docs, "text", "doc_id", max_hamming=3)
            .select("doc_id")
            .orderBy("doc_id")
            .count()
        )
        sc.setJobDescription(None)
        out[f"rep{rep}"] = r
        print(json.dumps({f"rep{rep}": r}), flush=True)

    out["cal_end"] = round(sorted(calibrate() for _ in range(5))[2], 4)
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
