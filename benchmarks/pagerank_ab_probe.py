#!/usr/bin/env python
"""Interleaved same-window A/B for the r13 pass-2 pagerank change.

Old shape (pre-r13-pass-2) reconstructed INLINE: per round the
stats-less checkpointed node frames sort-merge-join — ranks⋈outdeg and
nodes⋈contribs each pay node-sized shuffle exchanges + sorts. New shape
comes from the library (operators/graph.pagerank): under the existing
≤5M-node guard, outdeg / contribs take broadcast hints so each round
keeps ONE shuffle (the contribution aggregate).

Times the FULL doc_pagerank row (sig build + LSH pairs + pagerank +
ordered count), interleaved (A,B,A,B,...) so host drift hits both
sides equally. Also dumps one-round formatted plans for both shapes to
plans/r13/doc_pagerank_round_{before,after}.txt.

Usage: python benchmarks/pagerank_ab_probe.py [sf_dir] [reps]
"""
from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esdb_spark import get_spark
from esdb_spark.sources.tables import load_table
from esdb_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
from esdb_spark.operators.graph import _ckpt_pooled, pagerank

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def old_pagerank(edges, damping=0.85, iters=15, checkpoint_every=5):
    """The pre-r13-pass-2 loop: no broadcast hints on outdeg /
    contribs / dangling_ids (only the rank_deg result hint)."""
    e = (
        edges.select(F.col("src").alias("src"), F.col("dst").alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    nodes, outdeg = _ckpt_pooled(
        [
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct(),
            e.groupBy("src")
            .agg(F.count("*").alias("outdeg"))
            .select(F.col("src").alias("_d_src"), "outdeg"),
        ]
    )
    e2 = e.select(F.col("src").alias("_e_src"), F.col("dst").alias("_e_dst"))
    stats = (
        nodes.join(outdeg, F.col("id") == F.col("_d_src"), "left")
        .agg(
            F.count("*").alias("_pr_n"),
            F.coalesce(
                F.sum(F.when(F.col("outdeg").isNull(), 1).otherwise(0)),
                F.lit(0),
            ).alias("_pr_nd"),
        )
        .first()
    )
    n = stats["_pr_n"]
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    has_dangling = stats["_pr_nd"] > 0
    dangling_ids = (
        nodes.join(outdeg, F.col("id") == F.col("_d_src"), "left_anti")
        .localCheckpoint()
        if has_dangling
        else None
    )
    broadcast_ranks = n <= 5_000_000
    effective_ck = 1 if has_dangling else checkpoint_every
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        if has_dangling:
            mass = (
                ranks.join(dangling_ids, "id", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_pr_mass"))
            )
            base_col = F.lit((1.0 - damping) / n) + F.lit(damping / n) * F.col("_pr_mass")
        rank_deg = ranks.join(outdeg, F.col("id") == F.col("_d_src"))
        if broadcast_ranks:
            rank_deg = F.broadcast(rank_deg)
        contribs = (
            e2.join(rank_deg, F.col("id") == F.col("_e_src"))
            .select(
                F.col("_e_dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("in_mass"))
        )
        nxt = nodes.join(contribs, "id", "left")
        if has_dangling:
            nxt = nxt.crossJoin(F.broadcast(mass))
            base = base_col
        else:
            base = F.lit((1.0 - damping) / n)
        ranks = nxt.select(
            "id",
            (
                base + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
            ).alias("rank"),
        )
        if (it + 1) % effective_ck == 0 or it == iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def doc_edges(spark):
    docs = load_table(spark, SF_DIR, "documents")
    num_hashes, bands = 64, 16
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=num_hashes)
    sigs = sigs.localCheckpoint()
    cand = lsh_candidate_pairs(sigs, bands=bands, num_hashes=num_hashes)
    est = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
        f" / {num_hashes}"
    )
    pairs = (
        cand.join(
            sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .filter(est >= 0.5)
        .select("id_a", "id_b")
    )
    return pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )


def full_row(spark, impl):
    t0 = time.perf_counter()
    r = impl(doc_edges(spark), iters=10)
    n = r.select("id", F.round("rank", 6).alias("rank")).orderBy("id").count()
    return time.perf_counter() - t0, n


def calibrate(spark):
    t0 = time.perf_counter()
    spark.range(0, 20_000_000, 1, 8).selectExpr("sum(id * 3 % 7) as s").collect()
    return time.perf_counter() - t0


def dump_round_plans(spark):
    """One-round formatted plans, old vs new shape, over the real
    doc graph's checkpointed frames."""
    e = (
        doc_edges(spark)
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    nodes, outdeg = _ckpt_pooled(
        [
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct(),
            e.groupBy("src")
            .agg(F.count("*").alias("outdeg"))
            .select(F.col("src").alias("_d_src"), "outdeg"),
        ]
    )
    n = nodes.count()
    e2 = e.select(F.col("src").alias("_e_src"), F.col("dst").alias("_e_dst"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    def one_round(broadcast_hints: bool):
        od = F.broadcast(outdeg) if broadcast_hints else outdeg
        rank_deg = F.broadcast(ranks.join(od, F.col("id") == F.col("_d_src")))
        contribs = (
            e2.join(rank_deg, F.col("id") == F.col("_e_src"))
            .select(
                F.col("_e_dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("in_mass"))
        )
        cb = F.broadcast(contribs) if broadcast_hints else contribs
        return nodes.join(cb, "id", "left").select(
            "id",
            (
                F.lit(0.15 / n) + F.lit(0.85) * F.coalesce("in_mass", F.lit(0.0))
            ).alias("rank"),
        )

    os.makedirs("plans/r13", exist_ok=True)
    for name, hints in (("before", False), ("after", True)):
        buf = io.StringIO()
        with redirect_stdout(buf):
            one_round(hints).explain("formatted")
        with open(f"plans/r13/doc_pagerank_round_{name}.txt", "w") as fh:
            fh.write(
                "# ONE rank-update round of operators/graph.pagerank over the\n"
                "# sf0.1 doc near-dup graph (the loop executes eagerly inside\n"
                "# localCheckpoint, so the full-query explain shows only the\n"
                f"# final checkpoint scan). Shape: {'r13 pass-2 broadcast hints' if hints else 'pre-r13-pass-2 (no outdeg/contribs hints)'}.\n"
            )
            fh.write(buf.getvalue())
        print(f"wrote plans/r13/doc_pagerank_round_{name}.txt")


def main():
    spark = get_spark(app_name="pagerank_ab_probe")
    load_table(spark, SF_DIR, "documents").count()  # warm-up
    cal0 = sorted(calibrate(spark) for _ in range(5))[2]
    print(f"cal_start {cal0:.4f}")
    # warm both paths once (codegen/JIT)
    full_row(spark, old_pagerank)
    full_row(spark, pagerank)
    olds, news = [], []
    for rep in range(REPS):
        ta, na = full_row(spark, old_pagerank)
        tb, nb = full_row(spark, pagerank)
        assert na == nb, (na, nb)
        olds.append(ta)
        news.append(tb)
        print(f"rep{rep}: old={ta:.3f} new={tb:.3f} rows={na}")
    olds.sort()
    news.sort()
    print(
        f"old median={olds[len(olds) // 2]:.3f} min={olds[0]:.3f} | "
        f"new median={news[len(news) // 2]:.3f} min={news[0]:.3f}"
    )
    cal1 = sorted(calibrate(spark) for _ in range(5))[2]
    print(f"cal_end {cal1:.4f}")
    dump_round_plans(spark)


if __name__ == "__main__":
    main()
