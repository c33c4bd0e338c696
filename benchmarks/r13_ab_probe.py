#!/usr/bin/env python
"""Interleaved same-window A/B for the r13 operator changes.

Old plan shapes are reconstructed INLINE (the pre-r13 code), new ones
come from the library, and A/B reps interleave (A,B,A,B,...) so host
drift hits both sides equally. Rows:

- parts_bought_together: old = five-consumer lazy basket (no
  checkpoint, no hints); new = cooccurrence_pairs (one lazy
  localCheckpoint + estimate-gated broadcasts).
- event_type_transitions: old = alias-below-window projection (state
  string duplicated through the entity exchange); new =
  sequence.event_transitions (slim projection, alias after).

Usage: python benchmarks/r13_ab_probe.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from esdb_spark import get_spark
from esdb_spark.sources.tables import load_table


def old_cooccurrence_pairs(df, group_col, item_col, min_pairs):
    basket = df.select(
        F.col(group_col).alias("_co_g"), F.col(item_col).alias("_co_i")
    ).distinct()
    totals = basket.agg(
        F.countDistinct("_co_g").cast("long").alias("n_groups")
    )
    left = basket.select("_co_g", F.col("_co_i").alias("item_a"))
    right = basket.select("_co_g", F.col("_co_i").alias("item_b"))
    pairs = (
        left.join(right, "_co_g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_both"))
        .filter(F.col("n_both") >= min_pairs)
    )
    support = basket.groupBy("_co_i").agg(
        F.count("*").cast("long").alias("_co_n")
    )
    sa = support.select(
        F.col("_co_i").alias("item_a"), F.col("_co_n").alias("n_a")
    )
    sb = support.select(
        F.col("_co_i").alias("item_b"), F.col("_co_n").alias("n_b")
    )
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a", "item_b", "n_both", "n_a", "n_b", "n_groups",
            (
                (F.col("n_both").cast("double") * F.col("n_groups").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


def old_event_transitions(df, entity_col, ts_col, state_col, tiebreaks):
    w = Window.partitionBy(entity_col).orderBy(
        *[F.col(c).asc() for c in [ts_col, *tiebreaks]]
    )
    nxt = df.select(
        F.col(state_col).alias("state"),
        F.lead(state_col).over(w).alias("next_state"),
        (F.lead(ts_col).over(w) - F.col(ts_col)).alias("_sq_gap"),
    ).filter(F.col("next_state").isNotNull())
    counts = nxt.groupBy("state", "next_state").agg(
        F.count("*").cast("long").alias("n")
    )
    wf = Window.partitionBy("state")
    return counts.withColumn(
        "n_from", F.sum("n").over(wf).cast("long")
    ).withColumn("p", F.col("n") / F.col("n_from"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark(app_name="r13_ab")
    sc = spark.sparkContext

    from esdb_spark.operators.cooccur import cooccurrence_pairs
    from esdb_spark.operators.sequence import event_transitions
    from esdb_spark.functions import epoch_us

    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    obs = ev.select(
        "user_id", epoch_us("ts").alias("ts_us"), "event_type", "event_id"
    )

    def pbt_old():
        return (
            old_cooccurrence_pairs(li, "l_orderkey", "l_partkey", 2)
            .orderBy(F.desc("n_both"), F.asc("item_a"), F.asc("item_b"))
            .limit(30)
        )

    def pbt_new():
        return (
            cooccurrence_pairs(li, "l_orderkey", "l_partkey", min_pairs=2)
            .orderBy(F.desc("n_both"), F.asc("item_a"), F.asc("item_b"))
            .limit(30)
        )

    def ett_old():
        return old_event_transitions(
            obs, "user_id", "ts_us", "event_type", ["event_id"]
        ).orderBy("state", "next_state")

    def ett_new():
        return event_transitions(
            obs, "user_id", "ts_us", "event_type", tiebreak_cols=["event_id"]
        ).orderBy("state", "next_state")

    def calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 8).selectExpr(
            "sum(id * 3 % 7) as s"
        ).collect()
        return time.perf_counter() - t0

    # warm up both sides + JIT
    for f in (pbt_old, pbt_new, ett_old, ett_new):
        f().count()
    cal0 = sorted(calibrate() for _ in range(5))[2]

    out: dict = {"cal_start": round(cal0, 4)}
    for label, a, b in (
        ("parts_bought_together", pbt_old, pbt_new),
        ("event_type_transitions", ett_old, ett_new),
    ):
        olds, news = [], []
        for _ in range(reps):
            sc.setJobDescription(f"ab:{label}:old")
            t0 = time.perf_counter()
            a().count()
            olds.append(time.perf_counter() - t0)
            sc.setJobDescription(f"ab:{label}:new")
            t0 = time.perf_counter()
            b().count()
            news.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        out[label] = {
            "old_median": round(sorted(olds)[len(olds) // 2], 4),
            "new_median": round(sorted(news)[len(news) // 2], 4),
            "old_min": round(min(olds), 4),
            "new_min": round(min(news), 4),
            "old": [round(x, 3) for x in olds],
            "new": [round(x, 3) for x in news],
        }
        print(json.dumps({label: out[label]}), flush=True)
    out["cal_end"] = round(sorted(calibrate() for _ in range(5))[2], 4)
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
