"""Bucketed-table co-located join: the write-once-shuffle-never-again
layout for repeated fact joins at scale."""

import pytest
from pyspark.sql import functions as F

from esdb_spark.plans import shuffle_count
from esdb_spark.sources.bucketed import cobucket_join, write_bucketed
from esdb_spark.sources.tables import load_table


def test_cobucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS esdb_test")
    spark.sql("DROP TABLE IF EXISTS esdb_test.li_b")
    spark.sql("DROP TABLE IF EXISTS esdb_test.o_b")
    # a previously-failed run can leave the managed location behind
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/esdb_test.db", ignore_errors=True)

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "esdb_test.li_b", "l_orderkey", buckets=8)
    write_bucketed(orders, "esdb_test.o_b", "l_orderkey", buckets=8)

    # force a non-broadcast join so bucketing is what elides the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucket_join(
            spark, "esdb_test.li_b", "esdb_test.o_b", "l_orderkey"
        )
        # co-bucketed: no shuffle exchange anywhere in the join plan
        assert shuffle_count(joined) == 0
        assert joined.count() == li.count()

        # contrast: the plain-parquet join must shuffle both sides
        plain = li.join(orders, "l_orderkey")
        assert shuffle_count(plain) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
