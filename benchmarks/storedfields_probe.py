"""Scale probe: ids-bounded stored-fields fetch vs full segment net.

Builds a 200k-doc stored store as 4 persisted parquet segments plus a
2k-id tombstone, then times (median of 3 after warmup):
  (a) stored_fields_segments(..., ids=<10 ids>)  — the page-fetch shape
  (b) stored_fields_segments(...) full net       — the audit shape
Writes nothing to the repo; prints one line per timing. Run on an
idle box: python benchmarks/storedfields_probe.py
"""
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esdb_spark import get_spark
from esdb_spark.operators.storedfields import (
    build_stored_fields,
    stored_fields_segments,
)


def main():
    spark = get_spark(app_name="storedfields_probe")
    tmp = tempfile.mkdtemp(prefix="sf_probe_")
    docs = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body text number "), F.col("id"))
        .alias("text"),
        (F.col("id") % 5).cast("string").alias("lang"),
    )
    for i in range(4):
        build_stored_fields(
            docs.filter(F.col("doc_id") % 4 == i)
        ).write.mode("overwrite").parquet(os.path.join(tmp, f"s{i}"))
    docs.filter(F.col("doc_id") % 100 == 7).select(
        F.col("doc_id").alias("doc")
    ).write.mode("overwrite").parquet(os.path.join(tmp, "tomb"))
    segs = [spark.read.parquet(os.path.join(tmp, f"s{i}")) for i in range(4)]
    tomb = [spark.read.parquet(os.path.join(tmp, "tomb"))]
    ids = spark.createDataFrame(
        [(i * 17 + 3,) for i in range(10)], "doc long"
    )

    def med(tag, fn, reps=4):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().count()
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: median {statistics.median(ts[1:]):.3f} s "
              f"(reps {['%.3f' % t for t in ts]})")

    med("ids-bounded fetch, DataFrame semi (k=10)",
        lambda: stored_fields_segments(segs, tomb, ids=ids))
    lit_ids = [i * 17 + 3 for i in range(10)]
    med("ids-bounded fetch, literal in-filter (k=10)",
        lambda: stored_fields_segments(segs, tomb, ids=lit_ids))
    med("full net (audit shape)",
        lambda: stored_fields_segments(segs, tomb))
    print("loadavg:", os.getloadavg())


if __name__ == "__main__":
    main()
