#!/usr/bin/env python
"""Driver-style CORRECTNESS-gate simulation (the standing discipline:
run 3x green after ANY gate edit, before committing).

Replays what the driver does each round: take the FIRST 50 catalog
entries in insertion order, run each Spark query and its DuckDB oracle
at sf0.01, and compare rows + schema + values (via the stricter local
harness in tests/oracle_harness.py — exact float equality, so
divergence surfaces here before the driver's value hash). Default
Spark config, like the driver.

Usage: python tools/gate_sim.py [sf_dir] [repeat]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from pyspark.sql import SparkSession

    from esdb_spark.queries import catalog
    from oracle_harness import compare, run_oracle

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("gate_sim")
        .getOrCreate()
    )
    cat = catalog()
    window = list(cat.items())[:50]
    rc = 0
    for it in range(repeat):
        t0 = time.time()
        bad = []
        for name, q in window:
            if q.oracle is None:
                print(f"  {name}: NO ORACLE IN GATE WINDOW", flush=True)
                bad.append(name)
                continue
            try:
                ok, msg = compare(q.fn(spark, sf_dir), run_oracle(q.oracle, sf_dir))
            except Exception as exc:  # noqa: BLE001 — report, keep going
                ok, msg = False, f"EXCEPTION: {exc}"
            if not ok:
                print(f"  {name}: FAIL {msg}", flush=True)
                bad.append(name)
        dt = time.time() - t0
        status = "ALL GREEN" if not bad else f"{len(bad)} FAILED: {bad}"
        print(f"gate-sim pass {it + 1}/{repeat}: {status} ({dt:.0f}s)")
        if bad:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
