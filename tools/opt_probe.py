#!/usr/bin/env python
"""Round-12 optimization probe: per-row timings + formatted plans.

Measures catalog rows and the bench's staged serves exactly the way
bench.py does (median over warm runs of ``.count()``), and captures
``.explain("formatted")`` for each probed row into ``plans/r12/``.
Usage:
    python tools/opt_probe.py [--plans-suffix before|after] \
        [--rows name1,name2,...] [--runs 5] [--sf /root/testdata/sf0.1]

Rows may be catalog names or staged-serve names from bench.STAGED_SERVES
(staging happens once into a temp dir when any staged row is probed).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esdb_spark import get_spark
from esdb_spark.queries import catalog


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-suffix", default=None,
                    help="write <plans-dir>/<row>_<suffix>.txt")
    ap.add_argument("--plans-dir", default="plans/r13")
    ap.add_argument("--rows", required=True)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None, help="append JSON line here")
    args = ap.parse_args()

    import bench as B

    spark = get_spark(app_name="opt_probe_r12")
    cat = catalog()
    staged_map = dict(B.STAGED_SERVES)
    rows = [r.strip() for r in args.rows.split(",") if r.strip()]

    staged_dir = None

    def ensure_staged():
        nonlocal staged_dir
        if staged_dir is None:
            staged_dir = tempfile.mkdtemp(prefix="esdb_opt_stage_")
            t0 = time.perf_counter()
            hyb = B.stage_hybrid_stores(spark, args.sf, staged_dir)
            gates = B.stage_gate_stores(spark, args.sf, staged_dir)
            print(json.dumps({"staging": {"hybrid": round(hyb, 3),
                                          **{k: round(v, 3) for k, v in gates.items()},
                                          "wall": round(time.perf_counter() - t0, 3)}}),
                  flush=True)
        return staged_dir

    def calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 8).selectExpr(
            "sum(id * 3 % 7) as s"
        ).collect()
        return time.perf_counter() - t0

    cal0 = sorted(calibrate() for _ in range(5))[2]
    print(json.dumps({"calibration_sec_start": round(cal0, 4)}), flush=True)

    results = {}
    for name in rows:
        if name in staged_map:
            d = ensure_staged()
            fn = lambda n=name: staged_map[n](spark, args.sf, d)
        elif name == "docs_hybrid_rrf_maintained_serve":
            d = ensure_staged()
            fn = lambda: B.hybrid_rrf_maintained_serve(spark, args.sf, d)
        elif name in cat:
            fn = lambda n=name: cat[n].fn(spark, args.sf)
        else:
            print(f"unknown row: {name}", file=sys.stderr)
            return 2
        spark.sparkContext.setJobDescription(f"probe:{name}")
        if args.plans_suffix:
            import io
            from contextlib import redirect_stdout

            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                f"{args.plans_dir}/{name}_{args.plans_suffix}.txt", "w"
            ) as fh:
                fh.write(buf.getvalue())
        if args.runs < 1:  # plans-only probe
            continue
        samples = []
        for _ in range(args.runs + 1):
            t0 = time.perf_counter()
            fn().count()
            samples.append(time.perf_counter() - t0)
        warm = sorted(samples[1:])
        results[name] = {
            "median": round(warm[len(warm) // 2], 4),
            "min": round(warm[0], 4),
            "max": round(warm[-1], 4),
            "cold": round(samples[0], 4),
        }
        print(json.dumps({name: results[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)

    cal1 = sorted(calibrate() for _ in range(5))[2]
    line = json.dumps({"sf": args.sf, "runs": args.runs, "rows": results,
                       "cal_start": round(cal0, 4), "cal_end": round(cal1, 4),
                       "loadavg": [round(x, 2) for x in os.getloadavg()]})
    print(line)
    if args.out:
        with open(args.out, "a") as fh:
            fh.write(line + "\n")
    if staged_dir:
        shutil.rmtree(staged_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
