"""Regenerate QUERIES.md — the one-row-per-catalog-query index.

Run from the repo root: ``python tools/gen_queries_md.py``. Descriptions
come from each query function's first docstring paragraph; TPC-H-shaped
names fall back to the standard query titles.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esdb_spark.queries import _GATE_WINDOW, catalog  # noqa: E402

TPCH_TITLES = {
    "q1": "pricing summary report (aggregates by returnflag/linestatus)",
    "q2": "minimum-cost supplier (correlated min decorrelated to a window)",
    "q3": "top-10 unshipped-order revenue (filter-early 3-way join)",
    "q4": "order priority checking (EXISTS semi-join)",
    "q5": "local supplier volume (5-way join, broadcast dims)",
    "q6": "forecasting revenue change (scan + predicate brackets)",
    "q7": "volume shipping between two nations (self-join on nation)",
    "q8": "national market share (year pivot over 7 joins)",
    "q9": "product type profit (profit expression over part/supplier joins)",
    "q10": "returned-item reporting (top-20 revenue customers)",
    "q11": "important stock (global-fraction scalar subquery)",
    "q12": "shipping modes vs priority (conditional aggregation)",
    "q13": "customer order-count distribution (left outer + re-aggregate)",
    "q14": "promotion effect (conditional revenue share)",
    "q15": "top supplier (scalar max subquery)",
    "q16": "part/supplier relationship variety (countDistinct)",
    "q17": "small-quantity-order revenue (per-part avg scalar)",
    "q18": "large-volume customers (HAVING over grouped sums)",
    "q19": "discounted revenue (OR-of-AND predicate brackets)",
    "q20": "potential part promotion (nested semi-join chain)",
    "q21": "suppliers who kept orders waiting (EXISTS + NOT EXISTS)",
    "q22": "global sales opportunity (scalar avg + anti-join)",
}

HEADER = """# QUERIES — the full catalog behind `__spark_entry__.queries()`

One row per catalog query (regenerate with
`python tools/gen_queries_md.py`). **Gate** = inside the driver's
50-row CORRECTNESS window (`queries._GATE_WINDOW`); every oracle-backed
query is also locally verified against DuckDB by
`tests/test_oracle_parity.py` at sf0.01 with exact float equality.
Rows-only queries (engine-specific hashes / numpy fits) are
cross-validated against exact counterparts in the test suite.

| # | Query | Check | Gate | What it exercises |
|---|---|---|---|---|"""


def describe(name: str, fn) -> str:
    doc = (fn.__doc__ or "").strip().split("\n\n")[0]
    doc = " ".join(doc.split())
    if not doc:
        stem = name.split("_")[0]
        if stem in TPCH_TITLES:
            doc = f"TPC-H {stem.upper()}: {TPCH_TITLES[stem]}"
        else:
            doc = "—"
    if len(doc) > 160:
        doc = doc[:157] + "..."
    return doc.replace("|", "\\|")


def main() -> None:
    lines = [HEADER]
    for i, (name, q) in enumerate(catalog().items(), 1):
        check = "oracle" if q.oracle else "rows-only"
        gate = "✓" if name in _GATE_WINDOW else ""
        lines.append(
            f"| {i} | `{name}` | {check} | {gate} | {describe(name, q.fn)} |"
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERIES.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
