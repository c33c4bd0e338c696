"""Declarative data-quality expectations: the validation gate a
pipeline runs before promoting a corpus release.

Every rule reduces to ONE aggregate expression, so checking a whole
rule set is a single scan with map-side-combined partial aggregates —
no per-rule jobs, no collects beyond the one summary row per rule.
One caveat at the 100 TB target: each ``unique()`` rule is a
count-distinct, and TWO OR MORE of them make Catalyst expand the
input (one row replica per distinct-aggregate group — Spark's
multi-distinct rewrite), multiplying shuffle input; pass
``check(..., split_distinct=True)`` at extreme scale to trade that
replication for one extra scan per additional ``unique`` rule.
The output is data (rule, metric, threshold, passed), so gates
compose: fail the release when ``passed = false`` rows exist, log the
summary next to the release manifest (``versioning.write_release``).

Rule vocabulary (each engine-portable — the whole summary is
SQL-replayable, hence oracle-exact):

- ``not_null(col)``            — null fraction == 0
- ``null_rate_below(col, p)``  — null fraction < p
- ``unique(col)``              — no duplicate values (NULLs ignored,
  SQL UNIQUE-constraint semantics)
- ``in_range(col, lo, hi)``    — min/max within [lo, hi] (NULLs are
  not range violations — pair with a null rule)
- ``accepted_values(col, vs)`` — every non-null value in ``vs``
- ``row_count_between(lo, hi)``
- ``matches(col, regex, p)``   — at least fraction ``p`` of non-null
  values match ``regex``

No reference analog (the reference trusts its writer; validation is a
pipeline-era concern). Distinct from ``operators.profile`` (describe
what IS) — expectations assert what MUST BE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def not_null(col: str) -> dict:
    return {"rule": f"not_null({col})", "kind": "null_rate", "col": col,
            "threshold": 0.0}


def null_rate_below(col: str, p: float) -> dict:
    return {"rule": f"null_rate_below({col},{p})", "kind": "null_rate",
            "col": col, "threshold": float(p)}


def unique(col: str) -> dict:
    return {"rule": f"unique({col})", "kind": "unique", "col": col}


def in_range(col: str, lo: float, hi: float) -> dict:
    return {"rule": f"in_range({col},{float(lo)},{float(hi)})",
            "kind": "in_range", "col": col,
            "lo": float(lo), "hi": float(hi)}


def accepted_values(col: str, values: list) -> dict:
    # parameters belong in the name: two accepted_values rules on the
    # same column with different sets are distinct rules, and the
    # output rows must be tellable apart
    return {"rule": f"accepted_values({col},{'|'.join(map(str, values))})",
            "kind": "accepted", "col": col, "values": list(values)}


def row_count_between(lo: int, hi: int) -> dict:
    return {"rule": f"row_count_between({lo},{hi})", "kind": "row_count",
            "lo": int(lo), "hi": int(hi)}


def matches(col: str, regex: str, p: float = 1.0) -> dict:
    return {"rule": f"matches({col},{regex},{float(p)})",
            "kind": "matches", "col": col,
            "regex": regex, "threshold": float(p)}


def _metric_and_pass(rule: dict):
    """(metric Column, passed Column) for one rule — aggregates only."""
    kind = rule["kind"]
    if kind == "null_rate":
        c = F.col(rule["col"])
        metric = F.avg(c.isNull().cast("double"))
        passed = (
            metric == 0.0 if rule["threshold"] == 0.0
            else metric < rule["threshold"]
        )
    elif kind == "unique":
        c = F.col(rule["col"])
        metric = (
            F.count(c) - F.count_distinct(c)
        ).cast("double")  # excess duplicates among non-null values
        passed = metric == 0.0
    elif kind == "in_range":
        c = F.col(rule["col"]).cast("double")
        # violations counted directly: min/max alone can't report HOW
        # wrong the data is, and NULLs must not trip the range
        metric = F.sum(
            ((c < rule["lo"]) | (c > rule["hi"])).cast("double")
        )
        metric = F.coalesce(metric, F.lit(0.0))
        passed = metric == 0.0
    elif kind == "accepted":
        c = F.col(rule["col"])
        metric = F.coalesce(
            F.sum((~c.isin(rule["values"]) & c.isNotNull()).cast("double")),
            F.lit(0.0),
        )
        passed = metric == 0.0
    elif kind == "row_count":
        metric = F.count(F.lit(1)).cast("double")
        passed = (metric >= rule["lo"]) & (metric <= rule["hi"])
    elif kind == "matches":
        c = F.col(rule["col"])
        metric = F.avg(c.rlike(rule["regex"]).cast("double"))  # non-null only
        passed = F.coalesce(metric >= rule["threshold"], F.lit(False))
    else:
        raise ValueError(f"expectations: unknown rule kind {kind!r}")
    return metric, passed


def check(
    df: DataFrame, rules: list[dict], split_distinct: bool = False
) -> DataFrame:
    """One summary row per rule: (rule, metric, passed) — computed in
    a SINGLE aggregation pass over ``df`` (all metrics are parallel
    aggregate expressions), then unpivoted to rows. ``metric`` is the
    rule's violation measure (null fraction, duplicate excess,
    violation count, match fraction, row count).

    ``split_distinct``: the module-header caveat's escape hatch. Two
    or more ``unique()`` rules in one aggregation trigger Spark's
    multi-distinct rewrite — an Expand node that replicates every
    input row once per distinct aggregate, multiplying shuffle volume
    by the number of unique rules. With ``split_distinct=True`` the
    rule set is partitioned so no aggregation carries more than one
    count-distinct (the non-unique rules plus the first ``unique``
    stay fused; each further ``unique`` becomes its own single-rule
    pass) and the summaries are unioned back in the caller's rule
    order. Trade: k extra scans of ``df`` instead of a k× Expand
    replication through the shuffle — the right side of that trade at
    corpus scale, and identical output either way."""
    if not rules:
        raise ValueError("expectations.check: empty rule list")
    names = [r["rule"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("expectations.check: duplicate rule names")

    def one_pass(indexed: list[tuple[int, dict]]) -> DataFrame:
        aggs = []
        for i, r in indexed:
            metric, passed = _metric_and_pass(r)
            aggs.append(metric.alias(f"_m{i}"))
            aggs.append(passed.alias(f"_p{i}"))
        row = df.agg(*aggs)
        structs = F.array(
            *[
                F.struct(
                    F.lit(i).alias("ord"),
                    F.lit(names[i]).alias("rule"),
                    F.col(f"_m{i}").cast("double").alias("metric"),
                    F.coalesce(F.col(f"_p{i}"), F.lit(False)).alias(
                        "passed"
                    ),
                )
                for i, _ in indexed
            ]
        )
        return row.select(F.explode(structs).alias("r")).select(
            "r.ord", "r.rule", "r.metric", "r.passed"
        )

    indexed = list(enumerate(rules))
    uniques = [(i, r) for i, r in indexed if r["kind"] == "unique"]
    if not split_distinct or len(uniques) <= 1:
        return one_pass(indexed).orderBy("ord").drop("ord")
    fused = [
        (i, r)
        for i, r in indexed
        if r["kind"] != "unique" or i == uniques[0][0]
    ]
    parts = [one_pass(fused)] + [one_pass([iu]) for iu in uniques[1:]]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    # rule-count-sized sort — restores the caller's rule order across
    # the unioned passes
    return out.orderBy("ord").drop("ord")
