"""Physical-plan inspection helpers — the engine's "did Catalyst do
what we designed for" checks.

Used by tests and by developers iterating on operators: a query that
reads all columns for a two-column projection, misses a partition
filter, or sorts globally where a top-k would do is a performance bug
even when results are correct (the 100 TB design review in code form).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed/physical plan as text (formatted explain)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_partition_pruning(df: DataFrame, column: str) -> bool:
    """True when the scan carries a partition filter on ``column`` —
    the Spark equivalent of the reference's space point-lookup skipping
    all other spaces' bytes (esdb.go:41-60)."""
    plan = physical_plan(df)
    pat = re.compile(rf"\b{re.escape(column)}\b")
    for line in plan.splitlines():
        # word-boundary match: a filter on `visitor_id` must not
        # satisfy a check for `id`
        if "PartitionFilters" in line and pat.search(
            line.split("PartitionFilters", 1)[1]
        ):
            return True
    return False


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True when a data filter on ``column`` is pushed into the parquet
    scan (row-group/page skipping via min-max stats)."""
    plan = physical_plan(df)
    pat = re.compile(rf"\b{re.escape(column)}\b")
    for line in plan.splitlines():
        if "PushedFilters" in line and pat.search(
            line.split("PushedFilters", 1)[1]
        ):
            return True
    return False


def has_broadcast_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_top_k(df: DataFrame) -> bool:
    """True when ORDER BY + LIMIT compiled to TakeOrderedAndProject —
    a distributed top-k (per-partition heaps), not a global sort. This
    is what makes `scan(..., limit=n)` O(n) per partition at 100 TB."""
    return "TakeOrderedAndProject" in physical_plan(df)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("ReadSchema:", 1)[1]
            inside = schema[schema.find("<") + 1 : schema.rfind(">")]
            # split at TOP-LEVEL commas only: nested struct fields
            # (struct<a:struct<x:int,y:int>,b:int>) must not leak
            # inner names as phantom top-level columns
            depth = 0
            part = []
            parts: list[str] = []
            for ch in inside:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                if ch == "," and depth == 0:
                    parts.append("".join(part))
                    part = []
                else:
                    part.append(ch)
            if part:
                parts.append("".join(part))
            for piece in parts:
                name = piece.split(":")[0].strip()
                if name and name != "...":  # Spark truncates long schemas
                    cols.append(name)
    return cols


def shuffle_count(df: DataFrame) -> int:
    """Number of *shuffle* exchanges in the plan — the scale currency:
    every one is a full network/disk cycle of its input at 100 TB.
    Broadcast exchanges are excluded (they move only the small side),
    and so are ReusedExchange nodes — a reused shuffle/broadcast does
    no new network work."""
    plan = physical_plan(df)
    return (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
    )
