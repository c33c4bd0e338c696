"""Skew-mitigation utilities.

AQE's skew-join handling (enabled in the session factory) covers
sort-merge joins; these helpers cover the cases it doesn't:

- :func:`salted_join` — explicit salting for a shuffled join against a
  replicable right side (hot keys split across ``salt`` buckets; the
  right side is replicated per salt). Use when one key holds >>1
  partition worth of rows and the right side is small enough to
  replicate but too big to broadcast whole.
- :func:`salted_count` — two-stage aggregation (salt → partial → final)
  for heavy-hitter groupBy counts. Catalyst already does map-side
  partial aggregation; the extra salt stage helps when even the
  *reduce* side of one key exceeds a task (extreme skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted into ``salt``
    buckets and the right side replicated ``salt`` times, so one hot
    key spreads over ``salt`` tasks instead of one straggler.

    Only left-preserving joins are legal: each right row is replicated
    per salt, so right/full-outer would emit ``salt - 1`` spurious
    unmatched copies of every right row."""
    if how.lower() in ("right", "rightouter", "right_outer", "full",
                       "outer", "fullouter", "full_outer"):
        raise ValueError(
            f"salted_join cannot preserve the right side (how={how!r}): "
            "the replicated right rows would surface as duplicates. "
            "Salt the other side instead."
        )
    l = left.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, [on, "_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, salt: int = 64) -> DataFrame:
    """count(*) per key, resilient to a single key dominating: salt,
    partial count per (key, salt), then sum per key."""
    partial = (
        df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)),
        )
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n"))
