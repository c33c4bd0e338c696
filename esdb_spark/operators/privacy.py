"""Privacy audits over a release candidate: k-anonymity and
l-diversity.

Before a corpus or event extract ships (the moment
``versioning.write_release`` gates on ``expectations``), the privacy
question is structural, not regex-shaped (``text.redact_pii`` handles
that face): does some combination of quasi-identifier columns single
people out? A release is k-anonymous when every quasi-identifier
combination matches at least k rows, and l-diverse when each
combination carries at least l distinct sensitive values — Sweeney's
k-anonymity and the Machanavajjhala et al. refinement, the standard
publishable-extract checks.

Everything is one or two hash aggregations on the quasi columns —
integer counts, engine-exact, no collects; the per-group report is
bounded by the number of distinct quasi combinations and the summary
is one row. At 100 TB the quasi-combination count is the cardinality
that matters (it is ≪ rows for meaningful quasi sets); the shuffle
ships (quasi values, counts) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """Per-combination audit: ``(quasi_cols…, group_size, at_risk)``
    plus — when ``sensitive_col`` is given — ``n_distinct_sensitive``
    and ``low_diversity``. ``at_risk`` marks groups smaller than
    ``k`` (re-identifiable); ``low_diversity`` marks groups whose
    sensitive attribute takes fewer than ``l`` distinct non-NULL
    values (attribute-disclosable even at size ≥ k)."""
    aggs = [F.count("*").cast("long").alias("group_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(sensitive_col)
            .cast("long")
            .alias("n_distinct_sensitive")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs).withColumn(
        "at_risk", F.col("group_size") < k
    )
    if sensitive_col is not None:
        out = out.withColumn(
            "low_diversity", F.col("n_distinct_sensitive") < l
        )
    return out


def k_anonymity_summary(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """One-row release gate: ``(n_groups, k_min, n_at_risk_groups,
    n_rows_at_risk)``. ``k_min`` is the smallest group size — the
    dataset's actual k; publishable iff ``k_min >= k`` (equivalently
    ``n_at_risk_groups == 0``)."""
    per = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("group_size")
    )
    return per.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.min("group_size").cast("long").alias("k_min"),
        F.sum((F.col("group_size") < k).cast("long")).alias(
            "n_at_risk_groups"
        ),
        F.sum(
            F.when(F.col("group_size") < k, F.col("group_size")).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("n_rows_at_risk"),
    )


def generalize_numeric(col, width: int):
    """The standard k-anonymity repair for a numeric quasi-identifier:
    bucket to ``width``-sized bands via ``floor(v / width) * width``.
    Re-run the report on the generalized column until ``k_min`` clears.

    The division is DOUBLE division (Spark widens longs), so bands are
    exact only for |v| < 2⁵³ — fine for balances, ages, counts. For
    64-bit id-like or epoch-microsecond columns use
    :func:`generalize_integral`, which stays in integer arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / F.lit(width)) * F.lit(width)


def generalize_integral(col, width: int):
    """Exact ``width``-banding for integral quasi-identifiers:
    ``v - pmod(v, width)`` never leaves 64-bit integer arithmetic, so
    epoch-microsecond timestamps and full-range ids band correctly
    where the double path of :func:`generalize_numeric` would round
    past 2⁵³. pmod is non-negative, so negatives floor like SQL."""
    c = F.col(col) if isinstance(col, str) else col
    return c - F.pmod(c, F.lit(width))
