"""Column-expression helpers shared by operators.

Everything here returns Spark Column expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python
in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(col) -> Column:
    """Lowercased whitespace tokens of a text column (empty array for
    blank text)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != F.lit("")
    )


def word_shingles(tok: Column, n: int) -> Column:
    """Distinct n-word shingles from a token array (JVM-side; no UDF).

    ``sequence(0, size-n)`` enumerates start offsets; ``slice`` +
    ``concat_ws`` builds each shingle. Documents shorter than n words
    contribute their full text as a single shingle so they still
    participate in dedup.
    """
    shingled = F.transform(
        F.sequence(F.lit(0), F.size(tok) - n),
        lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(tok) >= n, shingled).otherwise(
            F.array(F.concat_ws(" ", tok))
        )
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns — zip_with +
    aggregate, fully codegen'd (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two vector columns."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
