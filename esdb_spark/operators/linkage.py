"""Record linkage: fuzzy join on character-trigram Jaccard.

Entity resolution across tables — "which supplier names match which
registry entries", "which crawled titles are the same work" — is the
cross-table sibling of near-dedup: instead of deduping one corpus, it
links LEFT records to RIGHT records whose strings are similar. The
reference engine has no string-similarity surface (its values are
opaque bytes — space.go); this is §2.7 pipeline infrastructure.

Semantics (exact, no sketch): similarity = Jaccard over the DISTINCT
character 3-grams of the lowercased strings; a pair qualifies at
``sim >= threshold``. Records shorter than 3 chars have no trigrams
and match nothing (documented; pad upstream if needed).

Scale shape — the standard inverted-index (set-similarity) join:

1. each side explodes to (id, trigram) with per-id set sizes —
   trigram rows, never full strings, cross the shuffle;
2. an equi-join on the trigram + a (left_id, right_id) count gives
   the intersection size |A∩B| — ONE shuffled aggregation;
3. Jaccard = shared / (|A| + |B| - shared) filters pairs; set sizes
   ride along as grouping keys (no second join back).

Cost is sum over trigrams of |posting_left|x|posting_right| — the
output-sensitive optimum for exact joins. Ultra-frequent trigrams
(stop-grams: 'the', 'ing') dominate that product at corpus scale;
``max_posting`` drops trigrams whose LEFT+RIGHT posting count exceeds
the cap, an explicit RECALL trade (a qualifying pair is missed only
if ALL its shared trigrams are stop-grams — rare above moderate
thresholds, impossible when any shared trigram is rare). Set sizes
are recomputed over the pruned universe, so identical strings still
score 1.0 under pruning. Default None = exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TRIGRAMS = (
    "array_distinct(transform(sequence(1, greatest(length({s}) - 2, 0)),"
    " i -> substring({s}, i, 3)))"
)


def _trigram_sets(df: DataFrame, text_col: str, id_col: str, side: str):
    """(id, trigram, set_size) rows for one side; empty-set records
    drop out (they can never reach any positive threshold)."""
    sets = df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.expr(_TRIGRAMS.format(s=f"lower(`{text_col}`)")).alias("_tg"),
    ).filter(F.size("_tg") > 0)
    return sets.select(
        f"{side}_id",
        F.size("_tg").alias(f"{side}_n"),
        F.explode("_tg").alias("trigram"),
    )


def fuzzy_join_trigram(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    left_id: str = "left_id",
    right_id: str = "right_id",
    threshold: float = 0.7,
    max_posting: int | None = None,
) -> DataFrame:
    """Pairs (left_id, right_id, sim) with trigram-Jaccard
    ``sim >= threshold`` (see module docstring for the plan shape and
    the ``max_posting`` recall trade)."""
    if not 0 < threshold <= 1:
        raise ValueError("fuzzy_join_trigram: threshold must be in (0, 1]")
    lt = _trigram_sets(left, left_text, left_id, "l")
    rt = _trigram_sets(right, right_text, right_id, "r")
    if max_posting is not None:
        from pyspark.sql import Window

        # posting length across BOTH sides; computed once, broadcast
        heavy = (
            lt.select("trigram")
            .unionAll(rt.select("trigram"))
            .groupBy("trigram")
            .count()
            .filter(F.col("count") > max_posting)
            .select("trigram")
        )
        lt = lt.join(F.broadcast(heavy), "trigram", "left_anti")
        rt = rt.join(F.broadcast(heavy), "trigram", "left_anti")
        # set sizes must describe the PRUNED universe — keeping the
        # original sizes deflates sim for every record that contained
        # a stop-gram (identical strings scored 0.67, not 1.0, with
        # one stop-gram in five). The window is partitioned per
        # record id — bounded by a record's trigram count.
        lt = lt.withColumn(
            "l_n", F.count("*").over(Window.partitionBy("l_id"))
        )
        rt = rt.withColumn(
            "r_n", F.count("*").over(Window.partitionBy("r_id"))
        )
    shared = (
        lt.join(rt, "trigram")
        .groupBy("l_id", "r_id", "l_n", "r_n")
        .agg(F.count("*").alias("_shared"))
    )
    sim = F.col("_shared") / (
        F.col("l_n") + F.col("r_n") - F.col("_shared")
    ).cast("double")
    return (
        shared.withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select(
            F.col("l_id").alias("left_id"),
            F.col("r_id").alias("right_id"),
            "sim",
        )
    )
