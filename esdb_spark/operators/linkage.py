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
the cap. Similarity is then computed over the PRUNED universe (set
sizes recomputed, so identical strings still score 1.0), which moves
results in BOTH directions relative to the full universe: a pair
whose overlap was only stop-grams is missed entirely (recall), and a
pair sharing one rare gram among mostly-pruned sets scores higher
than its true Jaccard (precision) — the standard behavior of
stop-word-filtered similarity; pick the cap accordingly. Default
None = exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# The length guard is a CASE, not greatest(...): Spark's
# sequence(1, 0) DEFAULTS TO STEP -1 and yields [1, 0] — a <3-char
# string would produce a bogus pseudo-trigram (the whole string, or ''
# for empty strings), silently linking every blank record to every
# other at sim 1.0 and diverging from DuckDB's generate_series(1,0)=[]
_TRIGRAMS = (
    "CASE WHEN length({s}) >= 3 THEN"
    " array_distinct(transform(sequence(1, length({s}) - 2),"
    " i -> substring({s}, i, 3)))"
    " ELSE CAST(array() AS ARRAY<STRING>) END"
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
    guard_product: int | None = None,
) -> DataFrame:
    """SCALE WARNING — the default ``max_posting=None`` is EXACT but
    unbounded: join cost is Σ_trigram |posting_left|×|posting_right|,
    and at corpus scale the stop-grams ('the', 'ing', ' co') alone
    make that product explode (10M records each containing ' in' =
    10M×10M candidate rows from ONE trigram). On anything larger than
    a dimension-table linkage, set ``max_posting`` (caps the posting
    length, pruned-universe semantics per the module docstring) or at
    least ``guard_product``.

    Returns pairs (left_id, right_id, sim) with trigram-Jaccard
    ``sim >= threshold`` (see module docstring for the plan shape and
    the ``max_posting`` recall trade).

    ``guard_product``: opt-in pre-flight probe — before building the
    pair join, compute the exact predicted candidate-pair count
    (one |vocabulary|-sized aggregation per side + a vocab-sized
    join, a tiny fraction of the pair join it predicts) and raise
    ``ValueError`` naming the worst trigrams if it exceeds the bound.
    Opt-in because it runs an eager Spark job at plan-build time;
    lazy composition (the driver-gate contract) stays the default."""
    if not 0 < threshold <= 1:
        raise ValueError("fuzzy_join_trigram: threshold must be in (0, 1]")
    lt = _trigram_sets(left, left_text, left_id, "l")
    rt = _trigram_sets(right, right_text, right_id, "r")
    if max_posting is not None:
        from pyspark.sql import Window

        # posting length across BOTH sides. No forced broadcast: the
        # stop-gram set's cardinality is data-dependent (a CJK corpus
        # with a tight cap can flag millions of trigrams) — AQE sizes
        # the anti-joins at runtime and broadcasts when actually small.
        heavy = (
            lt.select("trigram")
            .unionAll(rt.select("trigram"))
            .groupBy("trigram")
            .count()
            .filter(F.col("count") > max_posting)
            .select("trigram")
        )
        lt = lt.join(heavy, "trigram", "left_anti")
        rt = rt.join(heavy, "trigram", "left_anti")
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
    if guard_product is not None:
        per_gram = (
            lt.groupBy("trigram")
            .agg(F.count("*").alias("_nl"))
            .join(
                rt.groupBy("trigram").agg(F.count("*").alias("_nr")),
                "trigram",
            )
            .select(
                "trigram", (F.col("_nl") * F.col("_nr")).alias("_prod")
            )
        )
        stats = per_gram.agg(
            F.sum("_prod").alias("total"),
            F.max_by("trigram", "_prod").alias("worst"),
            F.max("_prod").alias("worst_prod"),
        ).collect()[0]
        if stats["total"] is not None and stats["total"] > guard_product:
            raise ValueError(
                f"fuzzy_join_trigram: predicted candidate-pair count "
                f"{stats['total']} exceeds guard_product="
                f"{guard_product}; worst trigram {stats['worst']!r} "
                f"alone contributes {stats['worst_prod']} pairs — set "
                f"max_posting to prune stop-grams (pruned-universe "
                f"semantics) or raise the guard"
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


# ---------------------------------------------------------------------------
# Edit-distance linkage: symmetric-delete blocking + exact Levenshtein
# ---------------------------------------------------------------------------


def _deletion_variants(s, d: int):
    """Column of all strings reachable from ``s`` by deleting at most
    ``d`` characters (d ∈ {1, 2}), the original included — pure column
    expressions (flatten over a position sequence), no UDF."""
    one = lambda x: F.array_union(
        F.array(x),
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(x), F.lit(1))),
            lambda i: F.concat(
                F.substring(x, F.lit(1), i - 1),
                x.substr(i + 1, F.length(x)),
            ),
        ),
    )
    # sequence(1, length) on an EMPTY string would be sequence(1,0) =
    # [1,0] (negative default step — the stop-gram lesson above);
    # greatest(len,1) keeps the sequence well-formed and the deletion
    # of position 1 from '' is '' — harmless, deduped by array_union
    vs = one(s)
    if d == 2:
        vs = F.array_distinct(F.flatten(F.transform(vs, one)))
    return vs


def fuzzy_join_levenshtein(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    left_id: str = "left_id",
    right_id: str = "right_id",
    max_dist: int = 1,
) -> DataFrame:
    """Exact edit-distance join: all (left, right) pairs with
    ``levenshtein(lower(left_text), lower(right_text)) <= max_dist``
    (``max_dist`` ∈ {1, 2}), returned as ``(left_id, right_id, dist)``.

    Blocking is the symmetric-delete scheme (the SymSpell observation):
    if two strings are within edit distance d, then deleting ≤ d
    characters from each can land them on a COMMON variant — so an
    equi-join on md5(deletion-variant) finds every candidate pair
    without any string ever meeting any other string outside its
    block. Candidates then verify with the real ``levenshtein``
    (md5 collisions and over-generated candidates are filtered here,
    so the result is exact, not approximate).

    Scale: each record fans out to ``L+1`` (d=1) or ``O(L²)`` (d=2)
    variant hashes — slim (hash, id) rows; the join keys on the hash,
    so the shuffle is variant-bounded and skew only appears if many
    records share a variant (i.e. they ARE near-duplicates — the
    output-sensitive case). The verify step rejoins the two id-keyed
    string tables (broadcast when small) rather than shipping strings
    through the variant shuffle. d≤2 covers the record-linkage sweet
    spot; beyond that, trigram Jaccard above is the right tool.
    """
    if max_dist not in (1, 2):
        raise ValueError("fuzzy_join_levenshtein: max_dist must be 1 or 2")

    def variants(df, text, idc, side):
        s = F.lower(F.col(text))
        # The .distinct() is a DATA no-op (_deletion_variants dedupes
        # within each row via array_union/array_distinct, so (id,
        # variant) pairs are already unique) — but it is measurably
        # the FASTER plan: the exchange it introduces materializes the
        # explode+md5 pipeline once where the two structurally
        # identical variant sides can share it, and gives AQE real
        # sizes for the variant join. Round-6 in-session A/B on the
        # sf0.1 self-join: with distinct 2.3-3.1 s, without 4.3-5.2 s
        # across three interleaved reps. Don't "optimize" it away.
        return df.select(
            F.col(idc).alias(f"{side}_id"),
            F.explode(_deletion_variants(s, max_dist)).alias("_v"),
        ).select(f"{side}_id", F.md5(F.col("_v")).alias("_vh")).distinct()

    lv = variants(left, left_text, left_id, "l")
    rv = variants(right, right_text, right_id, "r")
    cand = lv.join(rv, "_vh").select("l_id", "r_id").distinct()
    ls = left.select(
        F.col(left_id).alias("l_id"), F.lower(F.col(left_text)).alias("_ls")
    )
    rs = right.select(
        F.col(right_id).alias("r_id"),
        F.lower(F.col(right_text)).alias("_rs"),
    )
    return (
        cand.join(ls, "l_id")
        .join(rs, "r_id")
        .withColumn(
            "dist", F.levenshtein(F.col("_ls"), F.col("_rs")).cast("long")
        )
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("l_id").alias(left_id),
            F.col("r_id").alias(right_id),
            "dist",
        )
    )
