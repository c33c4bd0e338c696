"""Benchmark decontamination: exact n-gram overlap between a training
corpus and an evaluation set.

The standard training-data hygiene step (the reference engine has no
analog — this is a north-star LLM-pipeline operator, SURVEY §2.7): a
training document is *contaminated* when it shares word n-grams with an
evaluation/benchmark document, because the model would then be graded
on text it saw in training. The canonical formulation (GPT-3 appendix C
/ PaLM-style) flags a train doc by the fraction of its unique n-grams
that appear anywhere in the eval set.

Scale design (100 TB train corpus, MB-GB eval set):

- the eval set is tiny relative to train by construction (benchmarks
  are thousands of docs, not billions), so its distinct-n-gram set is
  **broadcast**; the train side is tokenized and aggregated map-side —
  the train corpus never shuffles its text or its n-grams;
- n-grams stay as strings end-to-end: with a broadcast hash join there
  is no shuffle to compact, joining on the string is collision-free
  (no 64-bit-hash false positives silently inflating contamination),
  and the DuckDB oracle can reproduce it exactly;
- tokenize + shingle are pure column expressions (``split`` +
  ``transform``/``slice`` HOFs) — whole-stage codegen, no Python;
- the stats are deliberately TWO passes over the train text: a
  semi-join + count over the exploded grams (matches) and a plain
  ``size(array_distinct(...))`` projection (totals). The tempting
  single-pass fusion — explode every gram, left-join the broadcast
  flag, aggregate count+sum — re-measures WORSE (42 s vs 21 s on a
  100k-doc corpus): it forces the full gram stream through a hash
  aggregate, while the two-pass shape keeps totals in array
  expressions and aggregates only the semi-join survivors. Scan twice,
  aggregate almost nothing.

If the eval set ever outgrows broadcast range, swap the broadcast join
for a shuffled left-semi on the gram string — same semantics, one
shuffle of train gram/doc_id pairs (still no payload bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Tokenization shared by both sides (and mirrored in oracle SQL):
# lowercase, split on non-alphanumeric runs, drop empties.
_TOKENIZE = "filter(split(lower({col}), '[^a-z0-9]+'), x -> x != '')"


def _grams_expr(col: str, n: int) -> F.Column:
    """Array of word n-grams of ``col`` (space-joined), as a column
    expression — empty array when the doc has fewer than n tokens."""
    toks = _TOKENIZE.format(col=col)
    # NB: Spark's sequence(1, stop) with stop < 1 DESCENDS (1, 0, ...),
    # it does not produce an empty array — short docs need the guard.
    return F.expr(
        f"CASE WHEN size({toks}) < {n} THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> array_join(slice({toks}, i, {n}), ' ')) END"
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.1,
) -> DataFrame:
    """Per-train-doc contamination stats against ``eval_df``.

    Returns (id_col, matched_ngrams, total_ngrams, contamination,
    contaminated) — one row per train doc, where ``matched_ngrams``
    counts the doc's *unique* n-grams that occur anywhere in the eval
    set, ``contamination`` is the matched fraction (0.0 when the doc
    has no n-grams), and ``contaminated`` flags
    ``contamination >= threshold``.
    """
    eval_grams = (
        eval_df.select(F.explode(_grams_expr(text_col, n)).alias("g"))
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(_grams_expr(text_col, n))).alias("g"),
    )
    # Broadcast the (small) eval gram set; count matches map-side.
    matched = (
        train_grams.join(F.broadcast(eval_grams), "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("matched_ngrams"))
    )
    totals = train.select(
        F.col(id_col),
        F.size(F.array_distinct(_grams_expr(text_col, n))).cast("bigint").alias(
            "total_ngrams"
        ),
    )
    ratio = F.when(
        F.col("total_ngrams") > 0,
        F.col("matched_ngrams") / F.col("total_ngrams"),
    ).otherwise(F.lit(0.0))
    return (
        totals.join(matched, id_col, "left")
        .withColumn(
            "matched_ngrams", F.coalesce("matched_ngrams", F.lit(0)).cast("bigint")
        )
        .withColumn("contamination", ratio)
        .withColumn("contaminated", F.col("contamination") >= F.lit(threshold))
        .select(
            id_col, "matched_ngrams", "total_ngrams", "contamination", "contaminated"
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.1,
) -> DataFrame:
    """Filter: the train rows whose contamination is below
    ``threshold`` — the actual removal step. Anti-join of the full
    train relation against the CONTAMINATED id set (the small side by
    construction — contamination is the rare case), so every train
    column passes through untouched and the broadcast never carries
    ~the whole corpus' ids."""
    dirty_ids = ngram_contamination(
        train, eval_df, text_col, id_col, n, threshold
    ).filter(F.col("contaminated")).select(id_col)
    return train.join(F.broadcast(dirty_ids), id_col, "left_anti")


def oracle_sql_contamination(
    eval_pred: str, n: int = 5, threshold: float = 0.1
) -> str:
    """DuckDB oracle for :func:`ngram_contamination` over the
    ``documents`` view with eval set = rows matching ``eval_pred``
    (train = the complement). Tokenization mirrors _TOKENIZE."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + {n - 1}), ' ') AS g
  FROM tok,
       LATERAL UNNEST(generate_series(1, greatest(len(w) - {n - 1}, 0))) AS u(i)
),
ev AS (
  SELECT DISTINCT g FROM grams WHERE {eval_pred}
),
tr AS (
  SELECT DISTINCT doc_id, g FROM grams WHERE NOT ({eval_pred})
),
matched AS (
  SELECT doc_id, count(*) AS matched_ngrams
  FROM tr SEMI JOIN ev USING (g)
  GROUP BY doc_id
),
gram_counts AS (
  SELECT doc_id, count(*) AS total_ngrams FROM tr GROUP BY doc_id
),
-- anchor on ALL train docs (tok), not on tr: a doc with fewer than n
-- tokens has zero grams and must still emit a (0, 0, 0.0) row, as the
-- Spark side does via size(array_distinct(...)) = 0
base AS (
  SELECT k.doc_id,
         CAST(coalesce(m.matched_ngrams, 0) AS BIGINT) AS matched_ngrams,
         CAST(coalesce(gc.total_ngrams, 0) AS BIGINT) AS total_ngrams
  FROM (SELECT doc_id FROM tok WHERE NOT ({eval_pred})) k
  LEFT JOIN gram_counts gc USING (doc_id)
  LEFT JOIN matched m USING (doc_id)
)
SELECT doc_id, matched_ngrams, total_ngrams,
       CASE WHEN total_ngrams > 0
            THEN matched_ngrams / CAST(total_ngrams AS DOUBLE)
            ELSE 0.0 END AS contamination,
       (CASE WHEN total_ngrams > 0
             THEN matched_ngrams / CAST(total_ngrams AS DOUBLE)
             ELSE 0.0 END) >= {threshold} AS contaminated
FROM base
ORDER BY doc_id
"""
