"""End-to-end corpus pipelines: the north-star operators composed the
way a training-data team would actually run them.

``build_pretraining_corpus`` is the canonical chain:

    [boilerplate strip] → quality filter → [LM-score filter] →
    exact dedup → near dedup (MinHash-LSH) → [duplicated-span
    removal] → benchmark decontamination → deterministic split →
    epoch shuffle → sequence packing

(bracketed stages are opt-in via their parameters)

Every stage is one of the engine's tested operators; this module adds
only the composition and a row-accounting audit (how many documents
each stage removed — the number every data report leads with). All
stages are deterministic, so the same inputs always produce the same
corpus — reruns are byte-stable and auditable.

Scale notes: the chain is a single lazy DataFrame plan up to the audit
counts; nothing collects to the driver except the per-stage counts
(one long each). The stages that persist internally (minhash
signatures) document that posture themselves.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F


class CorpusResult(NamedTuple):
    """The packed corpus plus the per-stage row accounting."""

    corpus: DataFrame  # doc_id, text, split, shuffle_key, shard, bin, offset
    audit: dict[str, int]  # stage name -> rows surviving after the stage


def build_pretraining_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    boilerplate_min_docs: int | None = None,
    min_lm_score: float | None = None,
    dup_span_n: int | None = None,
    near_dup_threshold: float = 0.8,
    contamination_n: int = 5,
    contamination_threshold: float = 0.1,
    splits: dict[str, float] | None = None,
    shuffle_seed: int = 0,
    pack_budget: int = 2048,
    pack_shards: int = 32,
    bpe_merges: int | list | None = None,
) -> CorpusResult:
    """Run the full cleaning + assembly chain over ``docs``.

    ``eval_docs`` is the benchmark set to decontaminate against (skip
    the stage when None). Returns the packed corpus and an audit dict;
    the audit runs one count per stage (actions, deliberately eager —
    this is a batch job whose report IS the product).

    Opt-in cleaning stages (None = skipped): ``boilerplate_min_docs``
    strips lines recurring in that many documents before anything else
    (chrome would otherwise depress quality scores and inflate near-dup
    estimates); ``min_lm_score`` drops documents under that char-bigram
    LM log-probability (corpus-relative — calibrate on a sample);
    ``dup_span_n`` removes exact duplicated token spans of that n-gram
    order after document-level dedup (span removal changes text, so it
    runs after content-hash stages, before decontamination).

    ``bpe_merges`` sizes documents for packing by REAL tokenizer
    token counts instead of the whitespace estimate: an int trains
    that many BPE merges on the cleaned corpus (operators/bpe.py —
    bounded word-frequency fit), a list reuses pre-trained merges
    (train once, reuse across corpus shards/epochs).
    """
    from esdb_spark.functions import hash_split, shuffle_key
    from esdb_spark.operators.decontam import decontaminate
    from esdb_spark.operators.dedup import dedup_exact, dedup_minhash_lsh
    from esdb_spark.operators.packing import pack_greedy
    from esdb_spark.operators.text import with_quality

    audit: dict[str, int] = {"input": docs.count()}
    # Each audit count is an action; without a persist per stage every
    # count would re-execute the whole upstream chain (quality scoring,
    # dedup shuffles, the LSH self-join) — ~6x the necessary compute.
    # Persist each surviving set (MEMORY_AND_DISK: spills, never OOMs)
    # and release its predecessor once the next stage is materialized.
    prev = None

    def materialize(df: DataFrame) -> DataFrame:
        nonlocal prev
        df = df.persist()
        df.count()
        if prev is not None:
            prev.unpersist()
        prev = df
        return df

    current = docs
    if boilerplate_min_docs is not None:
        from esdb_spark.operators.corpus import strip_boilerplate

        cleaned = strip_boilerplate(
            current, text_col, id_col, min_docs=boilerplate_min_docs
        )
        others = [c for c in current.columns if c != text_col]
        current = materialize(
            current.select(*others)
            .join(cleaned.select(id_col, "clean_text"), id_col)
            .withColumnRenamed("clean_text", text_col)
            .select(*current.columns)
        )
        audit["boilerplate_strip"] = current.count()

    scored = with_quality(current, text_col)
    kept = materialize(
        scored.filter(F.col("quality_score") >= min_quality).select(
            *current.columns
        )
    )
    audit["quality_filter"] = kept.count()

    if min_lm_score is not None:
        from esdb_spark.operators.corpus import char_bigram_lm_score

        lm = char_bigram_lm_score(kept, text_col, id_col)
        kept = materialize(
            kept.join(
                lm.filter(F.col("lm_score") >= min_lm_score).select(id_col),
                id_col,
            ).select(*kept.columns)
        )
        audit["lm_filter"] = kept.count()

    kept = materialize(dedup_exact(kept, [text_col], order_col=id_col))
    audit["exact_dedup"] = kept.count()

    kept = materialize(
        dedup_minhash_lsh(kept, text_col, id_col, threshold=near_dup_threshold)
    )
    audit["near_dedup"] = kept.count()

    if dup_span_n is not None:
        from esdb_spark.operators.corpus import (
            duplicate_ngram_spans,
            remove_spans,
        )

        spans = duplicate_ngram_spans(kept, text_col, id_col, n=dup_span_n)
        rewritten = remove_spans(kept, spans, text_col, id_col)
        others = [c for c in kept.columns if c != text_col]
        kept = materialize(
            kept.select(*others)
            .join(rewritten.select(id_col, "clean_text"), id_col)
            .withColumnRenamed("clean_text", text_col)
            .select(*kept.columns)
        )
        # row count is unchanged by span removal; report tokens cut so
        # the audit still shows the stage did something
        audit["span_removal_docs"] = kept.count()

    if eval_docs is not None:
        kept = materialize(
            decontaminate(
                kept,
                eval_docs,
                text_col,
                id_col,
                n=contamination_n,
                threshold=contamination_threshold,
            )
        )
        audit["decontaminated"] = kept.count()

    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    kept = kept.withColumn("split", hash_split(F.col(id_col), splits))
    kept = kept.withColumn(
        "shuffle_key", shuffle_key(F.col(id_col), shuffle_seed)
    )

    if bpe_merges is not None:
        from esdb_spark.operators.bpe import bpe_encode, train_bpe

        merges = (
            train_bpe(kept, text_col, num_merges=bpe_merges)
            if isinstance(bpe_merges, int)
            else bpe_merges
        )
        audit["bpe_merges"] = len(merges)
        sized = bpe_encode(kept, merges, text_col).withColumn(
            "_n_tokens", F.size("bpe_tokens")
        ).drop("bpe_tokens")
    else:
        sized = kept.withColumn(
            "_n_tokens",
            F.size(
                F.expr(f"filter(split({text_col}, '\\\\s+'), x -> x != '')")
            ),
        )
    assignment = pack_greedy(
        sized, id_col, "_n_tokens", budget=pack_budget, n_shards=pack_shards
    )
    # join from `sized` so the corpus carries `_n_tokens` — the
    # training sink's manifest and any loader-side budget accounting
    # need the per-doc token size the bins were packed with
    corpus = sized.join(assignment, id_col)
    # count the JOINED result, not a copy of the previous stage: if the
    # packing assignment ever failed to cover every doc, the audit must
    # show it rather than paper over it
    audit["packed"] = corpus.count()
    return CorpusResult(corpus, audit)
