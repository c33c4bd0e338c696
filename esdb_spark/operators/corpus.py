"""Corpus-level cleaning operators: line-level boilerplate removal,
cross-corpus incremental dedup, vocabulary building, and an n-gram
language-model quality score.

North-star LLM-pipeline operators (SURVEY §2.7) with no reference
analog — they run between raw ingestion and dedup/packing in a
training-data pipeline. All are DataFrame→DataFrame compositions of
built-in functions: no Python in the hot path, every shuffle carries
hashes or counts rather than full text except where the rewritten text
itself is the output.

- :func:`strip_boilerplate` — CCNet-style removal of lines repeated
  across many documents (navigation bars, cookie banners, footers).
- :func:`dedup_against` — drop documents whose exact content already
  exists in a reference corpus (incremental crawl dedup): the
  cross-corpus face of :func:`esdb_spark.operators.dedup.dedup_exact`.
- :func:`corpus_vocab` — corpus-wide token vocabulary with term and
  document frequencies (tokenizer-training / stopword-mining input).
- :func:`corpus_token_divergence` — one-row corpus-vs-corpus
  token-distribution report (vocab Jaccard, tf cosine) for mixture
  planning and crawl validation.
- :func:`duplicate_ngram_spans` — exact duplicated-substring spans
  (token-level, merged islands): the worklist for substring-level
  dedup à la Lee et al. 2021.
- :func:`remove_spans` — cut those spans back out of the text (the
  rewriter half of substring-level dedup).
- :func:`char_bigram_lm_score` — self-trained character-bigram
  language-model log-probability per document, the dependency-free
  stand-in for the KenLM perplexity filter used by CCNet-style
  pipelines: gibberish and boilerplate-ish texts score low.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from esdb_spark.functions import tokens


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    min_line_chars: int = 8,
) -> DataFrame:
    """Remove lines that recur across ``min_docs`` or more documents.

    A line is a ``\\n``-separated segment; candidate lines (trimmed
    length ≥ ``min_line_chars``) whose trimmed text appears in at least
    ``min_docs`` distinct documents are dropped from every document.
    Short lines never count and are never dropped (blank separators and
    one-word lines stay). Returns ``(id_col, clean_text, n_removed)``
    with surviving lines rejoined in original order; a document whose
    every line was boilerplate yields an empty string, not a lost row.

    Scale: the frequency pass groups by the **md5 of the trimmed
    line** — the shuffle carries 16-byte hashes + ids, never text —
    and `countDistinct` is a standard two-stage partial aggregate. The
    boilerplate set (lines recurring in ≥ min_docs docs) is, by
    construction, at most |corpus lines| / min_docs keys and in
    practice tiny (navigation chrome), so the anti-join is
    broadcast-able and AQE picks that at runtime. The only shuffle that
    carries text is the per-document reassembly groupBy — linear in
    corpus size and unavoidable: the rewritten text is the output.
    """
    lid = F.col(id_col)
    lines = df.select(
        lid.alias("_sb_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "_sb_pos", "_sb_line"
        ),
    )
    line_h = F.md5(F.trim(F.col("_sb_line")))
    boiler = (
        lines.filter(F.length(F.trim(F.col("_sb_line"))) >= min_line_chars)
        .groupBy(line_h.alias("_sb_h"))
        .agg(F.countDistinct("_sb_id").alias("_sb_df"))
        .filter(F.col("_sb_df") >= min_docs)
        .select("_sb_h")
    )
    kept = lines.join(
        boiler, line_h == boiler["_sb_h"], "left_anti"
    )
    reassembled = kept.groupBy("_sb_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_sb_pos", "_sb_line"))
                ),
                lambda s: s["_sb_line"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("_sb_kept"),
    )
    totals = df.select(
        lid.alias(id_col),
        F.size(F.split(F.col(text_col), "\n", -1)).alias("_sb_total"),
    )
    return (
        totals.join(
            reassembled, totals[id_col] == reassembled["_sb_id"], "left"
        )
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (
                F.col("_sb_total") - F.coalesce(F.col("_sb_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


def dedup_against(
    df: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop rows of ``df`` whose exact ``text_col`` content already
    exists in ``seen`` — incremental dedup of a new crawl against an
    existing corpus.

    Matching is by md5 content fingerprint (same convention as
    ``dedup_exact``: 128 bits, collisions ignorable at any corpus
    size), so the join shuffles 16-byte hashes, never document bodies.
    The seen side reduces to ``distinct`` fingerprints before the
    anti-join; when the reference corpus is small (or its fingerprint
    set is, after AQE sees the distinct), the join broadcasts. At 100
    TB-vs-100 TB both sides hash-partition on the fingerprint — the
    minimal possible shuffle for exact cross-corpus membership.
    """
    fp = F.md5(F.col(text_col))
    seen_fp = seen.select(F.md5(F.col(text_col)).alias("_da_fp")).distinct()
    return df.join(seen_fp, fp == seen_fp["_da_fp"], "left_anti")


def corpus_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 1000,
) -> DataFrame:
    """Corpus-wide token vocabulary: the ``top_n`` tokens by term
    frequency with term + document frequencies and a dense 1-based
    rank (ties broken by token string — fully deterministic).

    The raw material for tokenizer training, stopword mining, and
    frequency-based filtering. Tokenization is the engine-wide
    :func:`esdb_spark.functions.tokens` convention (lowercased
    whitespace tokens).

    Scale: one explode + one two-stage aggregate. ``countDistinct``
    expands to a partial-then-final plan on (token, id) — the shuffle
    carries tokens and ids, never text. The final top-N is a
    TakeOrderedAndProject (per-partition heaps, no global sort) and the
    rank window runs over ≤ ``top_n`` already-collected rows.
    """
    ex = df.select(
        F.col(id_col).alias("_cv_id"),
        F.explode(tokens(text_col)).alias("token"),
    )
    counted = (
        ex.groupBy("token")
        .agg(
            F.count("*").alias("term_freq"),
            F.countDistinct("_cv_id").alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), F.asc("token"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("term_freq"), F.asc("token"))
    return counted.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_col: str = "token",
) -> DataFrame:
    """Per-document tokenizer-vocabulary coverage report: how much of
    each document a fixed vocabulary explains — the go/no-go check
    before committing a tokenizer (or a stopword list, or a keep-list
    filter) to a 100 TB pretraining run. A corpus whose OOV mass
    jumped between releases is a different corpus.

    Output: ``(id_col, n_tokens, n_oov, n_distinct_oov, oov_rate)``
    per document (token-less documents report 0 tokens, 0 OOV, NULL
    rate — ``try_divide``, the degenerate-input-is-the-report rule).
    Counts are integers and the rate one IEEE division, so catalog
    rows carry full value-hash oracles.

    Scale posture: one explode keyed by doc id; the vocabulary joins
    as a broadcast-sized (|vocab|-row) left-semi lookup — tokens and
    ids shuffle, never text, and the vocabulary is by definition the
    small side (a tokenizer vocab is ≤ a few hundred k rows whatever
    the corpus size). Use ``corpus_vocab(...).select("token")`` to
    audit a candidate frequency-derived vocabulary against its own
    corpus, or a literal frame for a fixed tokenizer.
    """
    # normalize the vocab side the same way tokens() normalizes the
    # corpus side (lowercase, trimmed) — a literal vocab row 'The' or
    # 'the ' would otherwise never match anything and silently inflate
    # the OOV rate on a go/no-go gate (review finding; the
    # search._normalize_terms convention)
    v = (
        vocab.select(
            F.lower(F.trim(F.col(vocab_col))).alias("_vc_tok")
        )
        .filter(F.col("_vc_tok") != "")
        .distinct()
    )
    ex = df.select(
        F.col(id_col).alias("_vc_id"),
        F.explode_outer(tokens(text_col)).alias("_vc_t"),
    )
    tagged = ex.join(
        F.broadcast(v), F.col("_vc_t") == F.col("_vc_tok"), "left"
    )
    # a token-less document survives explode_outer as one NULL-token
    # row — it must report 0 tokens AND 0 OOV, so the OOV predicate
    # requires a real token that failed the lookup
    oov = F.col("_vc_tok").isNull() & F.col("_vc_t").isNotNull()
    agg = tagged.groupBy("_vc_id").agg(
        F.count("_vc_t").cast("long").alias("n_tokens"),
        F.count(F.when(oov, F.lit(1))).cast("long").alias("n_oov"),
        F.count_distinct(
            F.when(oov, F.col("_vc_t"))
        ).cast("long").alias("n_distinct_oov"),
    )
    return agg.select(
        F.col("_vc_id").alias(id_col),
        "n_tokens",
        "n_oov",
        "n_distinct_oov",
        F.try_divide(
            F.col("n_oov").cast("double"), F.col("n_tokens").cast("double")
        ).alias("oov_rate"),
    )


def dedup_lines_global(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide exact LINE dedup, C4-style: every line that occurs
    more than once across the whole corpus keeps only its FIRST
    occurrence (smallest doc id, then smallest line position) and is
    cut everywhere else — the classic boilerplate/chrome remover for
    crawl corpora, complementary to :func:`strip_boilerplate` (which
    thresholds on per-source frequency rather than deduping globally).

    Lines shorter than ``min_chars`` are exempt (always kept):
    deduplicating empty lines or bare punctuation would mangle
    document structure for no dedup value — the C4 heuristic.

    Output: ``(id_col, text, n_lines, n_lines_removed)`` with the
    surviving lines rejoined in original order (a doc whose every
    line was cut keeps an empty text). Deterministic, string-exact,
    integer counts → full value-hash oracle.

    Scale posture: the first occurrence per line is a ``min(struct(
    doc, pos))`` HASH AGGREGATION keyed on the line value — map-side
    combined, so the corpus-wide footer (the operator's own target,
    and the classic skew key) collapses to one row per input partition
    before anything shuffles. A window partitioned by line would
    instead sort that footer's entire corpus-wide partition in ONE
    task (AQE skew-splits joins, not windows) — the review finding
    this shape replaces. The keep flags join back on the line value
    (AQE-skew-splittable; exact string equality, no hash-collision
    risk); min_chars-exempt lines BYPASS both the aggregate and the
    join entirely — they are always kept, and empty lines are the
    single most common line value in a crawl corpus, i.e. the
    dominant skew key, so routing them around the value-keyed join
    (filter + union, round-8 fix) keeps that key off the wire
    instead of leaning on AQE to split it. The reassembly shuffles by
    doc id. Line text rides the shuffles — the operator's irreducible
    payload.
    """
    lines = df.select(
        F.col(id_col).alias("_dl_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("_dl_pos", "_dl_line"),
    )
    exempt = F.length("_dl_line") < min_chars
    nonexempt = lines.filter(~exempt)
    firsts = nonexempt.groupBy("_dl_line").agg(
        F.min(
            F.struct(
                F.col("_dl_id").alias("id"), F.col("_dl_pos").alias("pos")
            )
        ).alias("_dl_first")
    )
    flagged = (
        nonexempt.join(firsts, "_dl_line", "left")
        .select(
            "_dl_id",
            "_dl_pos",
            "_dl_line",
            (
                F.struct(
                    F.col("_dl_id").alias("id"),
                    F.col("_dl_pos").alias("pos"),
                )
                == F.col("_dl_first")
            ).alias("_dl_keep"),
        )
        .unionByName(
            lines.filter(exempt).select(
                "_dl_id", "_dl_pos", "_dl_line",
                F.lit(True).alias("_dl_keep"),
            )
        )
    )
    return (
        flagged.groupBy("_dl_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum((~F.col("_dl_keep")).cast("long")).alias(
                "n_lines_removed"
            ),
            F.concat_ws(
                "\n",
                F.transform(
                    # collect_list already skips the NULLs the un-kept
                    # lines' CASE produces; sort restores line order
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("_dl_keep"),
                                F.struct(
                                    F.col("_dl_pos").alias("pos"),
                                    F.col("_dl_line").alias("line"),
                                ),
                            )
                        )
                    ),
                    lambda x: x["line"],
                ),
            ).alias(text_col),
        )
        .select(
            F.col("_dl_id").alias(id_col), text_col, "n_lines",
            "n_lines_removed",
        )
    )


def duplicate_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-substring detection (the token-level face of
    Lee et al. 2021's "Deduplicating Training Data Makes Language
    Models Better"): find, per document, the maximal token spans
    covered by an ``n``-token sequence that occurs at least
    ``min_count`` times corpus-wide (cross- or within-document).

    Returns ``(id_col, span_start, span_end, n_grams)`` with 0-based
    inclusive token indices — the "cut these spans" worklist a
    downstream rewriter consumes. Overlapping and adjacent duplicated
    n-grams merge into one span (gaps-and-islands over start
    positions: a break happens when the next start exceeds the
    previous start + n, i.e. coverage is no longer contiguous).

    Scale: per-position n-grams are built as posexplode + ``lead``
    windows over one (id, position) partitioning and hashed with md5 —
    engine-independent (oracle-checkable) and whole-stage-codegen'd.
    (The first formulation — ``transform`` over ``sequence`` with a
    ``slice``+``concat_ws`` lambda — is interpreted per element, the
    same trap winnow_fingerprints documents; the window rewrite took
    100k docs from 14 s to ~4 s for identical output. A polynomial
    rolling hash in ``mapInPandas`` would cut the remaining O(n) per
    position to O(1) at the cost of oracle portability.) The frequency
    pass is a ``count(*)`` window over the 128-bit hash: ONE shuffle of
    (id, position, hash) rows — hashes, never text — and the gram
    build executes exactly once.  (The previous groupBy-then-self-join
    formulation planned the posexplode + lead stage TWICE — once for
    the frequency aggregate, once for the membership probe — which the
    round-5 100x probe flagged; the window rewrite halved the gram
    passes for identical output: 2.0 s → 1.2 s at sf0.1.)  Trade-off:
    a pathologically hot n-gram lands all its positions in one window
    partition, where the count-only window buffers them in a spilling
    sorter — degraded, not OOM; the old join shape had the same skew
    on its shuffle unless AQE broadcast the duplicate set.  The island
    merge is one window per document — partitioned by doc, never
    global.
    """
    toked = df.select(
        F.col(id_col).alias("_dg_id"),
        F.posexplode(tokens(text_col)).alias("pos", "_dg_tok"),
    )
    wseq = Window.partitionBy("_dg_id").orderBy("pos")
    parts = [F.col("_dg_tok")] + [
        F.lead("_dg_tok", j).over(wseq) for j in range(1, n)
    ]
    # a position has a full n-gram exactly when its farthest lead
    # exists — cheaper than a second count(*)-over-partition window
    # (which buffers the whole partition per row on top of the lead)
    grams = toked.select(
        "_dg_id",
        "pos",
        F.md5(F.concat_ws(" ", *parts)).alias("gh"),
        parts[-1].isNotNull().alias("_dg_full"),
    ).filter(F.col("_dg_full")).select("_dg_id", "pos", "gh")
    dup_pos = (
        grams.withColumn(
            "_dg_c", F.count("*").over(Window.partitionBy("gh"))
        )
        .filter(F.col("_dg_c") >= min_count)
        .select("_dg_id", "pos")
    )
    w = Window.partitionBy("_dg_id").orderBy("pos")
    marked = dup_pos.withColumn(
        "_dg_brk",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + n),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_dg_island",
        F.sum("_dg_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        marked.groupBy("_dg_id", "_dg_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + n - 1).cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_grams"),
        )
        .select(
            F.col("_dg_id").alias(id_col),
            "span_start",
            "span_end",
            "n_grams",
        )
    )


def corpus_token_divergence(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """One-row corpus-vs-corpus token-distribution report: vocabulary
    sizes, shared-vocabulary Jaccard, and cosine similarity of the raw
    term-frequency vectors — the quick "how different are these two
    datasets" answer before mixing sources or validating a new crawl.

    Scale: each side reduces to its (token, count) frequency table —
    two-stage partial aggregates, shuffle = |vocabulary| rows of
    (token, long) — and the full-outer join runs on those reduced
    tables, never on documents. The final aggregate is a single row.
    Cosine uses raw counts (not normalized tf) so the score is exact
    integer arithmetic until the final division; rounded to 6 decimals
    for cross-engine comparability.
    """
    def freqs(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(text_col)).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias(name))
        )

    joined = freqs(a, "ca").join(freqs(b, "cb"), "token", "full_outer")
    ca = F.coalesce(F.col("ca"), F.lit(0))
    cb = F.coalesce(F.col("cb"), F.lit(0))
    return joined.agg(
        F.sum((ca > 0).cast("long")).alias("vocab_a"),
        F.sum((cb > 0).cast("long")).alias("vocab_b"),
        F.sum(((ca > 0) & (cb > 0)).cast("long")).alias("vocab_common"),
        F.count("*").alias("_union"),
        F.sum(ca * cb).alias("_dot"),
        F.sum(ca * ca).alias("_na"),
        F.sum(cb * cb).alias("_nb"),
    ).select(
        "vocab_a",
        "vocab_b",
        "vocab_common",
        F.round(F.col("vocab_common") / F.col("_union"), 6).alias(
            "vocab_jaccard"
        ),
        F.round(
            F.col("_dot")
            / (F.sqrt(F.col("_na")) * F.sqrt(F.col("_nb"))),
            6,
        ).alias("tf_cosine"),
    )


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rewrite each document with the given token spans cut out — the
    second half of substring-level dedup (:func:`duplicate_ngram_spans`
    produces the spans; this consumes them).

    ``spans`` carries ``(id_col, span_start, span_end)`` with 0-based
    inclusive token indices over the engine-wide tokenization
    (:func:`esdb_spark.functions.tokens`). Output is
    ``(id_col, clean_text, n_tokens_removed)`` where ``clean_text`` is
    the surviving tokens joined by single spaces (whitespace is
    normalized by construction — tokenization already collapsed it).
    Documents with no spans pass through with their normalized text.

    Scale: the span list collapses to ONE sorted array per document
    (a per-doc groupBy over the already-small span frame — only
    documents that contain duplicated spans appear), then attaches to
    the corpus via a single **equi left join on the document id**; at
    scale the span side is a small fraction of the corpus, so AQE
    broadcasts it and the corpus never shuffles at all. The cut itself
    is pure array arithmetic — ``aggregate`` walks the ≤ spans-per-doc
    entries accumulating `slice`s of the token array between spans —
    so no posexplode, no non-equi anti-join (whose sort-merge buffer
    compares every token position against every span of its document:
    O(tokens × spans/doc), the superlinear term the round-5 100× probe
    measured at 5.6× vs detection's 4.2×), and no per-document
    reassembly shuffle. The only corpus-sized movement left is the
    output itself. The lambda runs interpreted, but over |spans(doc)|
    elements per row, not per token.
    """
    toked = df.select(
        F.col(id_col).alias("_rs_id"), tokens(text_col).alias("_rs_toks")
    )
    # (id, sorted non-overlapping-ish span array); sort_array on the
    # (start, end) struct orders by start then end, and the cursor
    # below clamps, so overlapping or adjacent caller spans still cut
    # correctly
    sp = (
        spans.select(
            F.col(id_col).alias("_rs_id"),
            F.struct(
                F.col("span_start").cast("long").alias("a"),
                F.col("span_end").cast("long").alias("b"),
            ).alias("_rs_sp"),
        )
        .groupBy("_rs_id")
        .agg(F.sort_array(F.collect_list("_rs_sp")).alias("_rs_sps"))
    )
    joined = toked.join(sp, "_rs_id", "left")
    toks = F.col("_rs_toks")
    nt = F.size(toks).cast("long")
    # walk the spans left→right keeping the gaps: acc = (cursor = next
    # unconsumed 0-based position, segs = kept slices so far); clamp
    # the cursor so malformed/overlapping spans can't produce a
    # negative slice length
    acc_t = "struct<cur:bigint,segs:array<array<string>>>"
    kept = F.aggregate(
        F.coalesce(F.col("_rs_sps"), F.array().cast(
            "array<struct<a:bigint,b:bigint>>"
        )),
        F.struct(
            F.lit(0).cast("long").alias("cur"),
            F.array().cast("array<array<string>>").alias("segs"),
        ),
        lambda acc, s: F.struct(
            F.greatest(acc["cur"], s["b"] + 1).alias("cur"),
            F.when(
                s["a"] > acc["cur"],
                F.concat(
                    acc["segs"],
                    F.array(
                        F.slice(toks, acc["cur"] + 1, s["a"] - acc["cur"])
                    ),
                ),
            ).otherwise(acc["segs"]).alias("segs"),
        ).cast(acc_t),
        lambda acc: F.flatten(
            F.when(
                nt > acc["cur"],
                F.concat(
                    acc["segs"],
                    F.array(F.slice(toks, acc["cur"] + 1, nt - acc["cur"])),
                ),
            ).otherwise(acc["segs"])
        ),
    )
    return joined.select(
        F.col("_rs_id").alias(id_col),
        F.concat_ws(" ", kept).alias("clean_text"),
        (nt - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )


def char_bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean log-probability per character transition under a
    character-bigram model trained on the corpus itself (add-one
    smoothed) — a deterministic, dependency-free perplexity proxy in
    the spirit of CCNet's KenLM filter. Natural-language text scores
    near the corpus average; repetitive or out-of-distribution strings
    score low.

    Model: ``P(c2 | c1) = (count(c1c2) + 1) / (count(c1·) + V)`` over
    the lowercased text, where ``V`` is the number of distinct
    characters observed in second position corpus-wide. Score =
    ``avg(ln P)`` over a document's bigrams, rounded to 6 decimals;
    documents shorter than two characters score 0.

    Scale: the model is an aggregate over exploded bigrams — the
    shuffle carries 2-char strings — and is at most |charset|² rows
    (a few KB), so the score pass joins it **broadcast**: scoring is a
    scan + broadcast-hash-join + per-doc average, no repartition of
    the corpus. Training on a hash-sample instead of the full corpus
    is a one-line change (`hash_sample`) when even the bigram explode
    is worth skipping at 100 TB.

    EAGER at call time: the (tiny) bigram-count table is
    localCheckpoint-ed immediately so the corpus-wide explode runs
    once, not once per model branch.

    Returns ``(id_col, lm_score)``.
    """
    lowered = F.lower(F.col(text_col))
    # Overlapping bigrams in ONE codegen'd regex pass: the zero-width
    # lookahead `(?=(..))` captures two chars at every position without
    # consuming them (Java's find() then advances one char), and `(?s)`
    # lets `.` cross newlines so every adjacent char pair counts —
    # exactly the substring(i, 2) enumeration, without the interpreted
    # per-position `transform` lambda (measured 79 s → ~8 s on 100k
    # ~800-char docs for identical output). Sub-2-char docs yield an
    # empty array, so no length guard is needed.
    bigrams = F.regexp_extract_all(lowered, F.lit("(?s)(?=(..))"), 1)
    ex = df.select(
        F.col(id_col).alias("_lm_id"), F.explode(bigrams).alias("bg")
    )
    # bg_counts feeds THREE model branches (itself, prefix_counts,
    # vocab_n); without materialization each branch re-executes the
    # corpus-wide bigram explode. The table is at most |charset|² rows
    # (a few KB) — localCheckpoint it EAGERLY: the model branches then
    # read a lineage-free leaf (one corpus explode total), and unlike
    # persist() nothing enters the session cache manager, whose
    # plan-canonicalization against the deep pipeline lineage blew the
    # driver heap when this op ran mid-pipeline.
    bg_counts = (
        ex.groupBy("bg").agg(F.count("*").alias("c")).localCheckpoint()
    )
    prefix_counts = bg_counts.groupBy(
        F.substring("bg", 1, 1).alias("p")
    ).agg(F.sum("c").alias("cp"))
    vocab_n = bg_counts.select(
        F.countDistinct(F.substring("bg", 2, 1)).alias("nv")
    )
    model = (
        bg_counts.join(
            F.broadcast(prefix_counts),
            F.substring(bg_counts["bg"], 1, 1) == prefix_counts["p"],
        )
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "bg",
            F.log(
                (F.col("c") + F.lit(1.0))
                / (F.col("cp") + F.col("nv"))
            ).alias("lp"),
        )
    )
    scored = (
        ex.join(F.broadcast(model), "bg")
        .groupBy("_lm_id")
        .agg(F.avg("lp").alias("_lm_avg"))
    )
    return df.select(F.col(id_col)).join(
        scored, F.col(id_col) == scored["_lm_id"], "left"
    ).select(
        id_col,
        F.round(F.coalesce(F.col("_lm_avg"), F.lit(0.0)), 6).alias(
            "lm_score"
        ),
    )


def source_overlap_matrix(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix: for every source pair
    (a ≤ b), how many DISTINCT content fingerprints appear in both —
    the corpus-diagnostics view that tells you which feeds are
    re-crawls of each other before you weight or dedup them (the
    diagonal counts each source's own distinct contents).

    Scale: shuffles only (md5, source) pairs, deduplicated FIRST
    (one partial-aggregated distinct), so the self-join runs on
    fingerprint-per-source rows, never documents; join key is the
    16-byte fingerprint; output is |sources|² rows — metadata."""
    fp = (
        df.select(
            F.md5(F.col(text_col)).alias("_fp"),
            F.col(source_col).alias("_src"),
        )
        .filter(F.col("_fp").isNotNull())
        .distinct()
    )
    a = fp.select(F.col("_fp"), F.col("_src").alias("source_a"))
    b = fp.select(F.col("_fp").alias("_fp_b"), F.col("_src").alias("source_b"))
    return (
        a.join(
            b,
            (a["_fp"] == b["_fp_b"])
            & (a["source_a"] <= b["source_b"]),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
