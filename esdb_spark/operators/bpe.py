"""BPE tokenizer training and encoding over a corpus.

The training-data pipeline's tokenizer step (the reference engine has
no text layer at all — SURVEY.md §2.6; this extends the §2.7
training-pipeline capability set): learn byte-pair-encoding merges
from the corpus, then encode documents into subword tokens for
token-budget packing (`packing.pack_greedy`) and token-count
accounting (`text.with_token_stats`'s estimate, made exact).

Algorithm: Sennrich et al. 2016 ("Neural Machine Translation of Rare
Words with Subword Units") — words split into characters plus an
end-of-word marker; repeatedly merge the most frequent adjacent
symbol pair. Ties break lexicographically, so training is fully
deterministic.

Scale design (the k-means-centroid pattern from ``similarity.py``,
applied to tokenizer fitting):

- The corpus-sized work is ONE aggregation: :func:`word_frequencies`
  (explode → groupBy word → count, partial aggregation map-side),
  capped at the top ``max_words`` distinct words by (count, word) —
  the classic BPE trainer operates on this word-frequency table, not
  on raw text, and the table is vocabulary-sized (bounded by the cap),
  not corpus-sized.
- :func:`train_bpe` collects that bounded table and runs the merge
  loop driver-side with incremental pair-count maintenance (only
  words containing the merged pair are touched per iteration) — the
  same "fit on a bounded aggregate, never iterate the corpus" posture
  as the IVF centroid fit.
- :func:`bpe_encode` broadcasts the merge ranks once and encodes
  Arrow batch by Arrow batch with a per-batch word cache (real-world
  token frequency is Zipfian, so the cache hit rate is high); the
  corpus streams through the scan — no shuffle, no collect.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from esdb_spark.functions import tokens

END = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", max_words: int = 65536
) -> DataFrame:
    """Word-frequency table ``(word, cnt)``: lowercased whitespace
    tokens (the corpus-wide ``functions.tokens`` convention), top
    ``max_words`` by (count desc, word asc) — a deterministic cap so
    the trainer's input is bounded at any corpus size."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(max_words)
    )


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    """One left-to-right merge pass of ``pair`` in a symbol tuple."""
    out = []
    i, n = 0, len(symbols)
    a, b = pair
    while i < n:
        if i < n - 1 and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe_from_counts(
    word_counts: Iterable[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """The driver-side merge loop on an in-memory word-frequency
    table. Split out from :func:`train_bpe` so tests can cross-validate
    it against a definitional (recount-everything) implementation.

    Incremental bookkeeping: ``stats`` holds global pair counts,
    ``where`` maps each pair to the word ids containing it; a merge
    touches only those words and updates both structures by the local
    delta — O(words containing pair) per iteration instead of
    O(vocabulary)."""
    words: list[tuple] = []
    freqs: list[int] = []
    for w, c in word_counts:
        words.append(tuple(w) + (END,))
        freqs.append(int(c))

    stats: dict[tuple, int] = {}
    where: dict[tuple, set] = {}
    for wi, syms in enumerate(words):
        for p in zip(syms, syms[1:]):
            stats[p] = stats.get(p, 0) + freqs[wi]
            where.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for p, c in stats.items():
            if c <= 0:
                continue
            if best is None or c > stats[best] or (c == stats[best] and p < best):
                best = p
        if best is None:
            break
        merges.append(best)
        for wi in list(where.get(best, ())):
            old = words[wi]
            new = _merge_word(old, best)
            if new == old:
                continue
            f = freqs[wi]
            for p in zip(old, old[1:]):
                stats[p] -= f
                if stats[p] <= 0:
                    stats.pop(p, None)
                ws = where.get(p)
                if ws is not None:
                    ws.discard(wi)
            for p in zip(new, new[1:]):
                stats[p] = stats.get(p, 0) + f
                where.setdefault(p, set()).add(wi)
            words[wi] = new
        stats.pop(best, None)
        where.pop(best, None)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 65536,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. One Spark
    aggregation (vocabulary-bounded output), then a driver-side fit —
    EAGER at call time, like the IVF centroid fit."""
    wf = word_frequencies(df, text_col, max_words).collect()
    return train_bpe_from_counts(((r["word"], r["cnt"]) for r in wf), num_merges)


def encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Encode one word with trained merges: repeatedly apply the
    lowest-rank (earliest-learned) applicable merge — the standard
    (GPT-2-style) inference rule, which reproduces training order."""
    syms = tuple(word) + (END,)
    while len(syms) > 1:
        best, best_rank = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        syms = _merge_word(syms, best)
    return list(syms)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Add ``out_col: array<string>`` — the document's subword tokens
    under the trained merges. Ranks broadcast once; per-batch word
    cache exploits the Zipfian token distribution."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast({p: i for i, p in enumerate(merges)})

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        ranks = bc.value
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, enc(F.col(text_col)))


def fixed_merge_token_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\x1f",
) -> DataFrame:
    """Per-document token counts under a FIXED merge table applied in
    rank order — the Sennrich apply-in-order subword rule (each merge
    rewrites all its left-to-right non-overlapping occurrences before
    the next applies), as opposed to :func:`bpe_encode`'s GPT-2-style
    lowest-rank-first rule. With a literal merge list the whole
    segmentation is pure string arithmetic, so the row is
    ENGINE-EXACT and carries a full value-hash oracle — the portable
    twin of the corpus-trained ``bpe_token_stats`` (rows-only: its
    trainer is an iterative driver fit).

    Implementation is entirely column expressions, no UDF: every
    non-space character is wrapped in sentinel pairs
    (``x`` → ``␟x␟``), a merge (a, b) is the literal replacement
    ``␟a␟␟b␟ → ␟ab␟`` (the doubled sentinel can never span the
    whitespace between words, and symbols never contain the
    sentinel), and the token count reads off the sentinel count / 2.
    Both engines' ``replace`` rewrites left-to-right non-overlapping,
    so the outputs match byte-for-byte. ``sep`` must not occur in the
    text (0x1f, the ASCII unit separator, by default); occurrences
    raise at execution time rather than corrupt counts.

    Returns ``(id_col, n_words, n_tokens, n_chars)`` — all integers.

    Scale posture: scan-parallel per-row string rewriting (k literal
    replaces per document), one shuffle only if the caller
    aggregates; nothing collects.
    """
    for a, b in merges:
        for sym in (a, b):
            if (
                not sym
                or sep in sym
                or any(ch.isspace() for ch in sym)
                or sym != sym.lower()
            ):
                raise ValueError(
                    "fixed_merge_token_stats: merge symbols must be "
                    "non-empty, lowercase, and free of whitespace and "
                    f"the sentinel byte — got {(a, b)!r} (a bad symbol "
                    "would silently corrupt every count)"
                )
    text = F.coalesce(F.col(text_col), F.lit(""))
    guarded = F.when(
        F.contains(text, F.lit(sep)),
        F.raise_error(
            F.concat(
                F.lit(
                    "fixed_merge_token_stats: sentinel byte present in "
                    "document "
                ),
                F.col(id_col).cast("string"),
            )
        ).cast("string"),
    ).otherwise(F.lower(text))
    s = F.regexp_replace(guarded, r"(\S)", f"{sep}$1{sep}")
    for a, b in merges:
        s = F.replace(
            s, F.lit(f"{sep}{a}{sep}{sep}{b}{sep}"), F.lit(f"{sep}{a}{b}{sep}")
        )
    n_sent = F.length(s) - F.length(F.replace(s, F.lit(sep), F.lit("")))
    return df.select(
        F.col(id_col),
        F.coalesce(F.size(tokens(text_col)), F.lit(0)).cast("long").alias(
            "n_words"
        ),
        (n_sent / 2).cast("long").alias("n_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias(
            "n_chars"
        ),
    )


def bpe_token_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document exact token accounting under a trained tokenizer:
    ``(id, n_tokens, n_chars, chars_per_token)`` — the input to
    token-budget packing and corpus size estimates."""
    enc = bpe_encode(df, merges, text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size("bpe_tokens")
    return enc.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        F.round(
            n_chars / F.when(n_tokens > 0, n_tokens).otherwise(F.lit(None)), 6
        ).alias("chars_per_token"),
    )
