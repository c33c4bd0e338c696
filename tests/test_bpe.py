"""BPE trainer/encoder (operators/bpe.py).

The incremental-bookkeeping trainer is cross-validated against a
definitional recount-everything implementation (same tie-break rule,
independent code path) on random corpora; encoding is checked by the
lossless roundtrip invariant.
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from esdb_spark.operators.bpe import (
    END,
    _merge_word,
    bpe_encode,
    bpe_token_stats,
    encode_word,
    train_bpe,
    train_bpe_from_counts,
    word_frequencies,
)
from esdb_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def naive_train(word_counts, num_merges):
    """Definitional BPE: recount every pair from scratch each round."""
    words = [(tuple(w) + (END,), int(c)) for w, c in word_counts]
    merges = []
    for _ in range(num_merges):
        stats = {}
        for syms, f in words:
            for p in zip(syms, syms[1:]):
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = [(_merge_word(s, best), f) for s, f in words]
    return merges


_word = st.text(alphabet="abcde", min_size=1, max_size=6)


@given(
    st.dictionaries(_word, st.integers(1, 20), min_size=1, max_size=12),
    st.integers(0, 15),
)
@settings(max_examples=60, deadline=None)
def test_incremental_matches_definitional(counts, num_merges):
    got = train_bpe_from_counts(sorted(counts.items()), num_merges)
    want = naive_train(sorted(counts.items()), num_merges)
    assert got == want


def test_merges_stop_when_exhausted():
    merges = train_bpe_from_counts([("ab", 3)], num_merges=100)
    # "a b </w>" admits exactly 2 merges, then nothing is adjacent
    assert len(merges) == 2


@given(
    st.dictionaries(_word, st.integers(1, 20), min_size=1, max_size=12),
    st.integers(0, 15),
)
@settings(max_examples=60, deadline=None)
def test_encode_roundtrip(counts, num_merges):
    merges = train_bpe_from_counts(sorted(counts.items()), num_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in counts:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END  # lossless


def test_frequent_word_becomes_single_token():
    merges = train_bpe_from_counts([("hello", 100), ("help", 1)], 10)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("hello", ranks) == ["hello" + END]


def test_word_frequencies_cap_is_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = word_frequencies(docs, max_words=20).collect()
    b = word_frequencies(docs, max_words=20).collect()
    assert a == b
    assert len(a) == 20  # the sf0.001 vocabulary (31 words) exceeds the cap
    counts = [r["cnt"] for r in a]
    assert counts == sorted(counts, reverse=True)


def test_bpe_encode_corpus_roundtrip(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    merges = train_bpe(docs, num_merges=50)
    enc = bpe_encode(docs, merges).select("doc_id", "text", "bpe_tokens")
    for row in enc.collect():
        joined = "".join(row["bpe_tokens"])
        words = [w for w in joined.split(END) if w]
        assert words == (row["text"] or "").lower().split()


def test_more_merges_never_increase_token_count(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(30)
    m_small = train_bpe(docs, num_merges=10)
    m_large = train_bpe(docs, num_merges=80)
    assert m_large[:10] == m_small  # training order is a prefix
    small = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_stats(docs, m_small).collect()
    }
    large = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_stats(docs, m_large).collect()
    }
    assert all(large[d] <= small[d] for d in small)


def test_token_stats_shape(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(10)
    merges = train_bpe(docs, num_merges=20)
    out = bpe_token_stats(docs, merges)
    assert out.columns == ["doc_id", "n_tokens", "n_chars", "chars_per_token"]
    pdf = out.toPandas()
    assert (pdf["n_tokens"] > 0).all()
    assert (pdf["chars_per_token"] > 0).all()
