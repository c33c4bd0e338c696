"""Unit semantics for operators/corpus.py (boilerplate strip,
incremental dedup, vocabulary, char-bigram LM score). Catalog-level
oracle parity is covered by test_oracle_parity."""

import math

import pytest
from pyspark.sql import Row, functions as F

from esdb_spark.operators.corpus import (
    char_bigram_lm_score,
    corpus_vocab,
    dedup_against,
    duplicate_ngram_spans,
    remove_spans,
    strip_boilerplate,
)


@pytest.fixture(scope="module")
def docs(spark):
    header = "shared navigation header"
    footer = "copyright footer line"
    rows = [
        Row(doc_id=1, text=f"{header}\nunique first body\n{footer}"),
        Row(doc_id=2, text=f"{header}\nsecond body is different\n{footer}"),
        Row(doc_id=3, text=f"{header}\n\nshort\n{footer}"),
        Row(doc_id=4, text="no chrome at all in this one"),
    ]
    return spark.createDataFrame(rows)


def test_strip_boilerplate_removes_recurring_lines(docs):
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            docs, "text", "doc_id", min_docs=3, min_line_chars=8
        ).collect()
    }
    assert out[1]["clean_text"] == "unique first body"
    assert out[1]["n_removed"] == 2
    # blank and sub-8-char lines survive even between stripped chrome
    assert out[3]["clean_text"] == "\nshort"
    assert out[3]["n_removed"] == 2
    # untouched document passes through byte-identical
    assert out[4]["clean_text"] == "no chrome at all in this one"
    assert out[4]["n_removed"] == 0


def test_strip_boilerplate_all_lines_removed_keeps_doc(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="the only repeated line") for i in range(3)]
    )
    out = strip_boilerplate(df, "text", "doc_id", min_docs=2).collect()
    assert len(out) == 3
    assert all(r["clean_text"] == "" and r["n_removed"] == 1 for r in out)


def test_dedup_against_drops_only_seen_content(spark):
    new = spark.createDataFrame(
        [
            Row(doc_id=1, text="already crawled"),
            Row(doc_id=2, text="fresh content"),
            Row(doc_id=3, text="also fresh"),
        ]
    )
    seen = spark.createDataFrame(
        [Row(doc_id=100, text="already crawled"), Row(doc_id=101, text="x")]
    )
    kept = sorted(
        r["doc_id"] for r in dedup_against(new, seen, "text", "doc_id").collect()
    )
    assert kept == [2, 3]


def test_dedup_against_empty_seen_keeps_everything(spark):
    new = spark.createDataFrame([Row(doc_id=1, text="a")])
    seen = new.filter(F.lit(False))
    assert dedup_against(new, seen, "text", "doc_id").count() == 1


def test_corpus_vocab_counts_and_rank(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana apple"),
            Row(doc_id=2, text="banana cherry"),
        ]
    )
    rows = {
        r["token"]: r for r in corpus_vocab(df, "text", "doc_id", 10).collect()
    }
    assert rows["apple"]["term_freq"] == 2
    assert rows["apple"]["doc_freq"] == 1
    assert rows["banana"]["term_freq"] == 2
    assert rows["banana"]["doc_freq"] == 2
    assert rows["cherry"]["term_freq"] == 1
    # rank: term_freq desc, token asc → apple(1), banana(2), cherry(3)
    assert [rows[t]["rank"] for t in ("apple", "banana", "cherry")] == [1, 2, 3]


def test_corpus_vocab_top_n_cutoff_deterministic(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="b a d c")])
    got = [r["token"] for r in corpus_vocab(df, "text", "doc_id", 2).collect()]
    # all tie at term_freq=1 → token-ascending tie-break decides the cut
    assert got == ["a", "b"]


def test_duplicate_ngram_spans_cross_doc(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta unique1 tail1"),
            Row(doc_id=2, text="head2 alpha beta gamma delta unique2"),
            Row(doc_id=3, text="nothing shared here at all friend"),
        ]
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_grams"]
        for r in duplicate_ngram_spans(df, "text", "doc_id", n=4).collect()
    }
    # "alpha beta gamma delta" occurs in docs 1 (pos 0) and 2 (pos 1)
    assert spans == {(1, 0, 3): 1, (2, 1, 4): 1}


def test_duplicate_ngram_spans_merge_overlapping(spark):
    # the 5-token repeat yields two overlapping 4-gram hits per doc,
    # which must merge into ONE span covering tokens 0..4 / 1..5
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e x1 y1 z1"),
            Row(doc_id=2, text="q a b c d e x2 y2"),
        ]
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in duplicate_ngram_spans(df, "text", "doc_id", n=4).collect()
    )
    assert got == [(1, 0, 4, 2), (2, 1, 5, 2)]


def test_duplicate_ngram_spans_within_doc_repeat(spark):
    # within-document repetition counts toward min_count as well
    df = spark.createDataFrame(
        [Row(doc_id=1, text="p q r s filler1 filler2 p q r s")]
    )
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_ngram_spans(df, "text", "doc_id", n=4).collect()
    )
    assert got == [(0, 3), (6, 9)]


def test_duplicate_ngram_spans_min_count_threshold(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="m n o p tail"),
            Row(doc_id=2, text="m n o p other"),
        ]
    )
    assert (
        duplicate_ngram_spans(df, "text", "doc_id", n=4, min_count=3).count()
        == 0
    )


def test_remove_spans_cuts_and_normalizes(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="keep0   CUT cut Cut keep1 keep2"),
            Row(doc_id=2, text="all kept here"),
        ]
    )
    spans = spark.createDataFrame(
        [Row(doc_id=1, span_start=1, span_end=3)]
    )
    out = {
        r["doc_id"]: r
        for r in remove_spans(df, spans, "text", "doc_id").collect()
    }
    # tokens are the lowercased whitespace tokens; spans are inclusive
    assert out[1]["clean_text"] == "keep0 keep1 keep2"
    assert out[1]["n_tokens_removed"] == 3
    assert out[2]["clean_text"] == "all kept here"
    assert out[2]["n_tokens_removed"] == 0


def test_remove_spans_whole_doc_and_empty_doc(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="   ")]
    )
    spans = spark.createDataFrame([Row(doc_id=1, span_start=0, span_end=2)])
    out = {
        r["doc_id"]: r
        for r in remove_spans(df, spans, "text", "doc_id").collect()
    }
    assert out[1]["clean_text"] == "" and out[1]["n_tokens_removed"] == 3
    assert out[2]["clean_text"] == "" and out[2]["n_tokens_removed"] == 0


def test_remove_spans_detect_then_rewrite_roundtrip(spark):
    # end-to-end: the duplicated run disappears from both docs
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="u1 d1 d2 d3 d4 tail1"),
            Row(doc_id=2, text="head2 d1 d2 d3 d4 u2"),
        ]
    )
    spans = duplicate_ngram_spans(df, "text", "doc_id", n=4)
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_spans(df, spans, "text", "doc_id").collect()
    }
    assert out[1] == "u1 tail1"
    assert out[2] == "head2 u2"


def test_remove_spans_anti_join_is_not_nested_loop(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c d e")])
    spans = spark.createDataFrame([Row(doc_id=1, span_start=0, span_end=1)])
    plan = remove_spans(df, spans)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_char_bigram_lm_score_prefers_in_distribution_text(spark):
    corpus = [Row(doc_id=i, text="the cat sat on the mat") for i in range(9)]
    corpus.append(Row(doc_id=99, text="zq zq zq zq zq"))
    df = spark.createDataFrame(corpus)
    scores = {
        r["doc_id"]: r["lm_score"]
        for r in char_bigram_lm_score(df, "text", "doc_id").collect()
    }
    # the out-of-distribution doc scores strictly lower than the others
    assert scores[99] < scores[0]
    assert all(s < 0 for s in scores.values())  # log-probs


def test_char_bigram_lm_score_short_docs_are_zero(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="x"), Row(doc_id=2, text=""), Row(doc_id=3, text="ab")]
    )
    scores = {
        r["doc_id"]: r["lm_score"]
        for r in char_bigram_lm_score(df, "text", "doc_id").collect()
    }
    assert scores[1] == 0.0 and scores[2] == 0.0
    # "ab" is the only bigram: P = (1+1)/(1+1) = 1 → ln 1 = 0? No:
    # V counts distinct second chars (just "b") → (1+1)/(1+1)=1, ln=0.0
    assert math.isclose(scores[3], 0.0, abs_tol=1e-9)


def test_lm_model_join_is_broadcast(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="some ordinary text here") for i in range(4)]
    )
    plan = char_bigram_lm_score(df, "text", "doc_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_corpus_token_divergence_identical_and_disjoint(spark):
    from esdb_spark.operators.corpus import corpus_token_divergence

    a = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma alpha")]
    )
    same = corpus_token_divergence(a, a).collect()[0]
    assert same["vocab_a"] == same["vocab_b"] == same["vocab_common"] == 3
    assert same["vocab_jaccard"] == 1.0 and same["tf_cosine"] == 1.0

    b = spark.createDataFrame([Row(doc_id=2, text="delta epsilon")])
    disj = corpus_token_divergence(a, b).collect()[0]
    assert disj["vocab_common"] == 0
    assert disj["vocab_jaccard"] == 0.0 and disj["tf_cosine"] == 0.0


def test_corpus_token_divergence_partial_overlap(spark):
    from esdb_spark.operators.corpus import corpus_token_divergence

    a = spark.createDataFrame([Row(doc_id=1, text="x y")])
    b = spark.createDataFrame([Row(doc_id=2, text="y z")])
    r = corpus_token_divergence(a, b).collect()[0]
    assert (r["vocab_a"], r["vocab_b"], r["vocab_common"]) == (2, 2, 1)
    assert r["vocab_jaccard"] == round(1 / 3, 6)
    # tf vectors (1,1,0)·(0,1,1) / (√2·√2) = 0.5
    assert r["tf_cosine"] == 0.5


def test_source_overlap_matrix(spark):
    from esdb_spark.operators.corpus import source_overlap_matrix

    rows = [
        (1, "shared text", "a"), (2, "shared text", "b"),
        (3, "shared text", "b"),  # duplicate within b: counted once
        (4, "only a", "a"), (5, "both again", "a"), (6, "both again", "b"),
        (7, None, "a"),  # NULL text excluded
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, source string")
    out = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in source_overlap_matrix(df).collect()}
    assert out[("a", "b")] == 2      # shared text + both again
    assert out[("a", "a")] == 3      # a's distinct contents
    assert out[("b", "b")] == 2      # b's distinct contents


def test_vocab_coverage_counts(spark):
    from esdb_spark.operators.corpus import vocab_coverage

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "zebra quark zebra"),
            (3, ""),
            (4, None),
        ],
        "doc_id int, text string",
    )
    vocab = spark.createDataFrame(
        [("the",), ("cat",), ("on",), ("mat",)], "token string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_oov"], r["n_distinct_oov"], r["oov_rate"]
        )
        for r in vocab_coverage(docs, vocab).collect()
    }
    assert got[1] == (6, 1, 1, 1 / 6)  # only 'sat' is OOV
    assert got[2] == (3, 3, 2, 1.0)  # zebra x2 + quark, 2 distinct
    assert got[3] == (0, 0, 0, None)  # token-less: zero counts, NULL rate
    assert got[4] == (0, 0, 0, None)


def test_dedup_lines_global_keep_first(spark):
    from esdb_spark.operators.corpus import dedup_lines_global

    docs = spark.createDataFrame(
        [
            (1, "header\nunique one\nfooter"),
            (2, "header\nunique two\nfooter"),
            (3, "header\nheader\nfooter"),
            (4, ""),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines_global(docs).collect()}
    # doc 1 is the first occurrence of header+footer: intact
    assert out[1]["text"] == "header\nunique one\nfooter"
    assert out[1]["n_lines_removed"] == 0
    # doc 2 loses both boilerplate lines
    assert out[2]["text"] == "unique two"
    assert out[2]["n_lines_removed"] == 2
    # doc 3: both its lines are dups of doc 1's -> emptied
    assert out[3]["text"] == "" and out[3]["n_lines_removed"] == 3
    # empty doc: its one empty line is exempt (min_chars) and kept
    assert out[4]["text"] == "" and out[4]["n_lines"] == 1
    assert out[4]["n_lines_removed"] == 0


def test_dedup_lines_global_min_chars_exemption(spark):
    from esdb_spark.operators.corpus import dedup_lines_global

    docs = spark.createDataFrame(
        [(1, "aa\n\nbb"), (2, "aa\n\nbb")], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines_global(docs, min_chars=3).collect()
    }
    # every line is under min_chars -> nothing dedups, blank preserved
    assert out[2]["text"] == "aa\n\nbb"
    out2 = {
        r["doc_id"]: r for r in dedup_lines_global(docs).collect()
    }
    # default min_chars=1: 'aa'/'bb' dedup, the EMPTY line is exempt
    assert out2[2]["text"] == "" and out2[2]["n_lines_removed"] == 2


def test_dedup_lines_global_null_text(spark):
    from esdb_spark.operators.corpus import dedup_lines_global

    docs = spark.createDataFrame(
        [(1, None), (2, "line a\nline a")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in dedup_lines_global(docs).collect()}
    # NULL text reads as one empty (exempt) line
    assert out[1]["text"] == "" and out[1]["n_lines"] == 1
    # within-doc duplicate: second occurrence cut
    assert out[2]["text"] == "line a" and out[2]["n_lines_removed"] == 1
