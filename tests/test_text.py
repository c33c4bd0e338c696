"""Text-analysis operator tests."""

import pytest
from pyspark.sql import functions as F

from esdb_spark.operators.text import (
    with_fingerprint,
    with_language_guess,
    with_quality,
    with_token_stats,
)
from esdb_spark.sources.tables import load_table


def test_token_stats(spark):
    df = spark.createDataFrame(
        [(1, "Hello  world  foo"), (2, ""), (3, "   ")], ["id", "text"]
    )
    out = {r.id: r for r in with_token_stats(df, "text").collect()}
    assert out[1].n_tokens == 3
    assert abs(out[1].avg_token_len - 13 / 3) < 1e-9  # (5+5+3)/3
    assert out[2].n_tokens == 0
    assert out[3].n_tokens == 0


def test_quality_score_bounds(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = with_quality(docs, "text")
    stats = out.agg(
        F.min("quality_score").alias("lo"), F.max("quality_score").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats.lo <= stats.hi <= 1.0
    # punctuation-free lowercase word soup → alpha ratio high, punct 0
    row = out.limit(1).collect()[0]
    assert row.punct_ratio == 0.0


def test_language_guess(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the market in the morning"),
            (2, "der hund und die katze ist nicht zu hause heute"),
            (3, "el perro y la gata en los campos de la casa"),
            (4, "xyzzy plugh qwerty"),
        ],
        ["id", "text"],
    )
    out = {r.id: r.lang_guess for r in with_language_guess(df, "text").collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        ["id", "text"],
    )
    out = {r.id: r for r in with_fingerprint(df, "text").collect()}
    # md5 fingerprint is whitespace/case-insensitive
    assert out[1].fingerprint_md5 == out[2].fingerprint_md5
    assert out[1].fingerprint_md5 != out[3].fingerprint_md5
    assert out[1].fingerprint_rolling == out[2].fingerprint_rolling


def test_winnow_fingerprints_edit_robustness(spark):
    from esdb_spark.operators.text import winnow_fingerprints

    base = " ".join(f"word{i}" for i in range(60))
    edited = base.replace("word30", "EDITED")  # one local edit
    other = " ".join(f"unrelated{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, other), (4, "short"), (5, "")],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, "text", "doc_id", k=3, w=4).collect()
    by_id = {}
    for r in fps:
        by_id.setdefault(r.doc_id, set()).add(r.fingerprint)
    # a single word edit preserves most fingerprints (winnowing locality)
    inter = len(by_id[1] & by_id[2])
    union = len(by_id[1] | by_id[2])
    assert inter / union > 0.5
    # unrelated docs share (almost) nothing
    assert len(by_id[1] & by_id[3]) == 0
    # degenerate docs still fingerprint (single shingle)
    assert len(by_id[4]) == 1 and len(by_id[5]) == 1
    # deterministic across invocations
    again = winnow_fingerprints(df, "text", "doc_id", k=3, w=4).collect()
    assert sorted(map(tuple, fps)) == sorted(map(tuple, again))


def test_profile_columns(spark):
    from esdb_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        ["k", "v"],
    )
    out = {r.column_name: r for r in profile_columns(df).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_nulls == 1 and out["k"].n_distinct == 3
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2
    # approx mode runs and keeps the schema
    approx = profile_columns(df, exact=False).collect()
    assert {r.column_name for r in approx} == {"k", "v"}


def test_chunk_documents_windows(spark):
    from esdb_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
            (2, "only three words"),
            (3, ""),  # no tokens → no chunks
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, "text", "doc_id", chunk_tokens=4, overlap=2)
    rows = {(r.doc_id, r.chunk_start): r for r in out.collect()}
    # doc 1: stride 2, last start capped at size-1-overlap=7 → 0,2,4,6
    # (a window at 8 would be a strict subset of the one at 6)
    assert sorted(s for d, s in rows if d == 1) == [0, 2, 4, 6]
    assert rows[(1, 0)].chunk_text == "w0 w1 w2 w3"
    assert rows[(1, 6)].chunk_text == "w6 w7 w8 w9"  # tail fully covered
    assert rows[(1, 6)].n_chunk_tokens == 4
    assert sorted(s for d, s in rows if d == 2) == [0]
    assert rows[(2, 0)].n_chunk_tokens == 3
    assert not any(d == 3 for d, _ in rows)

    import pytest

    with pytest.raises(ValueError):
        chunk_documents(docs, "text", "doc_id", chunk_tokens=4, overlap=4)


def test_top_distinctive_terms(spark):
    from esdb_spark.operators.text import top_distinctive_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana shared"),
            (2, "banana cherry shared shared"),
            (3, "shared cherry"),
        ],
        ["doc_id", "text"],
    )
    out = top_distinctive_terms(docs, "text", "doc_id", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.term, r.tf, r.df, r.rank))
    # doc 1: apple tf=2 df=1 → score 2.0 wins; banana (1/2) beats shared (1/3)
    assert by_doc[1][0] == ("apple", 2, 1, 1)
    assert by_doc[1][1] == ("banana", 1, 2, 2)
    # doc 2: shared tf=2 df=3 → 0.667 beats banana/cherry 0.5 (tie→term asc)
    assert by_doc[2][0][0] == "shared"
    assert by_doc[2][1][0] == "banana"


def test_stratified_hash_sample_keep_all_and_fractions(spark):
    from pyspark.sql import functions as F

    from esdb_spark.functions import hash_sample, stratified_hash_sample

    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("cls"),
    )
    kept = df.filter(
        stratified_hash_sample(F.col("id"), F.col("cls"), {"a": 256, "b": 64})
    )
    by_cls = {r.cls: r.n for r in kept.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert by_cls["a"] == 2000  # keep-all stratum survives entirely
    assert 0.15 < by_cls["b"] / 2000 < 0.35  # ~25% of the other
    # subset property: stratified 'b' rows are exactly hash_sample(64) rows
    b64 = df.filter((F.col("cls") == "b") & hash_sample(F.col("id"), 64))
    assert kept.filter(F.col("cls") == "b").exceptAll(b64).count() == 0

    import pytest

    with pytest.raises(ValueError):
        stratified_hash_sample(F.col("id"), F.col("cls"), {"a": 257})


def test_redact_pii_families_and_order(spark):
    from esdb_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at bob@corp.io or see https://x.io/a?u=1 now"),
            (2, "server 192.168.1.7 answered, call +44-202-5550-199"),
            (3, "no pii here at all"),
        ],
        ["id", "text"],
    )
    out = {r.id: r.text for r in redact_pii(df).collect()}
    assert out[1] == "mail me at [REDACTED] or see [REDACTED] now"
    assert out[2] == "server [REDACTED] answered, call [REDACTED]"
    assert out[3] == "no pii here at all"
    # kinds filter: only emails fire
    only_mail = {
        r.id: r.text for r in redact_pii(df, kinds=["email"]).collect()
    }
    assert "https://x.io" in only_mail[1] and "[REDACTED]" in only_mail[1]
    assert only_mail[2] == df.collect()[1].text


def test_repetition_stats_known_values(spark):
    from esdb_spark.operators.text import with_repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a a a b"),            # 4 tokens, 2 distinct, top 'a'=3
            (2, "x\ny\nx\n"),          # 3 lines, 2 distinct
            (3, ""),                    # degenerate
        ],
        ["id", "text"],
    )
    out = {r.id: r for r in with_repetition_stats(df).collect()}
    assert out[1].dup_token_ratio == 0.5
    assert out[1].top_token_share == 0.75
    assert out[2].dup_line_ratio == round(1 / 3, 6)
    assert out[3].dup_token_ratio == 0.0 and out[3].top_token_share == 0.0


def test_extract_domains(spark):
    from esdb_spark.operators.text import extract_domains

    df = spark.createDataFrame(
        [(1, "go to https://A.example.com/x or http://b.org, thanks")],
        ["id", "text"],
    )
    row = extract_domains(df).collect()[0]
    # ',' is outside the host class, so the trailing comma never leaks
    assert row.domains == ["a.example.com", "b.org"]


def test_strip_html_removes_chrome_and_decodes_entities(spark):
    from esdb_spark.operators.text import strip_html

    html = (
        '<html><head><style>p {x: 1}</style>'
        "<script>if (a &amp;&amp; b) { go(); }</script></head>"
        "<body><!-- hidden --><h1>Title</h1>"
        "<p>Tom &amp; Jerry say &quot;hi&quot; &lt;now&gt;</p>"
        "<ul><li>one</li><li>two</li></ul></body></html>"
    )
    df = spark.createDataFrame([(1, html)], ["id", "html"])
    out = strip_html(df, "html", "text").collect()[0]["text"]
    assert "script" not in out and "style" not in out and "hidden" not in out
    assert "go();" not in out and "x: 1" not in out
    assert 'Tom & Jerry say "hi" <now>' in out
    # block boundaries became line structure
    assert out.splitlines()[0] == "Title"
    assert "one" in out.splitlines() and "two" in out.splitlines()


def test_strip_html_no_double_entity_decode(spark):
    from esdb_spark.operators.text import strip_html

    # "&amp;lt;" must decode to the literal text "&lt;", NOT to "<"
    df = spark.createDataFrame([(1, "<p>a &amp;lt; b</p>")], ["id", "html"])
    out = strip_html(df, "html", "text").collect()[0]["text"]
    assert out == "a &lt; b"
