"""Trigram-Jaccard fuzzy join (operators/linkage.py): exactness vs a
brute-force python computation, threshold/edge handling, and the
stop-gram recall trade."""

import pytest

from esdb_spark.operators.linkage import fuzzy_join_trigram


def _tg(s):
    s = s.lower()
    return {s[i : i + 3] for i in range(len(s) - 2)}


def _jacc(a, b):
    ta, tb = _tg(a), _tg(b)
    return len(ta & tb) / len(ta | tb) if ta | tb else 0.0


@pytest.fixture(scope="module")
def names(spark):
    left = [
        (1, "Acme Corporation"),
        (2, "Globex Ltd"),
        (3, "Initech LLC"),
        (4, "ab"),  # too short: no trigrams
    ]
    right = [
        (10, "ACME Corp"),
        (11, "Globex Limited"),
        (12, "Umbrella Co"),
        (13, "Initech, LLC."),
    ]
    return (
        spark.createDataFrame(left, "lid int, name string"),
        spark.createDataFrame(right, "rid int, name string"),
        left,
        right,
    )


def test_matches_bruteforce_exactly(spark, names):
    ldf, rdf, left, right = names
    out = {
        (r["left_id"], r["right_id"]): r["sim"]
        for r in fuzzy_join_trigram(
            ldf, rdf, "name", "name", "lid", "rid", threshold=0.2
        ).collect()
    }
    want = {
        (li, ri): _jacc(ln, rn)
        for li, ln in left
        for ri, rn in right
        if _tg(ln) and _tg(rn) and _jacc(ln, rn) >= 0.2
    }
    assert set(out) == set(want)
    for k in want:
        assert abs(out[k] - want[k]) < 1e-12
    # the short record matched nothing
    assert not any(li == 4 for li, _ in out)


def test_threshold_validation_and_monotonicity(spark, names):
    ldf, rdf, *_ = names
    with pytest.raises(ValueError, match="threshold"):
        fuzzy_join_trigram(ldf, rdf, "name", "name", "lid", "rid", threshold=0)
    lo = fuzzy_join_trigram(
        ldf, rdf, "name", "name", "lid", "rid", threshold=0.1
    ).count()
    hi = fuzzy_join_trigram(
        ldf, rdf, "name", "name", "lid", "rid", threshold=0.6
    ).count()
    assert hi <= lo


def test_max_posting_drops_stop_grams_only(spark):
    # every record shares the stop-gram 'aaa'; distinctive grams differ
    left = spark.createDataFrame(
        [(i, f"aaaa{i:03d}x") for i in range(50)], "lid int, name string"
    )
    right = spark.createDataFrame(
        [(i + 100, f"aaaa{i:03d}x") for i in range(50)], "rid int, name string"
    )
    exact = fuzzy_join_trigram(
        left, right, "name", "name", "lid", "rid", threshold=0.9
    )
    pruned = fuzzy_join_trigram(
        left, right, "name", "name", "lid", "rid", threshold=0.9,
        max_posting=20,
    )
    # identical-name pairs survive pruning: their distinctive trigrams
    # ('a00', '001', '01x'...) have tiny postings
    got = {(r["left_id"], r["right_id"]) for r in pruned.collect()}
    want = {(r["left_id"], r["right_id"]) for r in exact.collect()}
    assert want == {(i, i + 100) for i in range(50)}
    assert got == want  # recall preserved when any shared gram is rare


def test_short_and_empty_strings_match_nothing(spark):
    """Review r5.3 (confirmed bug): Spark sequence(1, 0) steps -1 and
    yielded [1, 0] — 'ab' got pseudo-trigram 'ab', '' got '', and every
    blank record linked to every other at sim 1.0. The CASE guard
    restores the documented no-trigram semantics (and DuckDB
    generate_series parity)."""
    left = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None), (4, "abcd")], "lid int, name string"
    )
    right = spark.createDataFrame(
        [(10, "AB"), (11, ""), (12, "abcd")], "rid int, name string"
    )
    out = fuzzy_join_trigram(
        left, right, "name", "name", "lid", "rid", threshold=0.01
    ).collect()
    pairs = {(r["left_id"], r["right_id"]) for r in out}
    assert pairs == {(4, 12)}  # only the real >=3-char match


def test_guard_product_raises_on_predicted_blowup(spark):
    """guard_product: the pre-flight probe predicts the candidate-pair
    count and raises naming the worst stop-gram; with max_posting
    pruning the prediction reflects the PRUNED plan and passes."""
    rows = [(i, f"the company number {i}") for i in range(30)]
    ldf = spark.createDataFrame(rows, "lid int, name string")
    rdf = spark.createDataFrame(rows, "rid int, name string")
    with pytest.raises(ValueError, match="guard_product"):
        fuzzy_join_trigram(
            ldf, rdf, "name", "name", "lid", "rid",
            threshold=0.5, guard_product=100,
        )
    # generous bound: plan builds and runs normally
    out = fuzzy_join_trigram(
        ldf, rdf, "name", "name", "lid", "rid",
        threshold=0.99, guard_product=10_000_000,
    )
    assert out.count() == 30
    # the guard measures the plan that will RUN: with an aggressive
    # max_posting the shared-prefix stop-grams are pruned away and the
    # same tight bound passes
    pruned = fuzzy_join_trigram(
        ldf, rdf, "name", "name", "lid", "rid",
        threshold=0.99, max_posting=3, guard_product=100,
    )
    # records whose every trigram was a stop-gram drop out of the
    # pruned universe (documented); the ones left still self-match
    assert 0 < pruned.count() <= 30
