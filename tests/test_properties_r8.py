"""Hypothesis property tests for the round-8 operator families — each
checked against a definitional pure-Python model (the house pattern of
test_properties.py: small randomized inputs, Spark result == model).
"""

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny-alphabet corpora so token collisions across docs actually occur
_doc_text = st.lists(
    st.sampled_from(["aa", "ab", "ba", "bb", "c"]), min_size=0, max_size=8
).map(" ".join)
_corpus = st.lists(_doc_text, min_size=1, max_size=10)


def _build_model(texts, keep=None):
    idx = {}
    for doc, t in enumerate(texts):
        if keep is not None and doc not in keep:
            continue
        for w in t.lower().split():
            idx.setdefault(w, {}).setdefault(doc, 0)
            idx[w][doc] += 1
    return {tok: sorted(p.items()) for tok, p in idx.items()}


def _idx_dict(df):
    # flat (token, doc, tf) layout (round 10): fold rows per token
    out = {}
    for r in df.collect():
        out.setdefault(r["token"], []).append((r["doc"], r["tf"]))
    return {tok: sorted(v) for tok, v in out.items()}


@settings(**_SETTINGS)
@given(
    texts=_corpus,
    cuts=st.lists(st.integers(0, 9), min_size=0, max_size=2),
    removed_mask=st.integers(0, 1023),
)
def test_compact_segments_equals_rebuild_property(
    spark, texts, cuts, removed_mask
):
    # random segmentation of the corpus + random removal subset:
    # compact(segments, tombstone) == definitional index over the
    # survivors, value-for-value
    from esdb_spark.operators.search import (
        build_inverted_index,
        compact_segments,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    bounds = sorted({0, *[c for c in cuts if c < len(rows)], len(rows)})
    parts = [
        rows[a:b] for a, b in zip(bounds, bounds[1:]) if rows[a:b]
    ] or [rows]
    removed = [r for r in rows if (removed_mask >> r[0]) & 1]
    keep = {r[0] for r in rows} - {r[0] for r in removed}
    segs = [
        build_inverted_index(
            spark.createDataFrame(p, "doc_id int, text string")
        )
        for p in parts
    ]
    tombs = (
        [
            build_inverted_index(
                spark.createDataFrame(removed, "doc_id int, text string")
            )
        ]
        if removed
        else None
    )
    got = _idx_dict(compact_segments(segs, tombs))
    assert got == _build_model(texts, keep)


@settings(**_SETTINGS)
@given(texts=_corpus, removed_mask=st.integers(0, 1023))
def test_doc_lengths_maintenance_property(spark, texts, removed_mask):
    # delete(update(build(old), new), removed) == build(survivors)
    # for every split/removal pattern where the removal is legal
    from esdb_spark.operators.search import (
        build_doc_lengths,
        delete_doc_lengths,
        update_doc_lengths,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    half = len(rows) // 2
    old, new = rows[:half] or rows, rows[half:] if rows[:half] else []
    removed_ids = [
        (i,) for i, _ in rows if (removed_mask >> i) & 1
    ]
    schema = "doc_id int, text string"
    state = build_doc_lengths(spark.createDataFrame(old, schema))
    if new:
        state = update_doc_lengths(
            state, spark.createDataFrame(new, schema)
        )
    if removed_ids:
        state = delete_doc_lengths(
            state, spark.createDataFrame(removed_ids, "doc_id int")
        )
    survivors = [
        r for r in rows if not ((removed_mask >> r[0]) & 1)
    ]
    want = sorted(
        (i, float(len(t.split()))) for i, t in survivors
    )
    assert sorted(map(tuple, state.collect())) == want


@settings(**_SETTINGS)
@given(
    texts=st.lists(_doc_text.filter(lambda t: t.strip()), min_size=2,
                   max_size=8),
    dup_at=st.integers(0, 7),
)
def test_segment_reappend_always_raises_property(spark, texts, dup_at):
    # ANY doc id present in two live segments must raise, whatever the
    # corpus shape — the disjoint-docs contract
    from esdb_spark.operators.search import (
        build_inverted_index,
        compact_segments,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    dup = rows[dup_at % len(rows)]
    schema = "doc_id int, text string"
    seg1 = build_inverted_index(spark.createDataFrame(rows, schema))
    seg2 = build_inverted_index(spark.createDataFrame([dup], schema))
    with pytest.raises(Exception, match="more than one live segment"):
        compact_segments([seg1, seg2]).collect()
