"""Hypothesis property tests for the round-7 operator families — each
checked against a definitional pure-Python model (the house pattern of
test_properties.py: small randomized inputs, Spark result == model).
"""

from fractions import Fraction

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


def _build_model(texts):
    """Definitional inverted index: token -> {doc: tf}."""
    idx = {}
    for doc, t in enumerate(texts):
        for w in t.lower().split():
            idx.setdefault(w, {}).setdefault(doc, 0)
            idx[w][doc] += 1
    return {
        tok: sorted(postings.items())
        for tok, postings in idx.items()
    }


def _idx_dict(df):
    # flat (token, doc, tf) layout (round 10): fold rows per token
    out = {}
    for r in df.collect():
        out.setdefault(r["token"], []).append((r["doc"], r["tf"]))
    return {tok: sorted(v) for tok, v in out.items()}


@settings(**_SETTINGS)
@given(texts=_corpus, split=st.integers(min_value=0, max_value=9))
def test_update_index_equals_rebuild_property(spark, texts, split):
    from esdb_spark.operators.search import (
        build_inverted_index,
        update_inverted_index,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    old = [r for r in rows if r[0] <= split]
    new = [r for r in rows if r[0] > split]
    full_df = spark.createDataFrame(rows, "doc_id int, text string")
    want = _build_model(texts)
    if new:
        got_df = update_inverted_index(
            build_inverted_index(
                spark.createDataFrame(old, "doc_id int, text string")
            ),
            spark.createDataFrame(new, "doc_id int, text string"),
        )
    else:
        got_df = build_inverted_index(full_df)
    assert _idx_dict(got_df) == want


@settings(**_SETTINGS)
@given(texts=_corpus, drop=st.integers(min_value=0, max_value=9))
def test_delete_index_equals_rebuild_property(spark, texts, drop):
    from esdb_spark.operators.search import (
        build_inverted_index,
        delete_from_inverted_index,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    removed = [r for r in rows if r[0] == drop]
    kept = [r for r in rows if r[0] != drop]
    full = build_inverted_index(
        spark.createDataFrame(rows, "doc_id int, text string")
    )
    if not removed:
        return
    got = delete_from_inverted_index(
        full, spark.createDataFrame(removed, "doc_id int, text string")
    )
    want = _build_model([t for i, t in kept])
    # model indexes by position; rebuild ids to match kept doc ids
    remap = {pos: i for pos, (i, _) in enumerate(kept)}
    want = {
        tok: sorted((remap[d], tf) for d, tf in posts)
        for tok, posts in want.items()
    }
    assert _idx_dict(got) == want


_rank_lists = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=6), min_size=1, max_size=5,
        unique=True,
    ),
    min_size=1,
    max_size=4,
)


@settings(**_SETTINGS)
@given(lists=_rank_lists, c=st.integers(min_value=1, max_value=90))
def test_rrf_fuse_exact_matches_fraction_model(spark, lists, c):
    """The (P, S) fold must equal the correctly-rounded float of the
    TRUE rational Σ 1/(c+rᵢ) — Fraction is the definitional model."""
    from esdb_spark.operators.search import rrf_fuse_exact

    ranked = [
        spark.createDataFrame(
            [(doc, i + 1) for i, doc in enumerate(docs)],
            "doc_id int, rank int",
        )
        for docs in lists
    ]
    got = {
        r["doc_id"]: (r["n_lists"], r["rrf"])
        for r in rrf_fuse_exact(ranked, k=50, c=c).collect()
    }
    model = {}
    for docs in lists:
        for i, doc in enumerate(docs):
            n, s = model.get(doc, (0, Fraction(0)))
            model[doc] = (n + 1, s + Fraction(1, c + i + 1))
    want = {
        doc: (n, float(s.numerator) / float(s.denominator))
        for doc, (n, s) in model.items()
    }
    assert got == want


@settings(**_SETTINGS)
@given(texts=_corpus)
def test_fixed_merge_token_stats_matches_python_model(spark, texts):
    """Sequential apply-in-order merging replayed definitionally on
    symbol lists (no string tricks) must equal the operator's
    sentinel-replace segmentation."""
    from esdb_spark.operators.bpe import fixed_merge_token_stats

    merges = [("a", "a"), ("b", "b"), ("aa", "b"), ("c", "aab")]

    def seg_word(w):
        syms = list(w)
        for a, b in merges:
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2  # left-to-right, non-overlapping
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in fixed_merge_token_stats(
            spark.createDataFrame(rows, "doc_id int, text string"), merges
        ).collect()
    }
    for i, t in rows:
        words = t.lower().split()
        n_tokens = sum(len(seg_word(w)) for w in words)
        assert got[i] == (len(words), n_tokens, len(t))


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=0,
        max_size=16,
    ),
    srcs=st.lists(
        st.integers(min_value=0, max_value=7),
        min_size=1,
        max_size=3,
        unique=True,
    ),
    hops=st.integers(min_value=0, max_value=4),
)
def test_bfs_distances_matches_python_bfs(spark, edges, srcs, hops):
    from esdb_spark.operators.graph import bfs_distances

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist = {s: 0 for s in srcs}
    frontier = set(srcs)
    for h in range(1, hops + 1):
        nxt = {
            d
            for s in frontier
            for d in adj.get(s, ())
            if d not in dist
        }
        for d in nxt:
            dist[d] = h
        frontier = nxt
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(
            spark.createDataFrame(
                edges or [(0, 0)], "src long, dst long"
            ).limit(len(edges)),
            spark.createDataFrame([(s,) for s in srcs], "id long"),
            max_hops=hops,
        ).collect()
    }
    assert got == dist
