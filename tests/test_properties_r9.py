"""Hypothesis property tests for the round-9 operator families — each
checked against a definitional pure-Python model (the house pattern of
test_properties.py: small randomized inputs, Spark result == model).
"""

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
_corpus = st.lists(_doc_text, min_size=2, max_size=10)


def _phrase_model(texts, phrase, keep):
    """Definitional phrase hits over the kept docs: (doc,
    n_occurrences, first_pos) in doc order."""
    words = phrase.split()
    out = []
    for doc, t in enumerate(texts):
        if doc not in keep:
            continue
        toks = t.lower().split()
        hits = [
            i
            for i in range(len(toks) - len(words) + 1)
            if toks[i : i + len(words)] == words
        ]
        if hits:
            out.append((doc, len(hits), hits[0]))
    return out


@given(texts=_corpus, data=st.data())
@settings(**_SETTINGS)
def test_positional_segments_serve_survivors(spark, texts, data):
    # random corpus, random 2-way segment split, random doc-id deletes:
    # serve(segments ∪ doc-id tombstones) == definitional phrase model
    # over the survivors, for every 2-gram that occurs anywhere
    from pyspark.sql import functions as F

    from esdb_spark.operators.search import (
        build_positional_index,
        compact_positional_segments,
        phrase_search_segments,
    )

    n = len(texts)
    split = data.draw(st.lists(st.booleans(), min_size=n, max_size=n))
    # only docs WITH postings are legal tombstone targets: a token-less
    # doc indexed nothing, so its tombstone is a guaranteed ghost that
    # compaction's integrity sweep rightly raises on (the streaming
    # maintainer filters such deletes out for exactly this reason)
    removable = [i for i in range(n) if texts[i].split()]
    removed = (
        set(
            data.draw(
                st.lists(
                    st.sampled_from(removable), max_size=max(0, n - 1),
                    unique=True,
                )
            )
        )
        if removable
        else set()
    )
    keep = set(range(n)) - removed
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    ids_a = [i for i in range(n) if split[i]]
    ids_b = [i for i in range(n) if not split[i]]
    segs = [
        build_positional_index(df.filter(F.col("doc_id").isin(ids)))
        for ids in (ids_a, ids_b)
        if ids
    ]
    if not segs:
        return
    tombs = (
        [spark.createDataFrame([(i,) for i in sorted(removed)], "doc int")]
        if removed
        else None
    )
    # every distinct 2-gram present in any kept doc, plus one absent
    grams = set()
    for i in keep:
        toks = texts[i].lower().split()
        grams.update(
            " ".join(toks[j : j + 2]) for j in range(len(toks) - 1)
        )
    for phrase in sorted(grams)[:3] + ["zz zz"]:
        got = [
            tuple(r)
            for r in phrase_search_segments(
                segs, phrase, tombstones=tombs
            ).collect()
        ]
        want = _phrase_model(texts, phrase, keep)
        assert got == want, (phrase, got, want)
    # compaction == flat rebuild over survivors
    surv = df.filter(F.col("doc_id").isin(sorted(keep)) if keep
                     else F.lit(False))
    a = sorted(
        (r["token"], r["doc"], tuple(r["positions"]))
        for r in compact_positional_segments(segs, tombs).collect()
    )
    b = sorted(
        (r["token"], r["doc"], tuple(r["positions"]))
        for r in build_positional_index(surv).collect()
    )
    assert a == b


@given(texts=_corpus, data=st.data())
@settings(**_SETTINGS)
def test_positional_batch_faces_equal_rebuild(spark, texts, data):
    # update(build(old), new) == build(all); delete(build(all), rm) ==
    # build(survivors) — the merged-index batch faces
    from pyspark.sql import functions as F

    from esdb_spark.operators.search import (
        build_positional_index,
        delete_from_positional_index,
        update_positional_index,
    )

    n = len(texts)
    cut = data.draw(st.integers(min_value=1, max_value=n))
    # tombstones target only docs WITH postings (a token-less doc is a
    # guaranteed ghost — same contract as the serve/compact faces)
    removable = [i for i in range(n) if texts[i].split()]
    rm = (
        set(data.draw(st.lists(st.sampled_from(removable), max_size=n - 1,
                               unique=True)))
        if removable
        else set()
    )
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    old = df.filter(F.col("doc_id") < cut)
    new = df.filter(F.col("doc_id") >= cut)

    def key(d):
        return sorted(
            (r["token"], r["doc"], tuple(r["positions"]))
            for r in d.collect()
        )

    updated = update_positional_index(build_positional_index(old), new)
    assert key(updated) == key(build_positional_index(df))
    if rm:
        surv = df.filter(~F.col("doc_id").isin(sorted(rm)))
        got = delete_from_positional_index(
            build_positional_index(df),
            spark.createDataFrame([(i,) for i in sorted(rm)], "doc_id int"),
        )
        assert key(got) == key(build_positional_index(surv))


_vec = st.lists(
    st.floats(
        min_value=-4.0, max_value=4.0,
        allow_nan=False, allow_infinity=False, width=32,
    ),
    min_size=4, max_size=4,
)


@given(vecs=st.lists(_vec, min_size=3, max_size=8), data=st.data())
@settings(**_SETTINGS)
def test_ivf_exact_full_probe_equals_mips_random(spark, vecs, data):
    # randomized vectors: probing every literal cell must reproduce
    # mips_topk_int8 value-for-value (codec, dots, ties)
    from pyspark.sql import functions as F

    from esdb_spark.operators.similarity import (
        ivf_topk_int8_exact,
        mips_topk_int8,
    )

    cents = [
        (0, [1.0, 0.5, 0.0, -0.25]),
        (1, [-1.0, 0.25, 0.5, 0.0]),
        (2, [0.0, -0.5, 1.0, 0.25]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") < 2)
    full = ivf_topk_int8_exact(
        emb, queries, cents, "embedding", "vec_id", k=3, n_probe=3
    )
    exact = mips_topk_int8(emb, queries, "embedding", "vec_id", k=3)
    got = sorted(map(tuple, full.collect()))
    want = sorted(
        (r["query_id"], r["id"], r["dot"], r["score"], r["rank"])
        for r in exact.collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# boolean query grammar: random ASTs vs a definitional python evaluator


def _ast(depth):
    terms = st.sampled_from(["aa", "ab", "ba", "bb", "c"]).map(
        lambda t: ("term", t)
    )
    phrases = st.tuples(
        st.sampled_from(["aa", "ab", "ba"]),
        st.sampled_from(["bb", "c", "aa"]),
    ).map(lambda p: ("phrase", p))
    nears = st.tuples(
        st.sampled_from(["aa", "ab"]),
        st.sampled_from(["bb", "c"]),
        st.integers(min_value=1, max_value=3),
    ).map(lambda n: ("near", n))
    prefixes = st.sampled_from(["a", "b", "aa"]).map(
        lambda stem: ("prefix", stem)
    )
    fuzzies = st.tuples(
        st.sampled_from(["aa", "ab", "cc"]),
        st.integers(min_value=1, max_value=2),
    ).map(lambda f: ("fuzzy", f))
    slops = st.tuples(
        st.tuples(
            st.sampled_from(["aa", "ab", "ba"]),
            st.sampled_from(["bb", "c", "aa"]),
        ),
        st.integers(min_value=0, max_value=2),
    ).map(lambda x: ("slop", x))
    # the engine-portable regex subset (Java rlike == RE2 == Python re
    # on these), fully anchored by contract
    # parenthesized groups included deliberately: the lexer must keep
    # '/a(b|c)/' one lexeme, not split it on the grammar parens (the
    # r11 advice finding — regression-guarded here)
    regexes = st.sampled_from(
        ["a+", "a.", "aa|bb", "[ab]b", "b{2}", "a(b|c)", "(aa)+", "a(b)?c"]
    ).map(lambda p: ("regex", p))
    leaf = st.one_of(
        terms, phrases, nears, prefixes, fuzzies, slops, regexes
    )
    if depth == 0:
        return leaf
    sub = _ast(depth - 1)
    return st.one_of(
        leaf,
        sub.map(lambda n: ("not", n)),
        st.lists(sub, min_size=2, max_size=3).map(lambda ns: ("and", ns)),
        st.lists(sub, min_size=2, max_size=3).map(lambda ns: ("or", ns)),
    )


def _render(node):
    kind = node[0]
    if kind == "term":
        return node[1]
    if kind == "phrase":
        return '"' + " ".join(node[1]) + '"'
    if kind == "near":
        wa, wb, d = node[1]
        return f"({wa} NEAR/{d} {wb})"
    if kind == "prefix":
        return node[1] + "*"
    if kind == "fuzzy":
        return f"{node[1][0]}~{node[1][1]}"
    if kind == "slop":
        words, s = node[1]
        return '"' + " ".join(words) + f'"~{s}'
    if kind == "regex":
        return f"/{node[1]}/"
    if kind == "not":
        return f"NOT ({_render(node[1])})"
    op = " AND " if kind == "and" else " OR "
    return "(" + op.join(_render(c) for c in node[1]) + ")"


def _py_lev(a, b):
    """Definitional Levenshtein (full DP) — the fuzzy operand's model."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _py_eval(node, toks):
    kind = node[0]
    if kind == "term":
        return node[1] in toks
    if kind == "phrase":
        w = list(node[1])
        return any(
            toks[i : i + len(w)] == w for i in range(len(toks) - len(w) + 1)
        )
    if kind == "prefix":
        return any(t.startswith(node[1]) for t in toks)
    if kind == "fuzzy":
        stem, d = node[1]
        return any(_py_lev(t, stem) <= d for t in toks)
    if kind == "regex":
        import re as _re

        return any(_re.fullmatch(node[1], t) for t in toks)
    if kind == "slop":
        # ordered chain within (n-1)+s: from each start, greedily take
        # each next word's EARLIEST position after the previous one
        # (earliest maximizes remaining slack, so greedy is complete)
        words, s = node[1]
        bound = len(words) - 1 + s
        for p1, t in enumerate(toks):
            if t != words[0]:
                continue
            prev, ok = p1, True
            for w in words[1:]:
                nxt = next(
                    (i for i in range(prev + 1, min(len(toks), p1 + bound + 1))
                     if toks[i] == w),
                    None,
                )
                if nxt is None:
                    ok = False
                    break
                prev = nxt
            if ok:
                return True
        return False
    if kind == "near":
        wa, wb, d = node[1]
        pa = [i for i, t in enumerate(toks) if t == wa]
        pb = [i for i, t in enumerate(toks) if t == wb]
        if wa == wb:
            return any(
                0 < abs(i - j) <= d for i in pa for j in pb if i < j
            )
        return any(abs(i - j) <= d for i in pa for j in pb)
    if kind == "not":
        return not _py_eval(node[1], toks)
    if kind == "and":
        return all(_py_eval(c, toks) for c in node[1])
    return any(_py_eval(c, toks) for c in node[1])


@given(texts=_corpus, node=_ast(2))
@settings(**_SETTINGS)
def test_boolean_grammar_matches_python_model(spark, texts, node):
    from esdb_spark.operators.search import (
        _bool_const_eval,
        boolean_search,
        parse_boolean_query,
    )

    # purely-negative shapes raise by contract — anchor them with a
    # positive conjunct instead of discarding the example
    if _bool_const_eval(node, False):
        node = ("and", [node, ("term", "aa")])
    query = _render(node)
    # round-trip: rendering then parsing yields the same AST (modulo
    # the one-word-quote normalization, which _render never emits)
    assert parse_boolean_query(query) == node
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    got = [r["doc"] for r in boolean_search(docs, query).collect()]
    want = sorted(
        d for d, t in enumerate(texts) if _py_eval(node, t.split())
    )
    assert got == want, (query, got, want)
