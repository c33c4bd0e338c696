"""Round-11 property tests: the maintained spell store's upsert
algebra against a definitional Python model.

The model: a corpus is a dict doc_id → text; the store must always
equal build_spell_index(vocab(live docs)). Epochs apply random
add/remove batches through spell_index_upserts + the pre-compaction
protocol (an upsert is tombstone + re-insert with the prior state
folded; dead tokens stay as serving tombstones until the next fold);
after every epoch, suggest from the segments must equal the
brute-force levenshtein suggest over the live corpus's vocabulary.
"""

from collections import Counter

from hypothesis import given, settings, strategies as st


WORDS = ["merge", "marge", "spark", "spork", "table", "data", "aa", "ab"]


def _py_vocab(texts):
    c = Counter()
    for t in texts:
        c.update(t.split())
    return c


def _py_lev(a, b):
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


def _py_suggest(vocab: Counter, term: str, d: int, k: int):
    cand = [
        (tok, freq, _py_lev(tok, term))
        for tok, freq in vocab.items()
        if _py_lev(tok, term) <= d
    ]
    cand.sort(key=lambda x: (x[2], -x[1], x[0]))
    return cand[:k]


@st.composite
def _epochs(draw):
    texts = st.lists(
        st.sampled_from(WORDS), min_size=1, max_size=5
    ).map(" ".join)
    n_docs = draw(st.integers(min_value=2, max_value=5))
    docs = {i: draw(texts) for i in range(n_docs)}
    n_epochs = draw(st.integers(min_value=1, max_value=2))
    plan = []
    live = set(docs)
    next_id = n_docs
    for _ in range(n_epochs):
        removes = draw(
            st.lists(
                st.sampled_from(sorted(live)) if live else st.nothing(),
                max_size=2,
                unique=True,
            )
        ) if live else []
        n_add = draw(st.integers(min_value=0, max_value=2))
        adds = {}
        for _ in range(n_add):
            adds[next_id] = draw(texts)
            next_id += 1
        # an epoch must change something for the protocol to be legal
        if not removes and not adds:
            adds[next_id] = draw(texts)
            next_id += 1
        live -= set(removes)
        live |= set(adds)
        plan.append((removes, adds))
    return docs, plan


@settings(max_examples=6, deadline=None)
@given(_epochs())
def test_spell_store_epochs_match_python_model(spark, case):
    from esdb_spark.operators.search import (
        build_spell_index,
        compact_spell_segments,
        spell_index_upserts,
        spell_segments_vocab,
        suggest_terms_segments,
    )

    docs, plan = case
    live = dict(docs)

    def vdf(counter):
        if not counter:
            return spark.createDataFrame(
                [], "token string, term_freq long"
            )
        return spark.createDataFrame(
            [(t, f) for t, f in sorted(counter.items())],
            "token string, term_freq long",
        )

    # localCheckpoint per epoch: each epoch's segments are built FROM
    # the previous epoch's (compaction of compaction...) — without a
    # materialization boundary the plan nests geometrically and every
    # suggest re-executes the whole history (measured: the un-cut
    # version ran past 10 minutes; cut, the test is seconds-per-example)
    segments = [
        build_spell_index(vdf(_py_vocab(live.values()))).localCheckpoint()
    ]
    tombs = []
    for removes, adds in plan:
        # delete half-epoch
        rm_texts = [live.pop(i) for i in removes]
        if rm_texts:
            cur = spell_segments_vocab(segments, tombs or None)
            r, t = spell_index_upserts(
                cur, vdf(_py_vocab(rm_texts)), remove=True
            )
            t_re = t.join(r.select("token"), "token", "left_semi")
            t_dead = t.join(r.select("token"), "token", "left_anti")
            segments = [
                compact_spell_segments(
                    segments, (tombs or []) + [t_re]
                ).localCheckpoint(),
                build_spell_index(r).localCheckpoint(),
            ]
            tombs = [t_dead.localCheckpoint()]
        # insert half-epoch
        add_texts = list(adds.values())
        if add_texts:
            cur = spell_segments_vocab(segments, tombs or None)
            r, t = spell_index_upserts(cur, vdf(_py_vocab(add_texts)))
            segments = [
                compact_spell_segments(
                    segments, (tombs or []) + [t]
                ).localCheckpoint(),
                build_spell_index(r).localCheckpoint(),
            ]
            tombs = []
            live.update(adds)
        got = [
            tuple(r)
            for r in suggest_terms_segments(
                segments, "mrege", max_dist=2, k=5,
                tombstones=tombs or None,
            ).collect()
        ]
        want = [
            (t, f, d)
            for t, f, d in _py_suggest(
                _py_vocab(live.values()), "mrege", 2, 5
            )
        ]
        assert got == want, (got, want, live)
