"""Stored-fields store (operators/storedfields.py): the maintained
doc → (text, metadata…) side table — the reference's stored-payload
competence (space.go:62-108) — plus the round-10 field-operand and
result-page serving it unlocks on the index faces."""

import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.storedfields import (
    build_stored_fields,
    compact_stored_segments,
    delete_stored_fields,
    stored_fields_segments,
    update_stored_fields,
)


@pytest.fixture(scope="module")
def fdocs(spark):
    return spark.createDataFrame(
        [
            (1, "spark data here", "en", "a"),
            (2, "spark data there", "EN", "b"),
            (3, "spark merge", "de", "a"),
            (4, "no hits", "en", "b"),
            (5, "spark data", None, "b"),
        ],
        "doc_id int, text string, lang string, source string",
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_build_update_delete_roundtrip(spark, fdocs):
    full = build_stored_fields(fdocs)
    assert full.columns == ["doc", "text", "lang", "source"]
    up = update_stored_fields(
        build_stored_fields(fdocs.filter("doc_id <= 3")),
        fdocs.filter("doc_id > 3"),
    )
    assert _rows(up) == _rows(full)
    dl = delete_stored_fields(
        full, fdocs.filter("doc_id % 2 = 0").select("doc_id")
    )
    assert _rows(dl) == _rows(
        build_stored_fields(fdocs.filter("doc_id % 2 = 1"))
    )


def test_update_delete_guards_raise(spark, fdocs):
    full = build_stored_fields(fdocs)
    with pytest.raises(Exception, match="re-appends"):
        update_stored_fields(full, fdocs.filter("doc_id = 2")).collect()
    # intra-delta duplicate and NULL ids raise via the probe leg
    dup = fdocs.filter("doc_id = 1").unionByName(fdocs.filter("doc_id = 1"))
    with pytest.raises(Exception, match="duplicate"):
        update_stored_fields(
            build_stored_fields(fdocs.filter("doc_id > 1")), dup
        ).collect()
    ghost = spark.createDataFrame([(99,)], "doc_id int")
    with pytest.raises(Exception, match="ghost"):
        delete_stored_fields(full, ghost).collect()
    # a delete that empties the store still trips the guard (the
    # zero-row union-leg shape — a filter-carried guard would not)
    with pytest.raises(Exception, match="ghost"):
        delete_stored_fields(
            build_stored_fields(fdocs.filter("doc_id = 1")),
            spark.createDataFrame([(1,), (99,)], "doc_id int"),
        ).collect()


def test_non_atomic_column_rejected(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"])], "doc_id int, tags array<string>"
    )
    with pytest.raises(ValueError, match="non-atomic"):
        build_stored_fields(df)


def test_segments_serve_and_compact_equal_rebuild(spark, fdocs):
    segs = [
        build_stored_fields(fdocs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    tomb = [fdocs.filter("doc_id = 3").select(F.col("doc_id").alias("doc"))]
    survivors = build_stored_fields(fdocs.filter("doc_id != 3"))
    assert _rows(stored_fields_segments(segs, tomb)) == _rows(survivors)
    assert _rows(compact_stored_segments(segs, tomb)) == _rows(survivors)
    # ids-bounded fetch reads only the requested docs (and an
    # ids-filtered-to-empty tombstone set must not trip the NULL probe
    # — the empty-aggregate coalesce fix)
    ids = spark.createDataFrame([(2,), (4,)], "doc int")
    got = stored_fields_segments(segs, tomb, ids=ids)
    assert sorted(r["doc"] for r in got.collect()) == [2, 4]
    # the literal tier (driver-side id list) serves identically
    got2 = stored_fields_segments(segs, tomb, ids=[2, 4])
    assert _rows(got2) == _rows(got)


def test_segment_guards_raise(spark, fdocs):
    segs = [
        build_stored_fields(fdocs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    with pytest.raises(Exception, match="more than once"):
        compact_stored_segments([segs[0], segs[0]]).collect()
    with pytest.raises(Exception, match="ghost"):
        compact_stored_segments(
            segs, [spark.createDataFrame([(99,)], "doc int")]
        ).collect()
    with pytest.raises(Exception, match="NULL doc id"):
        compact_stored_segments(
            segs, [spark.createDataFrame([(None,)], "doc int")]
        ).collect()
    # the serving face sees corruption it TOUCHES: a ghost tombstone
    # outside the requested ids is invisible by design (compaction is
    # the audit face)
    ids = spark.createDataFrame([(1,)], "doc int")
    assert (
        stored_fields_segments(
            segs,
            [spark.createDataFrame([(99,)], "doc int")],
            ids=ids,
        ).count()
        == 1
    )


def test_field_operands_serve_on_all_index_faces(spark, fdocs):
    from esdb_spark.operators.search import (
        boolean_search,
        boolean_search_indexed,
        boolean_search_positional,
        boolean_search_positional_segments,
        boolean_search_segments,
        build_inverted_index,
        build_positional_index,
    )

    q = "lang:en AND spark AND NOT merge"
    want = [tuple(r) for r in boolean_search(fdocs, q).collect()]
    assert want  # non-trivial
    meta = build_stored_fields(fdocs, cols=["lang", "source"])
    got_i = boolean_search_indexed(
        build_inverted_index(fdocs), q, fields=meta
    )
    got_p = boolean_search_positional(
        build_positional_index(fdocs), q, fields=meta
    )
    isegs = [
        build_inverted_index(fdocs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    psegs = [
        build_positional_index(fdocs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    got_is = boolean_search_segments(isegs, q, fields=meta)
    got_ps = boolean_search_positional_segments(psegs, q, fields=meta)
    for got in (got_i, got_p, got_is, got_ps):
        assert [tuple(r) for r in got.collect()] == want
    # field-only queries work (empty typed token seed)
    fo = [
        r["doc"]
        for r in boolean_search_indexed(
            build_inverted_index(fdocs), "lang:en", fields=meta
        ).collect()
    ]
    assert fo == [1, 2, 4]
    # without a fields frame the faces still reject field operands
    with pytest.raises(ValueError, match="metadata"):
        boolean_search_indexed(build_inverted_index(fdocs), "lang:en")


def test_search_page_maintained_parity_and_drift_guard(spark):
    from esdb_spark.operators.search import (
        build_positional_index,
        search_page,
        search_page_maintained,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaa bbb spark ccc ddd", "en"),
            (2, "spark spark data xxx", "en"),
            (3, "no match here", "de"),
            (4, "data then spark", "en"),
            (5, "data only doc", "en"),
            (6, "spark data deleted", "en"),
        ],
        "doc_id int, text string, lang string",
    )
    surv = docs.filter("doc_id != 6")
    psegs = [
        build_positional_index(docs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    tomb = [docs.filter("doc_id = 6").select(F.col("doc_id").alias("doc"))]
    ssegs = [
        build_stored_fields(docs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    stored = stored_fields_segments(ssegs, tomb)
    # term+field, quoted phrase with field, field-only (leading
    # snippet fallback) — all value-equal to the corpus face over the
    # survivors
    for q in ("spark OR data", 'lang:en AND "data then"', "lang:de"):
        want = [tuple(r) for r in search_page(surv, q, k=3, window=1).collect()]
        got = [
            tuple(r)
            for r in search_page_maintained(
                psegs, stored, q, k=3, window=1, tombstones=tomb
            ).collect()
        ]
        assert got == want, q
    # a page doc missing from the stored store = index/payload
    # divergence — must raise, never silently shorten the page
    with pytest.raises(Exception, match="diverged"):
        search_page_maintained(
            psegs, stored.filter("doc != 2"), "spark OR data",
            k=3, tombstones=tomb,
        ).collect()


def test_search_page_maintained_serves_fuzzy_operands(spark):
    # round 11 (r10 verdict "What's missing #1"): ~d operands on the
    # maintained page — SymSpell candidates ride the one net
    # in-filter, so match, first_pos, and snippet equal the corpus
    # face's levenshtein disjunct over the survivors; without a spell
    # index the face still raises
    from esdb_spark.operators.search import (
        build_positional_index,
        build_spell_index,
        positional_index_stats,
        search_page,
        search_page_maintained,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaa spork bbb", "en"),      # lev-1 hit mid-doc
            (2, "no match here", "en"),
            (3, "spark here", "en"),          # exact hit at 0
            (4, "sprak data", "de"),          # lev-1 but lang:de
            (5, "spark deleted doc", "en"),   # tombstoned
        ],
        "doc_id int, text string, lang string",
    )
    surv = docs.filter("doc_id != 5")
    psegs = [
        build_positional_index(docs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    tomb = [docs.filter("doc_id = 5").select(F.col("doc_id").alias("doc"))]
    ssegs = [
        build_stored_fields(docs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    stored = stored_fields_segments(ssegs, tomb)
    sp = build_spell_index(
        positional_index_stats(psegs[0].unionByName(psegs[1])).select(
            "token", "term_freq"
        ),
        max_dist=1,
    )
    for q in ("spark~1 AND lang:en", "spark~1"):
        want = [
            tuple(r) for r in search_page(surv, q, k=5, window=1).collect()
        ]
        got = [
            tuple(r)
            for r in search_page_maintained(
                psegs, stored, q, k=5, window=1, tombstones=tomb,
                spell_index=sp,
            ).collect()
        ]
        assert got == want, q
        assert want  # the fixture must actually exercise fuzzy hits
    with pytest.raises(ValueError, match="spell_index"):
        search_page_maintained(
            psegs, stored, "spark~1", k=5, tombstones=tomb
        )


def test_maintain_stored_fields_epoch_parity(spark, tmp_path):
    # the LSM streaming maintainer: per-epoch segments + id tombstones
    # net to exactly the surviving rows; deletes visible immediately
    from esdb_spark.streaming import (
        maintain_stored_fields,
        read_maintained_index_segments,
    )

    src = str(tmp_path / "chg")
    state = str(tmp_path / "sf")
    ckpt = str(tmp_path / "ck")
    schema = "doc_id int, text string, lang string, op string"
    batches = [
        [(1, "spark joins tables", "en", "insert"),
         (2, "spark shuffle spark", "de", "insert"),
         (3, "tables of data", "en", "insert")],
        [(4, "spark tables spark", "en", "insert"),
         (3, "ignored text", "en", "delete")],
    ]
    for i, batch in enumerate(batches):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            mode
        ).json(src)
        stream = spark.readStream.schema(schema).json(src)
        q = maintain_stored_fields(
            stream, state, op_col="op", checkpoint=ckpt,
            query_name=f"msf_{i}",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    live, tomb = read_maintained_index_segments(spark, state)
    served = stored_fields_segments(live, tomb or None)
    got = sorted((r["doc"], r["text"], r["lang"]) for r in served.collect())
    assert got == [
        (1, "spark joins tables", "en"),
        (2, "spark shuffle spark", "de"),
        (4, "spark tables spark", "en"),
    ]
    # cross-epoch re-insert self-heals via pre-compaction (the shared
    # id-keyed ordering contract)
    spark.createDataFrame(
        [(3, "tables return", "en", "insert")], schema
    ).coalesce(1).write.mode("append").json(src)
    stream = spark.readStream.schema(schema).json(src)
    q = maintain_stored_fields(
        stream, state, op_col="op", checkpoint=ckpt, query_name="msf_re",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    live, tomb = read_maintained_index_segments(spark, state)
    served = stored_fields_segments(live, tomb or None)
    got = sorted((r["doc"], r["text"]) for r in served.collect())
    assert (3, "tables return") in got and len(got) == 4


def test_more_like_this_and_facets_maintained_parity(spark):
    from esdb_spark.operators.search import (
        build_inverted_index,
        build_positional_index,
        faceted_counts,
        faceted_counts_maintained,
        more_like_this,
        more_like_this_maintained,
    )

    docs = spark.createDataFrame(
        [
            # rare-but-shared terms so MLT has real neighbors: apple
            # (docs 1, 2) and banana (docs 1, 3) are the rarest of
            # doc 1's terms
            (1, "spark data apple banana", "en"),
            (2, "spark data apple", "en"),
            (3, "spark merge banana data", "de"),
            (4, "unrelated words entirely", None),
            (5, "spark data gone", "en"),  # deleted below
        ],
        "doc_id int, text string, lang string",
    )
    surv = docs.filter("doc_id != 5")
    tomb_ids = [docs.filter("doc_id = 5").select(
        F.col("doc_id").alias("doc"))]
    ssegs = [
        build_stored_fields(docs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    stored = stored_fields_segments(ssegs, tomb_ids)
    # MLT: boolean-index segments + content tombstone
    isegs = [
        build_inverted_index(docs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    itomb = [build_inverted_index(docs.filter("doc_id = 5"))]
    got = [
        tuple(r)
        for r in more_like_this_maintained(
            isegs, stored, 1, k=5, max_query_terms=3, tombstones=itomb
        ).collect()
    ]
    want = [
        tuple(r)
        for r in more_like_this(
            surv, 1, k=5, max_query_terms=3
        ).collect()
    ]
    assert got == want and got
    # unknown / deleted source doc -> empty panel, never an error
    assert more_like_this_maintained(
        isegs, stored, 5, tombstones=itomb
    ).count() == 0
    # facets: positional segments + doc-id tombstone, values from the
    # stored store; NULL bucket kept explicit
    psegs = [
        build_positional_index(docs.filter(f"doc_id % 2 = {i}"))
        for i in range(2)
    ]
    gotf = [
        tuple(r)
        for r in faceted_counts_maintained(
            psegs, stored, "spark AND data", ["lang"],
            tombstones=tomb_ids,
        ).collect()
    ]
    wantf = [
        tuple(r)
        for r in faceted_counts(surv, "spark AND data", ["lang"]).collect()
    ]
    assert gotf == wantf and ("lang", "NULL", 1) not in gotf
    # a matched doc missing from the stored store raises
    with pytest.raises(Exception, match="diverged"):
        faceted_counts_maintained(
            psegs, stored.filter("doc != 2"), "spark AND data",
            ["lang"], tombstones=tomb_ids,
        ).collect()


def test_stored_fields_random_maintenance_property(spark):
    # house property pattern: random append/delete splits through the
    # batch faces == build(survivors), value-for-value
    from hypothesis import HealthCheck, given, settings, strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        n=st.integers(min_value=1, max_value=12),
        split=st.integers(min_value=0, max_value=11),
        rm_mask=st.integers(min_value=0, max_value=4095),
    )
    def prop(n, split, rm_mask):
        rows = [(i, f"text {i}", f"l{i % 3}") for i in range(n)]
        docs = spark.createDataFrame(
            rows, "doc_id int, text string, lang string"
        )
        old = docs.filter(F.col("doc_id") <= split)
        new = docs.filter(F.col("doc_id") > split)
        removed = docs.filter(
            F.col("doc_id").isin(
                [i for i in range(n) if (rm_mask >> i) & 1]
            )
        )
        state = build_stored_fields(old)
        if new.count():
            state = update_stored_fields(state, new)
        rm_ids = [i for i in range(n) if (rm_mask >> i) & 1]
        if rm_ids:
            state = delete_stored_fields(state, removed.select("doc_id"))
        survivors = build_stored_fields(
            docs.filter(~F.col("doc_id").isin(rm_ids) if rm_ids
                        else F.lit(True))
        )
        assert _rows(state) == _rows(survivors)

    prop()
