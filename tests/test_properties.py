"""Property-based tests: random event workloads vs a pure-Python model
of the reference semantics (ts-desc stable scans, index subsetting,
cursor pagination). Mirrors the reference's lightly-randomized testing
(sst_test.go) but with real property coverage."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from esdb_spark import Db, Writer
from esdb_spark.stream import EventStream

# A workload: list of (space, grouping, ts_seconds, index_value or None)
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.sampled_from(["", "g", "h"]),
        st.integers(min_value=1, max_value=8),  # small range → many ties
        st.one_of(st.none(), st.sampled_from(["x", "y"])),
    ),
    min_size=1,
    max_size=25,
)


def _model_scan(rows, space, grouping):
    """Reference semantics: ts desc, insertion-stable (SURVEY §2.4)."""
    matching = [
        (i, r) for i, r in enumerate(rows) if r[0] == space and r[1] == grouping
    ]
    ordered = sorted(matching, key=lambda t: (-t[1][2], t[0]))
    return [f"d{i}" for i, _ in ordered]


def _model_index(rows, space, value):
    matching = [
        (i, r) for i, r in enumerate(rows) if r[0] == space and r[3] == value
    ]
    ordered = sorted(matching, key=lambda t: (-t[1][2], t[0]))
    return [f"d{i}" for i, _ in ordered]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
def test_archive_scan_matches_model(spark, tmp_path_factory, rows):
    path = str(tmp_path_factory.mktemp("prop") / "p.esdb")
    w = Writer(spark, path)
    for i, (space, grouping, ts, idx) in enumerate(rows):
        w.add(
            space,
            f"d{i}",
            ts,
            grouping=grouping,
            indexes={"i": idx} if idx is not None else {},
        )
    w.write()
    db = Db.open(spark, path)

    for space in ["a", "b", "c", "zz"]:
        for grouping in ["", "g", "h"]:
            got = [r["data"] for r in db.find(space).scan(grouping).collect()]
            assert got == _model_scan(rows, space, grouping)
        for value in ["x", "y"]:
            got = [
                r["data"] for r in db.find(space).scan_index("i", value).collect()
            ]
            assert got == _model_index(rows, space, value)

    # spaces enumerate ascending, exactly those present
    assert db.spaces() == sorted({r[0] for r in rows})


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(st.text("ab", min_size=1, max_size=3), st.sampled_from(["k1", "k2"])),
        min_size=1,
        max_size=15,
    ),
    page=st.integers(min_value=1, max_value=5),
)
def test_stream_pagination_matches_model(spark, tmp_path_factory, data, page):
    path = str(tmp_path_factory.mktemp("prop_s") / "s.stream")
    s = EventStream.new(spark, path)
    s.write_batch([(d, {k: "v"}) for d, k in data])

    # full iterate = insertion order, via repeated pages
    collected, cursor = [], None
    while True:
        rows, cursor2 = s.iterate_page(cursor=cursor, limit=page)
        if not rows:
            break
        collected += [r["data"] for r in rows]
        cursor = cursor2
    assert collected == [d for d, _ in data]

    # index scan pages = reversed subsequence for each key
    for key in ["k1", "k2"]:
        want = [d for d, k in reversed(data) if k == key]
        got, cursor = [], None
        while True:
            rows, cursor = s.scan_index_page(key, "v", cursor=cursor, limit=page)
            got += [r["data"] for r in rows]
            if cursor is None:
                break
        assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50)), min_size=1, max_size=20
    ),
    right=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50), st.integers(0, 999)),
        min_size=0,
        max_size=20,
    ),
)
def test_asof_join_matches_duckdb_property(spark, left, right):
    """asof_join ≡ DuckDB ASOF LEFT JOIN on arbitrary key/time data
    (ties on right time pre-reduced to keep both engines deterministic)."""
    import datetime as dt

    import duckdb

    from esdb_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(i, k, base + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(left)],
        ["lid", "k", "lts"],
    )
    # reduce right-side ties deterministically (max v per (k, ts))
    reduced = {}
    for k, t, v in right:
        key = (k, t)
        reduced[key] = max(reduced.get(key, -1), v)
    rdf_rows = [
        (k, base + dt.timedelta(minutes=t), v) for (k, t), v in reduced.items()
    ]
    rdf = spark.createDataFrame(rdf_rows or [(99, base, 0)], ["k", "rts", "v"])
    if not rdf_rows:
        rdf = rdf.filter("k < 0")

    got = sorted(
        (r.lid, r.v_r)
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts"
        ).collect()
    )

    con = duckdb.connect()
    con.register("l", ldf.toPandas())
    con.register("r", rdf.toPandas())
    want = sorted(
        (int(lid), None if v is None else int(v))
        for lid, v in con.execute(
            "SELECT lid, v FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.lts >= r.rts"
        ).fetchall()
    )
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12).map(
            lambda ws: " ".join(ws)
        ),
        min_size=2,
        max_size=8,
    )
)
def test_minhash_estimate_tracks_true_jaccard(spark, docs):
    """MinHash estimates converge on true shingle-set Jaccard."""
    from esdb_spark.operators.dedup import (
        minhash_jaccard_estimate,
        minhash_signatures,
    )

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    sigs = minhash_signatures(df, "text", "doc_id", num_hashes=256, shingle_size=2)
    pairs = df.selectExpr("doc_id as id_a").crossJoin(
        df.selectExpr("doc_id as id_b")
    ).filter("id_a < id_b")
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_jaccard_estimate(sigs, pairs).collect()
    }

    def shingles(text):
        toks = text.split()
        if len(toks) < 2:
            return {text}
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    for (a, b), e in est.items():
        sa, sb = shingles(docs[a]), shingles(docs[b])
        true_j = len(sa & sb) / len(sa | sb)
        # 256 hashes → σ ≈ sqrt(J(1-J)/256) ≤ 0.032; allow 5σ
        assert abs(e - true_j) <= 0.16, (docs[a], docs[b], e, true_j)


# ---------------------------------------------------------------------------
# dup_clusters vs a pure-Python union-find on random graphs
# ---------------------------------------------------------------------------

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=20),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=30,
)


def _model_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_dup_clusters_matches_union_find(spark, edges):
    from esdb_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == _model_components(edges)


# ---------------------------------------------------------------------------
# interval_join vs a brute-force pandas reference
# ---------------------------------------------------------------------------

ij_strategy = st.lists(
    st.tuples(
        st.sampled_from(["u", "v"]),
        st.integers(min_value=0, max_value=600),  # seconds
    ),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=ij_strategy, rrows=ij_strategy)
def test_interval_join_matches_bruteforce(spark, lrows, rrows):
    import datetime as dt

    from esdb_spark.operators.asof import interval_join

    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(i, k, ts(s)) for i, (k, s) in enumerate(lrows)],
        ["lid", "k", "ts"],
    )
    right = spark.createDataFrame(
        [(i, k, ts(s)) for i, (k, s) in enumerate(rrows)],
        ["rid", "k", "rts"],
    )
    got = sorted(
        (r.lid, r.rid_r)
        for r in interval_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            lower="-1 minutes", upper="2 minutes", right_cols=["rid"],
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, (lk, ls) in enumerate(lrows)
        for ri, (rk, rs) in enumerate(rrows)
        if lk == rk and ls - 60 <= rs <= ls + 120
    )
    assert got == want


# ---------------------------------------------------------------------------
# winnow_fingerprints vs a pure-Python reference model
# ---------------------------------------------------------------------------

def _model_winnow(text, k=3, w=4):
    import hashlib
    import re

    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    if toks:
        shingles = [
            " ".join(toks[i : i + k]) for i in range(max(len(toks) - k, 0) + 1)
        ]
    else:
        shingles = [""]
    hashes = [hashlib.md5(s.encode()).hexdigest()[:16] for s in shingles]
    mins = [
        min(hashes[i : i + w]) for i in range(max(len(hashes) - w, 0) + 1)
    ]
    return set(mins)


winnow_docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "x"]),
        min_size=0,
        max_size=18,
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=winnow_docs_strategy)
def test_winnow_matches_python_model(spark, texts):
    """The posexplode + lead/min-window formulation must reproduce the
    definitional per-document winnowing (SIGMOD'03) for every token
    count relative to k and w — including empty docs, n<k, n_h<w."""
    from esdb_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {}
    for r in winnow_fingerprints(df, "text", "doc_id", k=3, w=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)
    want = {i: _model_winnow(t) for i, t in enumerate(texts)}
    assert got == want


def test_hash_split_partitions_disjoint_and_stable(spark):
    """Every row gets exactly one label; re-running or repartitioning
    never moves a row between splits; fractions are approximated."""
    from esdb_spark.functions import hash_split
    from pyspark.sql import functions as F

    df = spark.range(20000).select(F.col("id"))
    split = hash_split(F.col("id"), {"train": 0.8, "val": 0.1, "test": 0.1})
    a = df.withColumn("s", split)
    counts = {r.s: r.n for r in a.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20000
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    # stability across repartitioning
    b = df.repartition(7).withColumn("s", split)
    assert a.select("id", "s").exceptAll(b.select("id", "s")).count() == 0


def test_hash_split_zero_bucket_fraction_raises(spark):
    """A non-final fraction too small for the hash resolution must
    raise instead of silently assigning that split zero rows."""
    import pytest

    from esdb_spark.functions import hash_split
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="rounds to zero"):
        hash_split(
            F.col("id"), {"tiny": 0.000005, "train": 0.999995}, prefix_len=4
        )


# --- sequence packing: Spark result == reference python model ---------

pack_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc id
        st.integers(min_value=1, max_value=400),     # size
    ),
    min_size=1,
    max_size=120,
    unique_by=lambda t: t[0],
)


def _pack_model(rows, budget, n_shards):
    """Reference greedy fill, pure python."""
    out = {}
    by_shard = {}
    for doc_id, size in sorted(rows):
        by_shard.setdefault(doc_id % n_shards, []).append((doc_id, size))
    for shard, docs in by_shard.items():
        cur_bin, fill, first = 0, 0, True
        for doc_id, size in docs:
            if not first and fill + size > budget:
                cur_bin += 1
                fill = 0
            first = False
            out[doc_id] = (shard, cur_bin, fill)
            fill += size
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=pack_strategy, budget=st.integers(min_value=100, max_value=800))
def test_pack_greedy_matches_model(spark, rows, budget):
    from esdb_spark.operators.packing import pack_greedy

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["shard"], r["bin"], r["offset"])
        for r in pack_greedy(
            df, "doc_id", "n_tokens", budget=budget, n_shards=4
        ).collect()
    }
    assert got == _pack_model(rows, budget, 4)


# ---------------------------------------------------------------------------
# duplicated-span detection / removal vs the definitional model
# ---------------------------------------------------------------------------


def _model_dup_spans(texts, n, min_count=2):
    from collections import Counter

    toks = {i: t.lower().split() for i, t in enumerate(texts)}
    counts = Counter()
    for tk in toks.values():
        for p in range(len(tk) - n + 1):
            counts[tuple(tk[p : p + n])] += 1
    spans = {}
    for i, tk in toks.items():
        hits = [
            p
            for p in range(len(tk) - n + 1)
            if counts[tuple(tk[p : p + n])] >= min_count
        ]
        out = []
        last = None
        for p in hits:
            if last is not None and p <= last + n:
                s, _e, c = out[-1]
                out[-1] = (s, p + n - 1, c + 1)
            else:
                out.append((p, p + n - 1, 1))
            last = p
        spans[i] = out
    return spans


dup_span_docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
    ).map(" ".join),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=dup_span_docs_strategy)
def test_duplicate_spans_match_python_model(spark, texts):
    """The lead-window gram hashing + gaps-and-islands merge must
    reproduce the definitional duplicated-span computation for every
    corpus shape — short docs, within-doc repeats, adjacent islands."""
    from esdb_spark.operators.corpus import duplicate_ngram_spans

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {}
    for r in duplicate_ngram_spans(df, "text", "doc_id", n=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_grams"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    want = {
        i: sorted(s) for i, s in _model_dup_spans(texts, 3).items() if s
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=dup_span_docs_strategy)
def test_remove_spans_matches_python_model(spark, texts):
    """Detect→rewrite must equal the model: surviving tokens joined by
    single spaces, every document present, removed counts exact."""
    from esdb_spark.operators.corpus import (
        duplicate_ngram_spans,
        remove_spans,
    )

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    spans = duplicate_ngram_spans(df, "text", "doc_id", n=3)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in remove_spans(df, spans, "text", "doc_id").collect()
    }
    model = _model_dup_spans(texts, 3)
    for i, t in enumerate(texts):
        tk = t.lower().split()
        covered = set()
        for s, e, _c in model[i]:
            covered.update(range(s, e + 1))
        kept = [w for p, w in enumerate(tk) if p not in covered]
        assert got[i] == (" ".join(kept), len(covered))


def test_weighted_sample_k_bias_and_determinism(spark):
    """Efraimidis-Spirakis sampling: deterministic across runs, exact
    size k, excludes non-positive weights, and measurably biased
    toward heavy rows (the heavy half must win well over half the
    sample)."""
    from esdb_spark.functions import weighted_sample_k

    rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample_k(df, F.col("id"), F.col("w"), 200, seed="t")
    ids1 = sorted(r["id"] for r in got.collect())
    ids2 = sorted(r["id"] for r in got.collect())
    assert ids1 == ids2
    assert len(ids1) == 200
    heavy = sum(1 for i in ids1 if i % 2 == 0)
    # heavy rows have 100x the weight: expected share ~99%; demand >80%
    assert heavy > 160, heavy

    withzero = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "id long, w double"
    )
    kept = weighted_sample_k(withzero, F.col("id"), F.col("w"), 3, seed="t")
    assert [r["id"] for r in kept.collect()] == [3]


def test_sample_uniform_in_unit_interval(spark):
    from esdb_spark.functions import sample_uniform

    df = spark.range(1000).select(
        sample_uniform(F.col("id"), seed="u").alias("u")
    )
    row = df.agg(F.min("u"), F.max("u"), F.avg("u")).collect()[0]
    assert 0 < row[0] and row[1] <= 1
    assert 0.4 < row[2] < 0.6  # roughly uniform


# --- round 4: parser fuzzing — arbitrary bytes must never crash ---


@settings(max_examples=200, deadline=None)
@given(data=st.binary(max_size=400))
def test_metadata_parsers_never_raise(data):
    """Header parsers return a tuple or None on ANY input — never an
    exception (one corrupt blob among billions must not kill a task)."""
    from esdb_spark.operators.multimodal import (
        parse_image_dims,
        parse_mp4_meta,
        parse_wav_meta,
    )

    for fn in (parse_image_dims, parse_mp4_meta, parse_wav_meta):
        out = fn(data)
        assert out is None or isinstance(out, tuple)


@settings(max_examples=200, deadline=None)
@given(data=st.binary(max_size=400))
def test_metadata_parsers_never_raise_with_magic(data):
    """Same, with valid magics prepended so the walkers actually run."""
    from esdb_spark.operators.multimodal import (
        parse_image_dims,
        parse_mp4_meta,
        parse_wav_meta,
    )

    for magic, fn in [
        (b"\x89PNG\r\n\x1a\n", parse_image_dims),
        (b"\xff\xd8", parse_image_dims),
        (b"GIF89a", parse_image_dims),
        (b"BM", parse_image_dims),
        ((16).to_bytes(4, "big") + b"ftypisom" + bytes(8), parse_mp4_meta),
        (b"RIFF\xff\xff\xff\xffWAVE", parse_wav_meta),
    ]:
        out = fn(magic + data)
        assert out is None or isinstance(out, tuple)


@settings(max_examples=150, deadline=None)
@given(data=st.binary(max_size=300))
def test_pixel_decoders_raise_value_error_or_return(data):
    """Pixel/sample decoders on arbitrary bytes: an array, None, or
    ValueError — never any other exception, never garbage types."""
    import numpy as np

    from esdb_spark.operators.jpeg import decode_jpeg_pixels
    from esdb_spark.operators.multimodal import (
        decode_pixels,
        pcm_signal_stats,
        pcm_spectral_features,
    )

    for payload in (data, b"\xff\xd8" + data, b"\x89PNG\r\n\x1a\n" + data,
                    b"GIF89a" + data, b"BM" + data):
        for fn in (decode_pixels, decode_jpeg_pixels):
            try:
                out = fn(payload)
            except ValueError:
                continue
            assert out is None or isinstance(out, np.ndarray)
    for payload in (data, b"RIFF\x24\x00\x00\x00WAVE" + data):
        for fn in (pcm_signal_stats, pcm_spectral_features):
            out = fn(payload)
            assert out is None or isinstance(out, tuple)


@settings(max_examples=120, deadline=None)
@given(
    pos=st.integers(2, 400),
    val=st.integers(0, 255),
    n_flips=st.integers(1, 8),
    seed=st.integers(0, 2**31),
)
def test_mutated_valid_files_never_crash_decoders(pos, val, n_flips, seed):
    """Byte-flip VALID files (reaches deep decode paths a random blob
    never does): decoders must return pixels/None or raise ValueError
    — nothing else, on every mutation."""
    import numpy as np

    from esdb_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg
    from esdb_spark.operators.multimodal import (
        decode_pixels,
        encode_minimal_mp4,
        encode_png,
        parse_mp4_meta,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (12, 14, 3), dtype=np.uint8)
    fixtures = [
        (bytearray(encode_jpeg(img)), decode_jpeg_pixels),
        (bytearray(encode_png(img)), decode_pixels),
        (bytearray(encode_minimal_mp4(1234, 64, 48)), parse_mp4_meta),
    ]
    for buf, fn in fixtures:
        for _ in range(n_flips):
            p = (pos * 31 + int(rng.integers(0, len(buf)))) % len(buf)
            buf[p] = (buf[p] ^ val) & 0xFF
        try:
            out = fn(bytes(buf))
        except ValueError:
            continue
        assert out is None or isinstance(out, (np.ndarray, tuple))


# ---------------------------------------------------------------------------
# Round-5 operators: interleave / quantize / z-order / merge / linkage
# ---------------------------------------------------------------------------

mix_strategy = st.lists(
    st.tuples(
        st.sampled_from(["w", "c", "m", None]),         # source (incl NULL)
        st.sampled_from([0.5, 1.0, 2.0, 3.0]),          # weight per source
        st.integers(min_value=-1000, max_value=1000),   # id
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[2],
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=mix_strategy)
def test_interleave_matches_python_stride_model(spark, rows):
    """pos is exactly the rank in the (vtime, source, id) total order
    computed by a pure-Python model — same floats, same tie rules.
    Weights are pinned per source (operator contract)."""
    from esdb_spark.operators.packing import interleave_sources

    src_w = {}
    fixed = []
    for s, w, i in rows:
        w = src_w.setdefault(s, w)
        fixed.append((s, w, i))
    df = spark.createDataFrame(fixed, "source string, weight double, doc_id long")
    got = {r["doc_id"]: r["pos"]
           for r in interleave_sources(df, "source", "weight", "doc_id").collect()}
    # model: per-source rank by id, vtime=(k-0.5)/w, sort by
    # (vtime, source NULLS FIRST, id)
    bysrc = {}
    for s, w, i in fixed:
        bysrc.setdefault(s, []).append(i)
    keyed = []
    for s, ids in bysrc.items():
        for k, i in enumerate(sorted(ids), start=1):
            keyed.append(((k - 0.5) / src_w[s], s is None, s or "", i))
    keyed.sort(key=lambda t: (t[0], not t[1], t[2], t[3]))
    want = {i: pos for pos, (_, _, _, i) in enumerate(keyed, start=1)}
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=st.lists(
    st.lists(st.floats(min_value=-1e6, max_value=1e6,
                       allow_nan=False, allow_infinity=False),
             min_size=1, max_size=8),
    min_size=1, max_size=20))
def test_quantize_roundtrip_error_bound_property(spark, vecs):
    """|x - x_hat| <= scale/2 for every element, any magnitudes."""
    from esdb_spark.operators.quantize import dequantize_int8, quantize_int8

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = dequantize_int8(quantize_int8(df, "embedding")).collect()
    for r in out:
        scale = r["q8_scale"]
        for x, xh in zip(r["embedding"], r["vec_hat"]):
            assert abs(x - xh) <= scale / 2 + 1e-9 * max(1.0, abs(x))
        assert all(-127 <= c <= 127 for c in r["q8"])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.tuples(st.integers(min_value=-(2**62), max_value=2**62),
              st.integers(min_value=0, max_value=10**6)),
    min_size=2, max_size=30, unique_by=lambda t: t))
def test_zorder_single_column_monotone_property(spark, vals):
    """With the second column constant, the z-value must be monotone
    NON-DECREASING in the first column — any inversion means the curve
    scrambles range locality (the overflow bug showed exactly as an
    inversion)."""
    from esdb_spark.operators.layout import with_zorder

    rows = [(i, a, 7) for i, (a, _) in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, a long, b long")
    out = with_zorder(df, ["a", "b"], bits=12).collect()
    by_a = sorted(((r["a"], r["zvalue"]) for r in out))
    zs = [z for _, z in by_a]
    assert all(z1 <= z2 for z1, z2 in zip(zs, zs[1:]))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(base=st.lists(st.tuples(st.integers(0, 30), st.text(max_size=4)),
                     min_size=0, max_size=15, unique_by=lambda t: t[0]),
       upd=st.lists(st.tuples(st.integers(0, 30), st.text(max_size=4),
                              st.booleans()),
                    min_size=0, max_size=15, unique_by=lambda t: t[0]))
def test_merge_snapshot_matches_dict_model(spark, base, upd):
    from esdb_spark.operators.versioning import merge_snapshot

    bdf = spark.createDataFrame(base, "doc_id int, text string") \
        if base else spark.createDataFrame([], "doc_id int, text string")
    udf_rows = [(i, t, d) for i, t, d in upd]
    udf = spark.createDataFrame(
        udf_rows, "doc_id int, text string, deleted boolean"
    ) if udf_rows else spark.createDataFrame(
        [], "doc_id int, text string, deleted boolean")
    got = {(r["doc_id"], r["text"])
           for r in merge_snapshot(bdf, udf, "doc_id", "deleted").collect()}
    model = {i: t for i, t in base}
    for i, t, d in upd:
        if d:
            model.pop(i, None)
        else:
            model[i] = t
    assert got == set(model.items())
