"""Property-based tests: random event workloads vs a pure-Python model
of the reference semantics (ts-desc stable scans, index subsetting,
cursor pagination). Mirrors the reference's lightly-randomized testing
(sst_test.go) but with real property coverage."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

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
