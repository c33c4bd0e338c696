"""Stream semantics: append, index scans newest→oldest, full iterate
oldest→newest, continuation cursors, tails, close/seal, merge.
Mirrors /root/reference/stream/open_stream_test.go:89-256,
closed_stream_test.go, merge_stream_test.go:34-92 (fixture F4)."""

import pytest

from esdb_spark import DbExistsError, EventStream, StreamClosedError, merge_streams


def _populate(stream, suffix=""):
    # open_stream_test.go fixture: three events with overlapping indexes.
    stream.write("abc" + suffix, {"a": "a", "b": "b", "c": "c"})
    stream.write("cde" + suffix, {"c": "c", "d": "d", "e": "e"})
    stream.write("def" + suffix, {"d": "d", "e": "e", "f": "f"})


def _data(df):
    return [r["data"] for r in df.collect()]


def test_new_errors_if_exists(spark, tmp_path):
    path = str(tmp_path / "s.stream")
    EventStream.new(spark, path)
    with pytest.raises(DbExistsError):
        EventStream.new(spark, path)


def test_scan_index_newest_first(spark, tmp_path):
    s = EventStream.new(spark, str(tmp_path / "s.stream"))
    _populate(s)
    # open_stream_test.go:123-137: c:c → ["cde","abc"] newest→oldest
    assert _data(s.scan_index("c", "c")) == ["cde", "abc"]
    assert _data(s.scan_index("a", "a")) == ["abc"]
    assert _data(s.scan_index("e", "e")) == ["def", "cde"]
    assert _data(s.scan_index("nope", "x")) == []


def test_first(spark, tmp_path):
    s = EventStream.new(spark, str(tmp_path / "s.stream"))
    _populate(s)
    assert s.first("c", "c")["data"] == "cde"
    assert s.first("a", "a")["data"] == "abc"
    assert s.first("zz", "zz") is None


def test_iterate_oldest_first_and_cursor(spark, tmp_path):
    s = EventStream.new(spark, str(tmp_path / "s.stream"))
    _populate(s)
    # open_stream_test.go:206 — insertion order
    assert _data(s.iterate()) == ["abc", "cde", "def"]

    # continuation: page of 2, resume, then exhausted cursor stays valid
    rows, cursor = s.iterate_page(limit=2)
    assert [r["data"] for r in rows] == ["abc", "cde"]
    rows, cursor2 = s.iterate_page(cursor=cursor, limit=2)
    assert [r["data"] for r in rows] == ["def"]
    # cursor survives across appends (open_stream_test.go:226-256)
    s.write("xyz", {"a": "a"})
    rows, _ = s.iterate_page(cursor=cursor2, limit=10)
    assert [r["data"] for r in rows] == ["xyz"]


def test_scan_index_pagination(spark, tmp_path):
    s = EventStream.new(spark, str(tmp_path / "s.stream"))
    _populate(s)
    rows, cursor = s.scan_index_page("e", "e", limit=1)
    assert [r["data"] for r in rows] == ["def"]
    assert cursor is not None
    rows, cursor = s.scan_index_page("e", "e", cursor=cursor, limit=5)
    assert [r["data"] for r in rows] == ["cde"]
    assert cursor is None  # exhausted → None (reference 0-offset sentinel)


def test_reopen_rebuilds_tail(spark, tmp_path):
    # open_stream_test.go:258-425 — reopen sees all committed events and
    # appends continue after the rebuilt tail.
    path = str(tmp_path / "s.stream")
    s = EventStream.new(spark, path)
    _populate(s)
    s2 = EventStream.open(spark, path)
    assert _data(s2.iterate()) == ["abc", "cde", "def"]
    s2.write("ghi", {"a": "a"})
    assert _data(s2.scan_index("a", "a")) == ["ghi", "abc"]


def test_close_seals_stream(spark, tmp_path):
    path = str(tmp_path / "s.stream")
    s = EventStream.new(spark, path)
    _populate(s)
    s.close()
    assert s.closed
    # reads still work, identical results (closed_stream_test.go:31-64)
    assert _data(s.scan_index("c", "c")) == ["cde", "abc"]
    assert s.first("d", "d")["data"] == "def"
    # writes error (closed_stream_test.go:154-161)
    with pytest.raises(StreamClosedError):
        s.write("nope", {})
    # auto-detection on open (stream.go:54-72)
    assert EventStream.open(spark, path).closed


def test_tails(spark, tmp_path):
    s = EventStream.new(spark, str(tmp_path / "s.stream"))
    _populate(s)
    tails = {(r["name"], r["value"]): r["data"] for r in s.tails().collect()}
    assert tails[("c", "c")] == "cde"
    assert tails[("d", "d")] == "def"
    assert tails[("a", "a")] == "abc"


def test_merge(spark, tmp_path):
    # merge_stream_test.go:34-92 — concatenation in stream order, NOT
    # timestamp-interleaved; merged indexes preserved; result is closed.
    paths = []
    for name in ["one", "two", "three"]:
        p = str(tmp_path / f"{name}.stream")
        s = EventStream.new(spark, p)
        _populate(s, suffix=name)
        s.close()
        paths.append(p)

    dest = merge_streams(spark, str(tmp_path / "merged.stream"), paths)
    assert dest.closed
    assert _data(dest.iterate()) == [
        "abcone", "cdeone", "defone",
        "abctwo", "cdetwo", "deftwo",
        "abcthree", "cdethree", "defthree",
    ]
    # index scan across the merged stream: newest→oldest across sources
    assert _data(dest.scan_index("a", "a")) == ["abcthree", "abctwo", "abcone"]
