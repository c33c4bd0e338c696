"""Port of the reference's table-driven space/index tests
(/root/reference/esdb_test.go:69-110, space_test.go)."""

import pytest

from conftest import build_letters_db


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("letters") / "test.esdb")
    return build_letters_db(spark, path)


def _data(df):
    return [r["data"] for r in df.collect()]


# esdb_test.go:77-85 — 8 cases incl. empty-value index, missing value,
# missing space.
@pytest.mark.parametrize(
    "space,index,value,want",
    [
        ("a", "ts", "", ["2", "1", "3"]),
        ("a", "i", "i1", ["1", "3"]),
        ("a", "i", "i2", ["2"]),
        ("b", "ts", "", ["4", "6", "5"]),
        ("b", "i", "i1", ["4", "6", "5"]),
        ("b", "i", "i2", []),
        ("b", "i", "i3", []),
        ("c", "ts", "", []),
    ],
)
def test_space_indexes(db, space, index, value, want):
    assert _data(db.find(space).scan_index(index, value)) == want


# space_test.go grouping scans
@pytest.mark.parametrize(
    "space,grouping,want",
    [
        ("a", "g", ["1"]),
        ("a", "h", ["2"]),
        ("a", "i", ["3"]),
        ("b", "g", ["4"]),
        ("b", "h", ["5"]),
        ("b", "i", ["6"]),
        ("a", "missing", []),
        ("c", "g", []),
    ],
)
def test_groupings(db, space, grouping, want):
    assert _data(db.find(space).scan(grouping)) == want


def test_space_iteration(db):
    # esdb_test.go:97-110 — ascending key order
    assert db.spaces() == ["a", "b"]

    found = []
    db.iterate(lambda s: (found.append(s.id), True)[1])
    assert found == ["a", "b"]

    # early stop
    found = []
    db.iterate(lambda s: (found.append(s.id), False)[1])
    assert found == ["a"]


def test_grouping_iteration(db):
    # space_test.go:95-108 — groupings in ascending order
    assert db.find("a").iterate() == ["g", "h", "i"]

    seen = []
    db.find("a").iterate(lambda g: (seen.append(g), len(seen) < 2)[1])
    assert seen == ["g", "h"]


def test_rev_scans(db):
    assert _data(db.find("b").rev_scan_index("i", "i1")) == ["5", "6", "4"]
    assert _data(db.find("a").rev_scan("g")) == ["1"]
