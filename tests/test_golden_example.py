"""Port of the reference's golden end-to-end example
(/root/reference/example_test.go:16-115) — the de-facto semantic spec:
ts-desc scan order, insertion-order ties, index subsetting."""

from esdb_spark import Db

from conftest import build_activity_writer


def _data(df):
    return [r["data"] for r in df.collect()]


def test_golden_example(spark, tmp_archive):
    writer = build_activity_writer(spark, tmp_archive)
    writer.write()
    db = Db.open(spark, tmp_archive)

    # activity for 1 (example_test.go:97-102): ts-desc; the two ts
    # 1403534923 events keep insertion order (purchase before thankyou).
    assert _data(db.find("1").scan("")) == [
        '{"total":"42.99"}',
        '{"url":"http://mysite.com/thankyou"}',
        '{"url":"http://mysite.com/checkout"}',
        '{"button_text":"Checkout"}',
        '{"url":"http://mysite.com/"}',
    ]

    # activity for 2 (example_test.go:104-107)
    assert _data(db.find("2").scan("")) == [
        '{"url":"http://mysite.com/about"}',
        '{"button_text":"About"}',
        '{"url":"http://mysite.com/"}',
    ]

    # purchases for 1 (example_test.go:109-110)
    assert _data(db.find("1").scan_index("type", "purchase")) == [
        '{"total":"42.99"}'
    ]

    # clicks for 3 (example_test.go:112-114)
    assert _data(db.find("3").scan_index("type", "click")) == [
        '{"button_text":"Checkout"}',
        '{"button_text":"About"}',
    ]


def test_golden_example_callback_early_stop(spark, tmp_path):
    writer = build_activity_writer(spark, str(tmp_path / "a.esdb"))
    writer.write()
    db = Db.open(spark, str(tmp_path / "a.esdb"))

    seen = []

    def scanner(row):
        seen.append(row["data"])
        return len(seen) < 2  # Scanner-false stops the scan (space.go:14)

    db.find("1").scan_foreach(scanner)
    assert seen == ['{"total":"42.99"}', '{"url":"http://mysite.com/thankyou"}']

    # limit=N matches the first N of the full ordering
    limited = [r["data"] for r in db.find("1").scan("", limit=2).collect()]
    assert limited == seen
