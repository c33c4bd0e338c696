"""Structured Streaming integration tests (memory sink +
processAllAvailable drive the queries synchronously)."""

import pytest
from pyspark.sql import functions as F

from esdb_spark import EventStream
from esdb_spark.sources.tables import load_table
from esdb_spark.streaming import (
    read_event_stream,
    stream_into,
    tails_query,
    windowed_counts,
)


def test_tails_query_tracks_appends(spark, tmp_path):
    path = str(tmp_path / "s.stream")
    s = EventStream.new(spark, path)
    s.write("v1", {"k": "a"})
    src = read_event_stream(spark, path)
    q = tails_query(src, query_name="t_tails")
    try:
        q.processAllAvailable()
        t1 = {
            (r["name"], r["value"]): r["data"]
            for r in spark.sql("SELECT * FROM t_tails").collect()
        }
        assert t1[("k", "a")] == "v1"
        # live update: a newer event moves the tail
        s.write("v2", {"k": "a"})
        q.processAllAvailable()
        t2 = {
            (r["name"], r["value"]): r["data"]
            for r in spark.sql("SELECT * FROM t_tails").collect()
        }
        assert t2[("k", "a")] == "v2"
    finally:
        q.stop()


def test_stream_into_appends(spark, tmp_path):
    src_path = str(tmp_path / "src.stream")
    dst_path = str(tmp_path / "dst.stream")
    src_stream = EventStream.new(spark, src_path)
    src_stream.write_batch([("a", {"x": "1"}), ("b", {"x": "2"})])
    dst = EventStream.new(spark, dst_path)

    q = stream_into(
        read_event_stream(spark, src_path).select("data", "indexes"),
        dst,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert [r["data"] for r in dst.iterate().collect()] == ["a", "b"]
    assert dst.first("x", "2")["data"] == "b"


def test_windowed_counts_batch_semantics(spark):
    # windowed agg used in batch mode for a deterministic check
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"))
        .agg(F.sum("n").alias("total"))
        .collect()
    )
    assert out[0]["total"] == ev.count()


def test_windowed_counts_streaming(spark, tmp_path):
    # drive the watermarked streaming rollup over the real events table
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    src_dir = str(tmp_path / "events_src")
    ev.write.parquet(src_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(src_dir)
    )
    agg = windowed_counts(stream, window="1 day", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wc_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode emits only watermark-closed windows; with one
        # batch the final windows stay open, so assert the query ran
        # and produced a valid (possibly partial) prefix
        rows = spark.sql("SELECT * FROM wc_out").collect()
        assert all(r["n"] > 0 for r in rows)
    finally:
        q.stop()


def test_sessionize_stream_state_across_batches(spark, tmp_path):
    """The open session must survive between micro-batches (state
    store), and a later far-apart event must close it."""
    import datetime as dt

    from esdb_spark.streaming import sessionize_stream
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src_dir = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")

    def batch(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(
            src_dir
        )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    # batch 1: two events 10 min apart (one open session)
    batch(
        [(1, t0), (1, t0 + dt.timedelta(minutes=10))],
        "overwrite",
    )
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = sessionize_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM sessions_out").count() == 0  # still open

        # batch 2: event 2h later → closes the first session
        batch([(1, t0 + dt.timedelta(hours=2))], "append")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sessions_out").collect()
        assert len(rows) == 1
        session = rows[0]
        assert session["n_events"] == 2
        assert session["session_end_us"] - session["session_start_us"] == 600 * 1_000_000
    finally:
        q.stop()


def test_dedup_stream(spark, tmp_path):
    import datetime as dt

    from esdb_spark.streaming import dedup_stream
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "dd_src")
    spark.createDataFrame(
        [
            (1, "click", t0),
            (1, "click", t0 + dt.timedelta(minutes=1)),  # dup within horizon
            (2, "view", t0),
        ],
        schema,
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = dedup_stream(stream, ["user_id", "event_type"], watermark="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dd_out")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT user_id, event_type FROM dd_out").collect()
        assert sorted((r.user_id, r.event_type) for r in rows) == [
            (1, "click"),
            (2, "view"),
        ]
    finally:
        q.stop()


def test_windowed_counts_drops_late_data(spark, tmp_path):
    """Append-mode watermark semantics: once the watermark passes a
    window, that window's emitted count is final — a later event
    falling into it is dropped, not re-aggregated (the engine's
    bounded-state guarantee; the reference instead stores late events
    in arrival order, SURVEY §2.6)."""
    import datetime as dt

    src_dir = str(tmp_path / "late_src")
    schema = "ts timestamp, event_type string"
    day1 = dt.datetime(2024, 1, 1, 0, 30)
    day5 = dt.datetime(2024, 1, 5, 0, 0)
    batch1 = spark.createDataFrame(
        [(day1, "click"), (day1, "click"), (day5, "click")], schema
    )
    batch1.coalesce(1).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(batch1.schema).parquet(src_dir)
    agg = windowed_counts(
        stream, window="1 day", watermark="1 hour", value_col=None
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # late arrival for the (now watermark-closed) day-1 window
        spark.createDataFrame([(day1, "click")], schema).coalesce(
            1
        ).write.mode("append").parquet(src_dir)
        q.processAllAvailable()
        rows = {
            (r["window"]["start"].date().isoformat(), r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM late_out").collect()
        }
        # the day-1 window closed with the on-time count of 2;
        # the late third click was dropped
        assert rows.get(("2024-01-01", "click")) == 2
    finally:
        q.stop()


def test_join_streams_matches_batch_interval_join(spark, tmp_path):
    """Stream-stream watermarked join over the real events table must
    pair every click with the purchases ≤30min after it — same pairs
    as the batch interval_join on identical inputs."""
    from esdb_spark.operators.asof import interval_join
    from esdb_spark.streaming import join_streams

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch_b = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    want = (
        interval_join(
            clicks_b,
            purch_b.select(
                "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
            ),
            on="user_id",
            left_ts="ts",
            right_ts="p_ts",
            upper="30 minutes",
        )
        .select("event_id", F.col("p_id_r").alias("p_id"))
        .collect()
    )
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks_b.write.parquet(cdir)
    purch_b.write.parquet(pdir)
    cs = spark.readStream.schema(clicks_b.schema).parquet(cdir)
    ps = spark.readStream.schema(purch_b.schema).parquet(pdir)
    joined = join_streams(
        cs, ps, on="user_id", within="30 minutes", watermark="2 hours"
    ).select("event_id", F.col("event_id_r").alias("p_id"))
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT event_id, p_id FROM ss_join").collect()
        assert sorted((r.event_id, r.p_id) for r in got) == sorted(
            (r.event_id, r.p_id) for r in want
        )
    finally:
        q.stop()


def test_session_stats_matches_lag_sessionize(spark):
    """Native session_window sessions (batch path) must count the same
    sessions per user as the lag-window sessionize formulation."""
    from esdb_spark.streaming import session_stats

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    got = {
        r.user_id: r.n
        for r in session_stats(ev, gap="30 minutes")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    from esdb_spark.queries import sessionize_users

    want = {
        r.user_id: r.n_sessions
        for r in sessionize_users(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want


def test_session_stats_streaming_append(spark, tmp_path):
    """The same operator runs as a watermarked streaming query."""
    from esdb_spark.streaming import session_stats

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = session_stats(stream, gap="30 minutes", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_out").collect()
        assert all(r.n_events > 0 and r.session_end > r.session_start for r in rows)
    finally:
        q.stop()


def test_text_operators_compose_with_streaming(spark, tmp_path):
    """The corpus-cleaning projections (strip_html, with_quality,
    redact_pii) are pure column expressions, so the same code path must
    run unchanged inside a streaming query — the micro-batch ingest
    shape of a crawl pipeline."""
    import json

    from esdb_spark.operators.text import redact_pii, strip_html, with_quality

    src_dir = tmp_path / "crawl_in"
    src_dir.mkdir()
    rows = [
        {"doc_id": 1,
         "html": "<html><script>x()</script><p>Hello world, a fine page "
                 "with plenty of the usual words in it</p></html>"},
        {"doc_id": 2,
         "html": "<p>mail me at someone@example.com for the details</p>"},
    ]
    batch = spark.createDataFrame(
        [(r["doc_id"], r["html"]) for r in rows], ["doc_id", "html"]
    )
    batch.write.mode("overwrite").parquet(str(src_dir))

    stream = spark.readStream.schema("doc_id long, html string").parquet(
        str(src_dir)
    )
    cleaned = redact_pii(
        with_quality(strip_html(stream, "html", "text"), "text"),
        "text",
    ).select("doc_id", "text", "quality_score")
    q = (
        cleaned.writeStream.outputMode("append")
        .format("memory")
        .queryName("crawl_clean")
        .start()
    )
    try:
        q.processAllAvailable()
        out = {
            r["doc_id"]: r
            for r in spark.sql("SELECT * FROM crawl_clean").collect()
        }
    finally:
        q.stop()
    assert len(out) == 2
    assert "x()" not in out[1]["text"] and "Hello world" in out[1]["text"]
    assert "[REDACTED]" in out[2]["text"]  # email scrubbed
    assert 0.0 <= out[1]["quality_score"] <= 1.0


def test_ewma_stream_matches_batch_operator(spark, tmp_path):
    """Cross-batch EWMA state: feeding the same in-order events in two
    micro-batches must produce exactly the batch operator's values."""
    import datetime as dt

    from esdb_spark.operators.grouped import ewma_per_key
    from esdb_spark.streaming import ewma_stream
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src_dir = str(tmp_path / "ewma_src")
    ckpt = str(tmp_path / "ewma_ckpt")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (u, t0 + dt.timedelta(minutes=i), float((i * 7 + u) % 13))
        for u in (1, 2)
        for i in range(8)
    ]
    first, second = rows[:8], rows[8:]

    spark.createDataFrame(first, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        ewma_stream(stream, alpha=0.25)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ewma_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(second, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        q.processAllAvailable()
        got = {
            (r["key"], r["ts_us"]): r["ewma"]
            for r in spark.sql("SELECT * FROM ewma_out").collect()
        }
    finally:
        q.stop()

    batch_df = spark.createDataFrame(rows, schema)
    want = {
        (r["user_id"], int(r["ts"].timestamp() * 1_000_000)): r["ewma"]
        for r in ewma_per_key(
            batch_df, "user_id", ["ts"], "value", 0.25
        ).collect()
    }
    assert len(got) == 16
    assert got == want  # bit-exact: same recurrence, same op order


def test_stream_into_replay_guard_reads_ledger(spark, tmp_path):
    """The exactly-once ledger must actually be READ: pre-marking
    epoch 0 as applied means the first micro-batch is a replay and
    must be skipped. (A broken read_text made the applied set empty
    and the guard never fired.)"""
    from esdb_spark import fs
    from esdb_spark.stream import EventStream
    from esdb_spark.streaming import read_event_stream, stream_into

    src_path = str(tmp_path / "src.stream")
    dst_path = str(tmp_path / "dst.stream")
    EventStream.new(spark, src_path).write_batch([("a", {"x": "1"})])
    dst = EventStream.new(spark, dst_path)
    ckpt = str(tmp_path / "ckpt")
    fs.mkdirs(spark, ckpt)
    fs.touch(spark, ckpt + "/_applied_epochs", "0\n")

    q = stream_into(
        read_event_stream(spark, src_path).select("data", "indexes"),
        dst,
        checkpoint=ckpt,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # epoch 0 was marked applied → its batch must NOT be re-appended
    assert dst.iterate().count() == 0


def test_two_phase_append_promote_is_idempotent(spark, tmp_path):
    """Crash between promote and ledger (the round-3 crack): replaying
    the promote must re-run file renames that no-op, never re-append."""
    from esdb_spark import fs

    st = EventStream.new(spark, str(tmp_path / "s.stream"))
    df = spark.createDataFrame(
        [("a", {}), ("b", {}), ("c", {})], "data string, indexes map<string,string>"
    )
    staged = str(tmp_path / "cp" / "_staged" / "0")
    next_seq = st.stage_dataframe(df, staged)
    assert next_seq == 3
    assert st.df.count() == 0  # staged, not published
    fs.touch(spark, staged + "/_STAGED_OK", "ok")

    st.promote_staged(staged, next_seq)
    assert st.df.count() == 3
    # crash happened before the ledger write → the handler replays the
    # promote (marker exists, so no restage); must be a no-op
    st.promote_staged(staged, None)
    rows = st.df.collect()
    assert len(rows) == 3
    assert sorted(r["seq"] for r in rows) == [0, 1, 2]  # dense, no dupes
    # tail re-scan path (next_seq=None) still appends after the batch
    assert st.write("d") == 3


def test_two_phase_append_partial_promote_resumes(spark, tmp_path):
    """Crash mid-promote: some files renamed, some still staged — the
    replay must move only the remainder."""
    from esdb_spark import fs

    st = EventStream.new(spark, str(tmp_path / "s.stream"))
    df = spark.createDataFrame(
        [("x%d" % i, {}) for i in range(8)],
        "data string, indexes map<string,string>",
    ).repartition(4)  # several part files
    staged = str(tmp_path / "cp" / "_staged" / "0")
    # AQE would coalesce this tiny batch to one file — keep 4 so the
    # mid-promote crash actually leaves a remainder behind
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        st.stage_dataframe(df, staged)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    parts = [n for n, d in fs.list_dir(spark, staged) if n.endswith(".parquet")]
    assert len(parts) >= 2
    # simulate a crash after ONE file was promoted
    fs.rename(spark, staged + "/" + parts[0], str(tmp_path / "s.stream" / parts[0]))
    st.promote_staged(staged, None)
    rows = st.df.collect()
    assert len(rows) == 8
    assert sorted(r["seq"] for r in rows) == list(range(8))


def test_events_page_served_from_streamed_stores(spark, tmp_path):
    """Round 12: the events maintained page end-to-end through the
    STREAMING maintainers — event-payload CDC (insert epoch, then a
    delete epoch) folds into the positional and stored-fields LSM
    stores via their streaming faces, and search_page_maintained over
    the streamed state equals the corpus-face page over the surviving
    textualized events. The batch catalog row
    (events_search_page_maintained) certifies the same serve from
    batch-built segments; this test certifies the stores ARRIVE at
    that state through foreachBatch epochs."""
    from pyspark.sql import functions as F

    from esdb_spark.operators.search import (
        search_page,
        search_page_maintained,
    )
    from esdb_spark.operators.storedfields import stored_fields_segments
    from esdb_spark.queries import _events_textualized
    from esdb_spark.streaming import (
        maintain_positional_index_lsm,
        maintain_stored_fields,
        read_maintained_index_segments,
    )

    txt = _events_textualized(spark, "/root/testdata/sf0.001")
    src = str(tmp_path / "chg")
    pstate, sstate = str(tmp_path / "pos"), str(tmp_path / "sf")
    pck, sck = str(tmp_path / "pck"), str(tmp_path / "sck")
    schema = "doc_id bigint, text string, event_type string, op string"
    epochs = [
        txt.withColumn("op", F.lit("insert")),
        txt.filter(F.col("doc_id") % 7 == 0).withColumn(
            "op", F.lit("delete")
        ),
    ]
    for i, ep in enumerate(epochs):
        mode = "overwrite" if i == 0 else "append"
        ep.coalesce(1).write.mode(mode).json(src)
        for maint, state, ck in (
            (
                lambda s: maintain_positional_index_lsm(
                    s, pstate, op_col="op", checkpoint=pck,
                    query_name=f"evp_{i}",
                ),
                pstate,
                pck,
            ),
            (
                lambda s: maintain_stored_fields(
                    s, sstate, cols=["text", "event_type"], op_col="op",
                    checkpoint=sck, query_name=f"evs_{i}",
                ),
                sstate,
                sck,
            ),
        ):
            stream = spark.readStream.schema(schema).json(src)
            q = maint(stream)
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    plive, ptomb = read_maintained_index_segments(spark, pstate)
    slive, stomb = read_maintained_index_segments(spark, sstate)
    stored = stored_fields_segments(slive, stomb or None)
    query = "event_type:purchase AND k4* AND NOT u3"
    got = [
        tuple(r)
        for r in search_page_maintained(
            plive, stored, query, k=10, window=3,
            tombstones=ptomb or None,
        ).collect()
    ]
    want = [
        tuple(r)
        for r in search_page(
            txt.filter(F.col("doc_id") % 7 != 0), query, k=10, window=3
        ).collect()
    ]
    assert got == want and got
