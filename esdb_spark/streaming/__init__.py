"""Structured Streaming integration — the reference `stream` package's
live half (SURVEY §2.3, §3.3).

The reference's open stream is an appendable log with an in-memory
tail map (stream/open_stream.go:52-105). In Spark that maps to:

- a **streaming source** over the stream directory
  (:func:`read_event_stream`) — any committed micro-batch append
  becomes visible to the streaming query;
- **foreachBatch appends** (:func:`stream_into`) — the write half:
  an incoming streaming DataFrame is appended to an
  :class:`~esdb_spark.stream.EventStream` with monotone seq, exactly
  the reference's Write loop at micro-batch granularity;
- **live tails** (:func:`tails_query`) — a continuously-updated
  arg-max aggregate replacing the in-memory tail map. The bundled
  helper uses `complete` mode into the memory sink (the sink holds
  the whole map, which IS the tails contract and is bounded by
  distinct index pairs); at scale point the same aggregate at a keyed
  idempotent sink in `update` mode so each batch writes only
  re-written tails;
- **windowed event-rate** (:func:`windowed_counts`) — watermarked
  tumbling-window aggregation, the standard late-data-tolerant rollup
  the reference lacks (its "late" events are simply stored in arrival
  order; with a watermark we get the same permissiveness with bounded
  state).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession, functions as F

from esdb_spark.stream import STREAM_SCHEMA, EventStream


def _instant(events: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks/event-time require an instant-typed TIMESTAMP; parquet
    naive timestamps arrive as TIMESTAMP_NTZ. Interpret the naive wall
    clock AS UTC via epoch micros (truly session-tz independent);
    no-op otherwise.

    NB: ``to_utc_timestamp(ntz, 'UTC')`` would NOT do this — the NTZ
    input is first implicitly cast using the session timezone, making
    the shift an identity and the resulting instants (and thus window
    boundaries) session-tz dependent. ``timestampdiff`` against the
    NTZ epoch is pure wall-clock arithmetic: no timezone enters the
    computation at all (verified identical under UTC and
    America/New_York sessions)."""
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        us = F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
        return events.withColumn(ts_col, F.timestamp_micros(us))
    return events


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming view of a stream directory (new parquet appends become
    micro-batches)."""
    return (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(path)
    )


def stream_into(
    source: DataFrame, stream: EventStream, checkpoint: str
):
    """Continuously append a streaming DataFrame of (data, indexes)
    into an EventStream via foreachBatch.

    foreachBatch alone is at-least-once: a crash between the parquet
    commit and the streaming checkpoint replays the epoch. The handler
    records each applied epoch in an ``_applied_epochs`` ledger inside
    the CHECKPOINT directory — keyed to this query's epoch numbering,
    so a fresh checkpoint (whose epochs restart at 0) starts a fresh
    ledger instead of silently skipping new data, and a second query
    with its own checkpoint appends independently. The ledger also
    survives ``stream.compact()`` (which rewrites the stream dir).

    Exactly-once via two-phase append: each epoch is (1) STAGED — seqs
    assigned, parquet written to ``<checkpoint>/_staged/<epoch>/``, a
    completion marker written last; (2) PROMOTED — each staged file is
    renamed into the stream dir (idempotent: a destination that already
    exists is skipped); (3) LEDGERED; (4) the staged dir is removed. A
    crash in any window replays safely: before the marker the partial
    stage is discarded and rebuilt from the (deterministic) replayed
    batch; after the marker the replay skips straight to the idempotent
    promote, so the earlier round-3 crack — replaying an epoch whose
    append committed but whose ledger line didn't — re-runs file
    renames that no-op instead of appending again. Single writer per
    stream assumed (the reference's contract, open_stream.go)."""
    import os

    from esdb_spark import fs

    spark = stream._spark
    ledger = os.path.join(checkpoint, "_applied_epochs")
    fs.mkdirs(spark, checkpoint)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        # ledger IO goes through the Hadoop FS API (the checkpoint may
        # live on HDFS/S3); one line per epoch, rewritten whole — tiny
        applied: set[str] = set()
        if fs.exists(spark, ledger):
            applied = {
                line.strip()
                for line in fs.read_text(spark, ledger).splitlines()
                if line.strip()
            }
        staged = os.path.join(checkpoint, "_staged", str(epoch_id))
        if str(epoch_id) in applied:
            # replayed epoch → already committed; clear any staging
            # remnant from a crash between ledger write and cleanup
            if fs.exists(spark, staged):
                fs.delete(spark, staged)
            return
        marker = os.path.join(staged, "_STAGED_OK")
        next_seq = None
        if fs.exists(spark, marker):
            # crash after staging completed: the staged files already
            # carry their seqs — do NOT restage (the tail may have
            # moved if some files were promoted before the crash)
            pass
        else:
            if fs.exists(spark, staged):
                fs.delete(spark, staged)  # partial stage → rebuild
            next_seq = stream.stage_dataframe(batch_df, staged)
            fs.touch(spark, marker, "ok")
        stream.promote_staged(staged, next_seq)
        applied.add(str(epoch_id))
        fs.touch(spark, ledger, "\n".join(sorted(applied)) + "\n")
        fs.delete(spark, staged)

    return (
        source.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .start()
    )


def tails_query(source: DataFrame, query_name: str = "tails"):
    """Live tail map: newest seq per (index name, value), continuously
    updated — the streaming replacement for open_stream.go:96-99's
    in-memory map. Results land in the in-memory table ``query_name``."""
    exploded = source.select(
        "seq", "data", F.explode_outer("indexes").alias("name", "value")
    ).filter(F.col("name").isNotNull())
    agg = exploded.groupBy("name", "value").agg(
        F.max("seq").alias("seq"), F.max_by("data", "seq").alias("data")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def sessionize_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
):
    """Custom stateful operator: cross-batch sessionization via
    ``applyInPandasWithState`` (the engine's example of a streaming
    operator Spark's built-ins can't express — reference parity target
    'custom stateful operators' in the north star).

    Emits one row per *closed* session (a new event further than
    ``gap_seconds`` after the previous one closes the open session).
    The open session per key survives between micro-batches in the
    state store: (start_us, last_us, n_events).

    Returns the transformed streaming DataFrame; attach a sink and
    start it from the caller.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("session_start_us", T.LongType()),
            T.StructField("session_end_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: "GroupState"):
        (k,) = key
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed = []
        # collect every Arrow chunk of the group BEFORE sorting — a
        # per-chunk sort would process a multi-chunk group out of time
        # order and mis-split sessions
        chunks = [
            pd.to_datetime(pdf["_ts"]).astype("int64") // 1000 for pdf in pdfs
        ]
        if chunks:
            ts_us = pd.concat(chunks).sort_values()
            for t in ts_us:
                t = int(t)
                if last_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((k, start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    # events are sorted within a batch but not across
                    # batches: a late event must never move last_us
                    # BACKWARD (a regressed tail would let the next
                    # on-time event falsely close the session) — clamp
                    # both edges and absorb the late event
                    start_us = min(start_us, t)
                    last_us = max(last_us, t)
                    n += 1
        state.update((start_us, last_us, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["key", "session_start_us", "session_end_us", "n_events"],
            )

    prepared = events.select(
        F.col(key_col).cast("long").alias("key"), F.col(ts_col).alias("_ts")
    )
    return prepared.groupBy("key").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """Per-key activity sessions via native ``session_window`` (gap
    closes a session): start/end/event-count (+ value sum when given).

    Works in batch and streaming from the same code path; pass
    ``watermark`` when streaming (append mode emits a session once the
    watermark passes its close). Complement to
    :func:`sessionize_stream`, which shows the applyInPandasWithState
    formulation for logic session_window can't express.

    Boundary note: ``session_window`` windows are half-open
    ``[t, t+gap)``, so two events spaced EXACTLY ``gap`` apart start
    separate sessions, whereas a lag-based ``gap > threshold``
    formulation keeps them together — equal on any data without
    exact-gap spacing (microsecond real timestamps), divergent on
    contrived exact boundaries.
    """
    ev = _instant(events, ts_col)
    if watermark:
        ev = ev.withWatermark(ts_col, watermark)
    aggs = [F.count("*").alias("n_events")]
    out_cols = ["n_events"]
    if value_col and value_col in events.columns:
        aggs.append(F.sum(value_col).alias(f"total_{value_col}"))
        out_cols.append(f"total_{value_col}")
    return (
        ev.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *out_cols,
        )
    )


def join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair left rows with
    right rows sharing ``on`` whose ``right_ts`` falls in
    [left_ts, left_ts + within].

    Both sides carry watermarks and the join condition bounds event
    time in both directions, so Spark can expire buffered state — the
    requirement that makes a stream-stream join runnable forever
    (unbounded state otherwise). Right columns come back suffixed
    ``_r``. Outer joins emit null-extended rows only after the
    watermark closes the match window.
    """
    l = _instant(left, left_ts).withWatermark(left_ts, watermark).alias("l")
    r = (
        _instant(right, right_ts)
        .withWatermark(right_ts, watermark)
        .select(
            [F.col(c).alias(c + "_r") for c in right.columns]
        )
        .alias("r")
    )
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}_r"))
        & (F.col(f"r.{right_ts}_r") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}_r")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return l.join(r, cond, how)


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop events whose ``key_cols`` were seen
    within the watermark horizon. State is bounded by the watermark
    (dropDuplicatesWithinWatermark), so it runs forever — the streaming
    face of operators/dedup.dedup_exact."""
    return _instant(events, ts_col).withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(key_cols)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Watermarked tumbling-window counts — the standard streaming
    rollup (append-mode safe: emits a window once the watermark passes
    it). ``value_col`` is summed when present; frames without it (e.g.
    the stream schema) get counts only."""
    aggs = [F.count("*").alias("n")]
    if value_col and value_col in events.columns:
        aggs.append(F.sum(value_col).alias(f"total_{value_col}"))
    return (
        _instant(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(*aggs)
    )


def ewma_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.25,
):
    """Streaming twin of ``grouped.ewma_per_key``: the per-key EWMA
    recurrence continued across micro-batches via
    ``applyInPandasWithState`` — the state store carries one double
    (the running average) per key, so arbitrarily long-lived keys cost
    O(1) state.

    Emits one row per input event: (key, ts_us, value, ewma). Events
    are processed in event-time order WITHIN each micro-batch (sorted
    here); a late event arriving after a later-timestamped event has
    been smoothed is absorbed in arrival order — the recurrence never
    rewrites emitted history (append mode). Batch/stream parity on
    in-order input is asserted in test_streaming.py against the batch
    operator.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    if not 0 < alpha <= 1:
        raise ValueError("ewma_stream: alpha must be in (0, 1]")
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("ewma", T.DoubleType())])
    a = float(alpha)

    def fn(key, pdfs, state: "GroupState"):
        (k,) = key
        prev = state.get[0] if state.exists else None
        chunks = [
            pd.DataFrame(
                {
                    "ts_us": pd.to_datetime(pdf["_ts"]).astype("int64")
                    // 1000,
                    "value": pdf["_v"].astype("float64"),
                }
            )
            for pdf in pdfs
        ]
        if not chunks:
            return
        batch = pd.concat(chunks).sort_values("ts_us", ignore_index=True)
        e = prev
        out = []
        for t, x in zip(batch["ts_us"], batch["value"]):
            x = float(x)
            # same multiply-add order as the batch operator / oracle
            e = x if e is None else a * x + (1.0 - a) * e
            out.append((k, int(t), x, e))
        state.update((e,))
        yield pd.DataFrame(out, columns=["key", "ts_us", "value", "ewma"])

    prepared = events.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def _require_keep_versions(keep_versions: int, caller: str) -> None:
    """Replays recompute from the PREDECESSOR version; keep_versions=1
    lets the same-epoch sweep delete it, so a crash before the
    streaming checkpoint commits would replay the epoch as a FIRST
    epoch and silently rebuild state from one micro-batch (review
    finding, shared by every epoch-versioned store)."""
    # 0 = never sweep (keep everything) — strictly replay-safe and
    # still supported; only 1 is the trap (sweeps the predecessor)
    if keep_versions != 0 and keep_versions < 2:
        raise ValueError(
            f"{caller}: keep_versions must be >= 2 (or 0 to keep every "
            "version) — a replayed epoch recomputes from its "
            "predecessor version"
        )


def _commit_state_version(
    spark, state_path: str, epoch_id: int, new_state: DataFrame,
    keep_versions: int,
) -> None:
    """The shared write-once commit tail of every maintained-state
    store (aggregate and inverted-index): parquet write, THEN the
    commit marker, THEN the sweep — one definition so the commit
    protocol cannot silently diverge between stores."""
    from esdb_spark import fs as _fs

    out = posixpath.join(state_path, f"state-{epoch_id:012d}")
    new_state.write.mode("overwrite").parquet(out)
    # commit marker AFTER the data: a reader never trusts a directory
    # without it (plain touch, not exclusive — a replay
    # deterministically rewrites the same version)
    _fs.touch(spark, posixpath.join(out, _IA_MARKER))
    _sweep_state_versions(spark, state_path, keep_versions)


def maintain_aggregate(
    changes,
    state_path: str,
    keys: list[str],
    measures: list[str],
    op_col: str = "op",
    checkpoint: str | None = None,
    query_name: str = "maintain_aggregate",
    keep_versions: int = 10,
    track_minmax: bool = False,
    allow_negative: bool = False,
    track_distinct: list[str] | None = None,
):
    """Streaming face of :mod:`esdb_spark.operators.incremental`: keep
    a sum/count aggregate continuously maintained from a change-feed
    STREAM, never rescanning any base table.

    State lives at ``state_path`` as write-once numbered parquet
    versions ``state-<epoch id>`` (the release-manifest discipline from
    ``versioning``): each micro-batch reads the newest version with a
    LOWER epoch than its own, folds the batch in with
    ``apply_changes``, and overwrites only its own version. Replays are
    therefore idempotent — a retried epoch recomputes from the same
    predecessor and rewrites the same directory, so a crash between
    write and commit cannot double-apply a delta (the foreachBatch
    at-least-once contract is exactly why state versions key on epoch,
    not on "latest").

    A version counts only once its ``_IA_COMMITTED`` marker lands
    AFTER the parquet write — readers (and the fold itself) skip
    uncommitted directories, so a crash mid-write can never surface a
    partial aggregate as state. After committing, versions older than
    the newest ``keep_versions`` are swept (a long-running stream
    would otherwise accumulate one full |keys|-row snapshot per
    micro-batch forever); correctness needs only the predecessor, the
    tail is replay/forensics headroom.

    Returns the started StreamingQuery; the newest state is
    ``read_maintained_aggregate(spark, state_path)``.
    """
    from esdb_spark.operators.incremental import (
        apply_changes,
        snapshot_aggregate,
    )

    _require_keep_versions(keep_versions, "maintain_aggregate")

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = _newest_state_before(spark, state_path, epoch_id)
        if prev is None:
            # typed empty state derived from the batch itself
            prev = snapshot_aggregate(
                batch_df.filter(F.lit(False)), keys, measures,
                track_minmax=track_minmax, track_distinct=track_distinct,
            )
        new_state = apply_changes(
            prev, batch_df, keys, measures, op_col,
            allow_negative=allow_negative, track_minmax=track_minmax,
            track_distinct=track_distinct,
        )
        _commit_state_version(
            spark, state_path, epoch_id, new_state, keep_versions
        )

    writer = (
        changes.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


_IA_MARKER = "_IA_COMMITTED"


def _committed_state_epochs(spark: SparkSession, state_path: str):
    from esdb_spark import fs as _fs

    if not _fs.exists(spark, state_path):
        return []
    out = []
    for n, is_dir in _fs.list_dir(spark, state_path):
        if not (is_dir and n.startswith("state-")):
            continue
        suffix = n.split("-", 1)[1]
        if not suffix.isdigit():
            continue
        # only COMMITTED versions exist as far as readers are
        # concerned — a crash mid-write leaves a marker-less directory
        # that the next replay of that epoch overwrites
        if _fs.exists(
            spark, posixpath.join(state_path, n, _IA_MARKER)
        ):
            out.append(int(suffix))
    return sorted(out)


def _newest_state_before(spark: SparkSession, state_path: str, epoch_id: int):
    prior = [
        e for e in _committed_state_epochs(spark, state_path) if e < epoch_id
    ]
    if not prior:
        return None
    return spark.read.parquet(
        posixpath.join(state_path, f"state-{prior[-1]:012d}")
    )


def _sweep_state_versions(
    spark: SparkSession, state_path: str, keep_versions: int
) -> None:
    from esdb_spark import fs as _fs

    epochs = _committed_state_epochs(spark, state_path)
    for e in epochs[:-keep_versions] if keep_versions > 0 else []:
        _fs.delete(
            spark, posixpath.join(state_path, f"state-{e:012d}")
        )


def read_maintained_aggregate(
    spark: SparkSession, state_path: str, as_of_epoch: int | None = None
):
    """Newest COMMITTED state version written by
    :func:`maintain_aggregate` (None if nothing committed yet).
    ``as_of_epoch`` time-travels: the newest committed version with
    epoch ≤ that id — the same read-at-version contract
    ``versioning.read_release`` gives corpus releases."""
    bound = (1 << 62) if as_of_epoch is None else as_of_epoch + 1
    return _newest_state_before(spark, state_path, bound)


def maintain_inverted_index(
    docs,
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint: str | None = None,
    query_name: str = "maintain_inverted_index",
    keep_versions: int = 10,
    guard_overlap: bool = True,
):
    """Streaming face of ``search.update_inverted_index``: keep a text
    inverted index continuously maintained from a document-append
    STREAM — the reference's live append-updates-tails contract
    (stream/open_stream.go:52-105) for the corpus index, with the same
    crash-safety discipline as :func:`maintain_aggregate`.

    Each micro-batch tokenizes ONLY its own documents and folds them
    into the previous committed index version (first batch builds from
    scratch); versions are write-once ``state-<epoch>`` parquet
    directories counted only once their ``_IA_COMMITTED`` marker
    lands, so replays are idempotent and readers never see a partial
    index. Probe-measured: a 1% fold costs ~4× less than a rebuild at
    100k docs, and the gap widens with corpus size (SCALE.md round-7
    table). Read the newest committed index with
    :func:`read_maintained_index`; it serves
    ``search.keyword_search_indexed`` directly.

    ``guard_overlap`` (default on) makes a re-delivered document id
    raise instead of double-counting — with foreachBatch's
    at-least-once delivery the epoch-keyed versions already absorb
    whole-batch replays, and the guard catches UPSTREAM duplicates.
    """
    from esdb_spark.operators.search import (
        build_inverted_index,
        update_inverted_index,
    )

    _require_keep_versions(keep_versions, "maintain_inverted_index")

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = _newest_state_before(spark, state_path, epoch_id)
        if prev is None:
            new_state = build_inverted_index(batch_df, text_col, id_col)
        else:
            new_state = update_inverted_index(
                prev, batch_df, text_col, id_col,
                guard_overlap=guard_overlap,
            )
        _commit_state_version(
            spark, state_path, epoch_id, new_state, keep_versions
        )

    writer = (
        docs.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def maintain_doc_lengths(
    changes,
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    op_col: str = "op",
    checkpoint: str | None = None,
    query_name: str = "maintain_doc_lengths",
    keep_versions: int = 10,
):
    """Streaming maintenance for the BM25 doc-lengths side table —
    completing the serving-state story :func:`maintain_inverted_index`
    started: the reference's close-compacts contract seals ALL lookup
    state, not just postings (stream/open_stream.go:146-201), and
    ``bm25_search_indexed`` needs N/avgdl from this table next to the
    index. Before this face the table was maintained by hand (append
    the delta / anti-join removed ids) and a missed step only failed
    at query time; here the discipline is packaged the way
    :func:`maintain_aggregate` packages sums.

    ``changes`` is a document change STREAM carrying ``text_col``,
    ``id_col``, and ``op_col`` ∈ {'insert', 'delete'} (an unknown op
    raises at execution time — ``search.update_doc_lengths`` /
    ``delete_doc_lengths`` do the folding, so a re-appended insert and
    a ghost delete each raise too, per their guards). An id under
    BOTH ops in one batch is CDC-resolved (the r8 ADVICE — a fixed
    insert-before-delete order wedged the common update shape on the
    overlap guard): if the doc is in the previous state it is
    REPLACED (delete folds first, then the insert), and if it is
    brand-new the pair NETS TO ABSENT. State versions follow the
    shared write-once
    ``state-<epoch>`` + ``_IA_COMMITTED`` protocol
    (:func:`_commit_state_version`) — replays recompute from the same
    predecessor and rewrite the same version, so at-least-once
    delivery cannot double-apply. Read with
    :func:`read_maintained_doc_lengths`; pytest asserts the
    maintained index + maintained lengths serve ``bm25_search_indexed``
    bit-exact vs the from-corpus path across an epoch sequence with
    appends AND deletes.

    Scale posture: each fold tokenizes the batch's INSERT rows only
    (one pass over the delta); the delete face is two broadcast
    probes of the state (never a state shuffle); the state parquet
    rewrite is the per-epoch floor every maintained store pays.
    """
    from esdb_spark.operators.search import (
        build_doc_lengths,
        delete_doc_lengths,
        update_doc_lengths,
    )

    _require_keep_versions(keep_versions, "maintain_doc_lengths")

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = _null_safe_op(batch_df, op_col).filter(
            _op_guard(op_col, "maintain_doc_lengths", id_col=id_col)
        )
        ins = batch.filter(F.col(op_col) == "insert")
        rm = batch.filter(F.col(op_col) == "delete").select(
            F.col(id_col).alias("doc")
        )
        prev = _newest_state_before(spark, state_path, epoch_id)
        # Same-batch ids appearing under BOTH ops split two ways (the
        # r8 ADVICE: a naive insert-then-delete order wedges the
        # common CDC update shape — delete old + re-insert same doc in
        # one batch — on update_doc_lengths' overlap guard, raising
        # identically on every replay):
        #   id ∈ prev state  → REPLACE: the delete applies to prev
        #                      first, then the insert folds in
        #   id ∉ prev state  → NET TO ABSENT: an insert+delete pair of
        #                      a brand-new doc drops out entirely
        # Single-op ids keep their guards: an insert of an existing,
        # un-deleted id raises (re-append); a delete of an absent,
        # un-inserted id raises (ghost). All probe frames below are
        # delta-bounded; `prev` is only ever the broadcast-probe side,
        # never shuffled.
        # A both-ops id must be exactly ONE insert + ONE delete (the
        # CDC update / ephemeral-doc shapes). Guarded HERE because the
        # net-to-absent branch would otherwise anti-join duplicated
        # rows away before update_doc_lengths' duplicate-in-delta
        # guard could see them — a feed delivering the same insert
        # twice would commit silently (review finding; maintenance
        # wants LOUD).
        both = (
            ins.groupBy(F.col(id_col).alias("doc"))
            .agg(F.count("*").alias("_mb_i"))
            .join(rm.groupBy("doc").agg(F.count("*").alias("_mb_d")), "doc")
            .filter(
                F.when(
                    (F.col("_mb_i") > 1) | (F.col("_mb_d") > 1),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "maintain_doc_lengths: an id under both "
                                "ops in one batch must be exactly one "
                                "insert + one delete; got "
                            ),
                            F.col("_mb_i").cast("string"),
                            F.lit(" inserts / "),
                            F.col("_mb_d").cast("string"),
                            F.lit(" deletes for doc: "),
                            F.col("doc").cast("string"),
                        )
                    ).cast("boolean"),
                ).otherwise(F.lit(True))
            )
            .select("doc")
        )
        if prev is None:
            net_absent = both
        else:
            present = prev.join(F.broadcast(both), "doc", "left_semi")
            net_absent = both.join(F.broadcast(present), "doc", "left_anti")
        rm_eff = rm.join(F.broadcast(net_absent), "doc", "left_anti")
        ins_eff = ins.join(
            F.broadcast(net_absent.withColumnRenamed("doc", id_col)),
            id_col,
            "left_anti",
        )
        # deletes fold FIRST so a replaced doc is gone before its
        # re-insert meets the overlap guard; an empty removal batch
        # anti-joins nothing and the guard compares 0 == 0 (a local
        # emptiness probe is NOT free on a lazy frame)
        if prev is None:
            # fold the FIRST batch through the update face too (empty
            # base): build_doc_lengths is a plain select with no
            # duplicate-in-delta guard, so a feed delivering the same
            # single-op insert twice in epoch 0 would commit two rows
            # silently — the exact deferred-failure class every later
            # epoch already rejects (second-review finding)
            empty = build_doc_lengths(ins.limit(0), text_col, id_col)
            state = update_doc_lengths(empty, ins_eff, text_col, id_col)
            state = delete_doc_lengths(state, rm_eff, "doc")
        else:
            state = delete_doc_lengths(prev, rm_eff, "doc")
            state = update_doc_lengths(state, ins_eff, text_col, id_col)
        _commit_state_version(
            spark, state_path, epoch_id, state, keep_versions
        )

    writer = (
        changes.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_maintained_doc_lengths(
    spark: SparkSession, state_path: str, as_of_epoch: int | None = None
):
    """Newest COMMITTED lengths version written by
    :func:`maintain_doc_lengths` (None if nothing committed yet);
    ``as_of_epoch`` time-travels. Same versioned-state protocol as the
    aggregate and index stores — delegation, not a copy, so a
    commit-protocol fix lands once."""
    return read_maintained_aggregate(spark, state_path, as_of_epoch)


def read_maintained_index(
    spark: SparkSession, state_path: str, as_of_epoch: int | None = None
):
    """Newest COMMITTED index version written by
    :func:`maintain_inverted_index` (None if nothing committed yet);
    ``as_of_epoch`` time-travels. Same versioned-state protocol as the
    aggregate store, so this IS :func:`read_maintained_aggregate` —
    delegation, not a copy, so a commit-protocol fix lands once."""
    return read_maintained_aggregate(spark, state_path, as_of_epoch)


def _op_guard(op_col: str, caller: str, id_col: str | None = None,
              text_col: str | None = None):
    """ONE definition of the change-feed validation CASE (the
    one-definition discipline of ``_bm25_term_score`` — the guard
    shape has been re-fought enough times that three drifting copies
    would be a liability): a bad op raises; with ``id_col``, a NULL
    id raises (it would bypass every equality-keyed guard downstream
    and can never be deleted); with ``text_col``, a DELETE row with
    NULL text raises — key-only deletes (the common CDC shape) cannot
    subtract postings, so the doc would keep serving forever with no
    guard able to see it (an EMPTY string stays legal: deleting a
    legitimately token-less doc is a correct no-op). All arms live in
    one CASE whose otherwise is True, so no sibling conjunct can
    constraint-propagate a raise arm away."""
    # Callers MUST pass a NON-NULLABLE op column (the _null_safe_op
    # coalesce helper), and split insert/delete on that SAME column.
    # Guarding the raw column cannot work however it is spelled: the
    # downstream `op = 'insert'` split filters make
    # InferFiltersFromConstraints derive isnotnull(op) and push it to
    # the SCAN, below any guard filter — a NULL-op row is dropped
    # before the guard ever sees it (fourth-review regression,
    # empirically confirmed; the deeper form of the
    # constraint-propagation lesson). Over the coalesced column the
    # sentinel fails isin and raises like any bad op.
    guard = F.when(
        ~F.col(op_col).isin("insert", "delete"),
        F.raise_error(
            F.concat(
                F.lit(f"{caller}: bad op (expected insert/delete): "),
                F.col(op_col).cast("string"),
            )
        ).cast("boolean"),
    )
    if id_col is not None:
        guard = guard.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(
                    f"{caller}: NULL {id_col} in the change feed — "
                    "equality-keyed guards and the delete face can "
                    "never match it"
                )
            ).cast("boolean"),
        )
    if text_col is not None:
        # NULL text is rejected on BOTH ops, not only deletes: a
        # NULL-text insert is a legal corpus shape elsewhere, but its
        # faithful delete would necessarily carry NULL text and then
        # be indistinguishable from a key-only delete of a doc that
        # HAS postings (the silent forever-serving hazard) — an
        # asymmetric guard wedges the stream on that legal lifecycle
        # (fourth-review finding). The index change-feed contract is
        # therefore: every row carries text; represent an empty
        # document as '' (which indexes nothing and deletes as a
        # correct no-op).
        guard = guard.when(
            F.col(text_col).isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"{caller}: NULL {text_col} in the change feed — "
                        "the index needs every row's text (a key-only "
                        "delete cannot subtract postings, and a "
                        "NULL-text insert could then never be deleted); "
                        "represent an empty document as ''; "
                        f"{id_col or 'doc'}: "
                    ),
                    (
                        F.col(id_col).cast("string")
                        if id_col
                        else F.lit("?")
                    ),
                )
            ).cast("boolean"),
        )
    return guard.otherwise(F.lit(True))


def _null_safe_op(df: DataFrame, op_col: str) -> DataFrame:
    """Rewrite ``op_col`` as ``coalesce(op, 'NULL')`` so a row missing
    its op reaches :func:`_op_guard` and raises as a bad op instead of
    being dropped by scan-pushed inferred isnotnull filters (see
    _op_guard's contract note). 'NULL' is safe as a sentinel: a feed
    genuinely carrying the string 'NULL' raises identically."""
    return df.withColumn(
        op_col, F.coalesce(F.col(op_col), F.lit("NULL"))
    )


_LSM_MANIFEST = "manifest-"


def _lsm_manifests(spark: SparkSession, state_path: str) -> list[int]:
    from esdb_spark import fs as _fs

    if not _fs.exists(spark, state_path):
        return []
    out = []
    for n, is_dir in _fs.list_dir(spark, state_path):
        if is_dir or not n.startswith(_LSM_MANIFEST):
            continue
        suffix = n[len(_LSM_MANIFEST):]
        if suffix.isdigit():
            out.append(int(suffix))
    return sorted(out)


def _lsm_sweep(
    spark: SparkSession, state_path: str, keep_versions: int
) -> None:
    """Drop manifests beyond the keep window, then segment dirs no
    kept manifest references (a dir referenced by ANY kept manifest —
    incl. the predecessor a replay would need — survives)."""
    from esdb_spark import fs as _fs

    kept = _lsm_manifests(spark, state_path)
    old = kept[:-keep_versions] if keep_versions > 0 else []
    for e in old:
        _fs.delete(
            spark, posixpath.join(state_path, f"{_LSM_MANIFEST}{e:012d}")
        )
    kept = [e for e in kept if e not in old]
    referenced = set()
    for e in kept:
        referenced.update(
            n for _, n in _lsm_read_manifest(spark, state_path, e)
        )
    for n, is_dir in _fs.list_dir(spark, state_path):
        if is_dir and n not in referenced and (
            n.startswith("seg-") or n.startswith("tomb-")
        ):
            _fs.delete(spark, posixpath.join(state_path, n))


def _lsm_read_manifest(
    spark: SparkSession, state_path: str, epoch: int
) -> list[tuple[str, str]]:
    """[(kind, dirname)] with kind ∈ {'live', 'tomb'}."""
    from esdb_spark import fs as _fs

    text = _fs.read_text(
        spark, posixpath.join(state_path, f"{_LSM_MANIFEST}{epoch:012d}")
    )
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line:
            kind, name = line.split(" ", 1)
            out.append((kind, name))
    return out


def _lsm_publish(
    spark: SparkSession,
    state_path: str,
    epoch_id: int,
    entries: list[tuple[str, str]],
    keep_versions: int,
    caller: str,
) -> None:
    """Publish an epoch's manifest — the commit point of every LSM
    maintainer — then sweep versions beyond the keep window. ONE
    definition shared by the boolean and positional maintainers so
    the hard-won protocol fixes land once (the ``_bm25_term_score``
    one-definition discipline).

    The manifest is published ATOMICALLY via temp + rename, never
    created in place: fs.touch makes the file visible (empty) before
    its content lands, so a reader racing the write — or a crash
    mid-write — would see a torn/empty manifest as committed state
    and silently drop segments (review finding). The ".tmp" suffix
    fails the manifest listing's isdigit() check, so an orphaned temp
    is invisible; a replay overwrites it. The target cannot exist
    here: every fold short-circuits on a published epoch and the
    stream is the single writer — so the rename never needs a
    delete-first (whose gap would strand a racing reader). rename
    reports failure as a BOOLEAN — ignoring it would lose the epoch
    silently AND let the same-epoch sweep collect the freshly written
    segment dirs (no manifest references them), while the streaming
    checkpoint commits the batch as done (review finding); raising
    fails the epoch so the replay re-publishes.
    """
    from esdb_spark import fs as _fs

    mpath = posixpath.join(state_path, f"{_LSM_MANIFEST}{epoch_id:012d}")
    _fs.mkdirs(spark, state_path)
    tmp = mpath + ".tmp"
    _fs.touch(
        spark, tmp, "".join(f"{kind} {n}\n" for kind, n in entries)
    )
    if not _fs.rename(spark, tmp, mpath):
        raise IOError(
            f"{caller}: manifest publish failed (rename {tmp} -> {mpath})"
        )
    _lsm_sweep(spark, state_path, keep_versions)


def _write_state_dir(spark, df, out: str, partition_by) -> bool:
    """Write a fold/segment frame to ``out`` (partitioned by
    ``partition_by`` when the frame has those columns) and return
    whether it holds rows — ONE definition for every LSM write
    (review finding: the partitioned-write-plus-emptiness logic had
    drifted into three copies and two of them shipped without the
    empty-frame handling, leaving manifests referencing dirs no
    reader could infer a schema from). The emptiness probe reads back
    under the WRITER's schema (a partitioned write of an empty frame
    leaves no files at all); an empty PARTITIONED result is rewritten
    flat so the dir stays schema-readable if a manifest references it
    (a compaction that deletes everything is legal state, and the
    unpartitioned folds have always referenced their empty output)."""
    w = df.write.mode("overwrite")
    partitioned = partition_by and set(partition_by) <= set(df.columns)
    if partitioned:
        w = w.partitionBy(*partition_by)
    w.parquet(out)
    probe = spark.read.schema(df.schema) if partitioned else spark.read
    non_empty = bool(probe.parquet(out).limit(1).count())
    if partitioned and not non_empty:
        # schema-only empty frame: rewriting from `df` would re-execute
        # the whole fold plan a second time just to produce zero rows
        # (third-review finding)
        spark.createDataFrame([], df.schema).write.mode(
            "overwrite"
        ).parquet(out)
    return non_empty


def _lsm_fold(
    state_path: str,
    caller: str,
    op_col: str | None,
    id_col: str,
    text_col: str | None,
    keep_versions: int,
    compact_above: int,
    build_live,
    build_tombstone,
    compact,
    prepare=None,
    partition_by: list[str] | None = None,
):
    """ONE foreachBatch fold shared by every LSM maintainer (the
    ``_lsm_publish`` one-definition discipline extended to the whole
    epoch protocol — review finding: the boolean and positional folds
    had copy-pasted short-circuit / op-split / emptiness-probe /
    compaction blocks, so the next protocol fix would have to land
    twice or silently diverge). The index-specific pieces plug in:

    - ``build_live(ins)`` → the epoch's live segment DataFrame
    - ``build_tombstone(rm)`` → the epoch's tombstone DataFrame
    - ``compact(live_frames, tomb_frames_or_None)`` → one folded
      segment
    - ``prepare(spark, ins, rm, entries, epoch_id)`` →
      ``(ins, entries)``: optionally rewrite the insert frame with
      execution-time guards and/or the entry list (the positional
      maintainer's self-healing pre-compaction on re-insert of a
      tombstoned id)

    ``partition_by`` partitions segment/compaction writes by the named
    columns WHEN the frame has them (the ANN maintainer's
    cell-partitioned store — live segments carry ``cell``, tombstones
    are bare ids and write flat), preserving the pay-once store's
    partition pruning across maintenance.
    """
    from esdb_spark import fs as _fs

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        mpath = posixpath.join(state_path, f"{_LSM_MANIFEST}{epoch_id:012d}")
        if _fs.exists(spark, mpath):
            # this epoch already PUBLISHED (crash landed between the
            # manifest rename and the checkpoint commit): skip the
            # recompute entirely instead of rewriting referenced
            # segment dirs in place under readers (write.mode
            # 'overwrite' deletes-then-writes — review finding); only
            # the sweep might be unfinished, so just re-run it
            _lsm_sweep(spark, state_path, keep_versions)
            return
        prior = [e for e in _lsm_manifests(spark, state_path) if e < epoch_id]
        entries = (
            _lsm_read_manifest(spark, state_path, prior[-1]) if prior else []
        )
        if op_col is None:
            ins, rm = batch_df, None
        else:
            batch = _null_safe_op(batch_df, op_col).filter(
                _op_guard(op_col, caller, id_col=id_col, text_col=text_col)
            )
            ins = batch.filter(F.col(op_col) == "insert")
            rm = batch.filter(F.col(op_col) == "delete")
        # intra-batch duplicate inserts AND NULL ids, one delta-bounded
        # job (the prepare-probe precedent): build_live's (token, doc)
        # aggregate would silently MERGE two versions of a doc
        # delivered in one batch (third-review finding), and with
        # op_col=None the _op_guard never runs, so a NULL-id insert
        # would otherwise land in a segment where no tombstone can
        # ever match it and the compaction audit poisons every replay
        # (fourth-review finding — the guard belongs HERE, covering
        # all three maintainers, not per-maintainer; it also keeps a
        # two-NULL batch diagnosed as corrupt feed rather than as a
        # "duplicate insert for doc None")
        bad = (
            ins.groupBy(F.col(id_col).alias("_lf_doc"))
            .agg(F.count("*").alias("_lf_c"))
            .filter(F.col("_lf_doc").isNull() | (F.col("_lf_c") > 1))
            .limit(1)
            .collect()
        )
        if bad:
            if bad[0]["_lf_doc"] is None:
                raise ValueError(
                    f"{caller}: NULL {id_col} in the change feed — "
                    "equality-keyed guards and the delete face can "
                    "never match it"
                )
            raise ValueError(
                f"{caller}: duplicate insert for doc "
                f"{bad[0]['_lf_doc']} within one batch — the segment "
                "build would merge both versions into one row"
            )
        if prepare is not None:
            ins, entries = prepare(spark, ins, rm, entries, epoch_id)
        new_entries = list(entries)

        def write_segment(df: DataFrame, dirname: str) -> bool:
            # write unconditionally, then derive emptiness from the
            # WRITTEN parquet (a footer-only probe) — pre-checking
            # with limit(1).count() would re-scan the micro-batch and
            # re-run the op guard as an extra job per epoch (the
            # not-free-on-a-lazy-frame lesson, review finding). An
            # empty dir stays on disk unreferenced until the sweep.
            out = posixpath.join(state_path, dirname)
            return _write_state_dir(spark, df, out, partition_by)

        seg_dir = f"seg-{epoch_id:012d}"
        if write_segment(build_live(ins), seg_dir):
            new_entries.append(("live", seg_dir))
        if rm is not None:
            tomb_dir = f"tomb-{epoch_id:012d}"
            if write_segment(build_tombstone(rm), tomb_dir):
                new_entries.append(("tomb", tomb_dir))
        if len(new_entries) > compact_above:
            live = [
                spark.read.parquet(posixpath.join(state_path, n))
                for kind, n in new_entries
                if kind == "live"
            ]
            tomb = [
                spark.read.parquet(posixpath.join(state_path, n))
                for kind, n in new_entries
                if kind == "tomb"
            ]
            cdir = f"seg-{epoch_id:012d}-c"
            _write_state_dir(
                spark,
                compact(live, tomb or None),
                posixpath.join(state_path, cdir),
                partition_by,
            )
            # referenced even when EMPTY (delete-everything is legal
            # state; the helper leaves an empty dir schema-readable)
            new_entries = [("live", cdir)]
        _lsm_publish(
            spark, state_path, epoch_id, new_entries, keep_versions, caller
        )

    return fold


def maintain_inverted_index_lsm(
    changes,
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    op_col: str | None = None,
    checkpoint: str | None = None,
    query_name: str = "maintain_inverted_index_lsm",
    keep_versions: int = 10,
    compact_above: int = 16,
):
    """The LSM streaming face of the text index — per-epoch cost
    O(delta), not O(index): where :func:`maintain_inverted_index`
    MERGES every micro-batch into one index (rewriting the whole
    index per epoch however small the batch), this face writes each
    batch as a SEGMENT — insert rows become a live segment
    (``build_inverted_index`` over just the batch), delete rows a
    TOMBSTONE segment over their text — and compacts only when the
    segment count crosses ``compact_above`` (default 16: SCALE.md's
    measured knee — serve latency is flat through ~16 segments and
    ~3× the floor at 64). That is the reference's exact economics:
    appends update tails in O(append), close compacts
    (stream/open_stream.go:52-105, 146-201).

    ``op_col=None`` treats every row as an insert (append-only
    stream); with ``op_col``, rows are 'insert'/'delete' (anything
    else raises at execution time). Serving reads the newest
    committed manifest (:func:`read_maintained_index_segments`) and
    answers through ``search.keyword_search_segments(live,
    tombstones=tomb)`` — deletes are visible immediately, no
    compaction on the query path; its integrity guards (ghost /
    duplicate / mismatched tombstone, re-append across live segments)
    apply as-is, so deleting a never-indexed doc or re-appending a
    deleted one without an intervening compaction raises at serve or
    compact time rather than corrupting counts.

    Crash safety follows the manifest pattern (versioning.py's
    release discipline): each epoch writes its segment parquet dirs,
    then one ``manifest-<epoch>`` TEXT file listing every live/tomb
    segment current as of that epoch — the manifest IS the commit
    point, published atomically via temp + rename (never created in
    place, so readers can never see a torn or empty manifest); a
    segment dir no manifest references is invisible.
    Replays recompute from the predecessor manifest and rewrite the
    same dirs + manifest (foreachBatch at-least-once → idempotent).
    Compaction epochs fold all current segments through
    ``search.compact_segments`` into one ``seg-<epoch>-c`` dir and
    publish a manifest listing only it; constituent segments stay on
    disk until they fall out of the ``keep_versions`` manifest window
    (a crash between compact-publish and sweep can therefore never
    double-count — old manifests still see the old world, the new one
    only the compacted segment).
    """
    from esdb_spark.operators.search import (
        build_inverted_index,
        compact_segments,
    )

    _require_keep_versions(keep_versions, "maintain_inverted_index_lsm")
    fold = _lsm_fold(
        state_path,
        "maintain_inverted_index_lsm",
        op_col,
        id_col,
        text_col,
        keep_versions,
        compact_above,
        # a tombstone is the index of the removed docs' text — the
        # content-keyed delete marker the serving union subtracts
        build_live=lambda ins: build_inverted_index(ins, text_col, id_col),
        build_tombstone=lambda rm: build_inverted_index(
            rm, text_col, id_col
        ),
        compact=compact_segments,
    )
    writer = (
        changes.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_maintained_index_segments(
    spark: SparkSession, state_path: str, as_of_epoch: int | None = None
):
    """(live_frames, tombstone_frames) from the newest committed LSM
    manifest (``as_of_epoch`` time-travels; ``([], [])`` if nothing
    committed). For a :func:`maintain_inverted_index_lsm` store, serve
    with ``search.keyword_search_segments(live, tombstones=tomb or
    None)`` and compact by hand with ``search.compact_segments``; for
    a :func:`maintain_positional_index_lsm` store the same manifest
    protocol applies — serve with ``search.phrase_search_segments``
    and compact with ``search.compact_positional_segments`` (there the
    tombstone frames carry doc ids, not postings); for a
    :func:`maintain_ann_store` store likewise — serve with
    ``similarity.ann_search_segments`` (same ``centroids`` the store
    was built with) and compact with
    ``similarity.compact_ann_segments`` (tombstones carry ids).

    The returned DataFrames are LAZY plans over the manifest's segment
    directories — consume them (or ``localCheckpoint()`` first) while
    that manifest is still inside the ``keep_versions`` window: if the
    stream advances ``keep_versions`` more epochs while a caller holds
    the result, the sweep deletes the referenced seg-/tomb- dirs and a
    later action on the stale plan fails (the same sweep-churn caveat
    as the manifest retry loop above, which only protects the manifest
    READ, not later scans)."""
    from esdb_spark import fs as _fs

    bound = (1 << 62) if as_of_epoch is None else as_of_epoch
    entries = None
    # the sweep can delete a manifest between our listing and the
    # read. The sweep removes the OLDEST manifests, so when the newest
    # listed one vanished, every OLDER listed one is gone too —
    # walking backward through the stale listing would return an
    # empty index during the exact race this handles (fourth-review
    # finding). RE-LIST instead: whenever a listed manifest was swept,
    # a newer one exists. Only the anticipated vanished-file case
    # retries — a manifest that still exists but fails to read is a
    # real IO error and surfaces.
    for _attempt in range(5):
        epochs = [e for e in _lsm_manifests(spark, state_path) if e <= bound]
        if not epochs:
            return [], []
        mp = posixpath.join(
            state_path, f"{_LSM_MANIFEST}{epochs[-1]:012d}"
        )
        try:
            entries = _lsm_read_manifest(spark, state_path, epochs[-1])
            break
        except Exception:
            if _fs.exists(spark, mp):
                raise  # real read failure, not a vanished file
    if entries is None:
        raise IOError(
            "read_maintained_index_segments: newest manifest kept "
            "vanishing across 5 re-listings — sweep churn outpaces "
            "the reader (raise keep_versions) or the store is unstable"
        )
    live = [
        spark.read.parquet(posixpath.join(state_path, n))
        for kind, n in entries
        if kind == "live"
    ]
    tomb = [
        spark.read.parquet(posixpath.join(state_path, n))
        for kind, n in entries
        if kind == "tomb"
    ]
    return live, tomb


def _id_keyed_prepare(
    state_path: str,
    caller: str,
    id_col: str,
    key: str,
    compact_fn,
    rm_ids,
    partition_by: list[str] | None = None,
):
    """ONE prepare step shared by every maintainer whose tombstones
    are ID-KEYED (positional index, ANN store — the
    :func:`_lsm_fold` one-definition discipline extended to the
    ordering contract those tombstones impose). An id-keyed tombstone
    nets its id from EVERY segment in the serving union, so a live
    segment written AFTER a tombstone must never contain that id —
    the re-inserted rows would be netted too and the row silently
    vanishes (review finding, reproduced on the positional index when
    old and new text share no query-touched token; the boolean
    maintainer needs none of this — its tombstones are content-keyed
    and cancel only the old rows).

    - CROSS-EPOCH re-insert (the common CDC update: delete in N,
      insert in N+1) SELF-HEALS: when any insert id sits in a current
      tombstone, the prior state folds through ``compact_fn`` first
      (``seg-<epoch>-pre``) — compaction subtracts the tombstones
      from exactly the segments they were written against, after
      which this epoch appends against a tombstone-free state. The
      probe is one delta-bounded broadcast semi count; the compaction
      is the close-compacts payment the re-insert requires anyway
      (second-review finding: raising here was a permanent poison
      pill — the replayed batch re-raised forever and no public API
      could force the compaction).
    - Tombstones with NO live segments means every tombstone is a
      ghost (deletes of never-inserted ids) — corrupted feed,
      fail-stop with the real diagnosis instead of compaction's
      opaque "no segments" (third-review finding). Integrity
      violations stop the stream BY DESIGN; only legal CDC shapes
      self-heal.
    - SAME-BATCH delete+insert splits two ways: a BRAND-NEW id nets
      to absent by construction (its only rows are this epoch's,
      which its own tombstone subtracts — the
      :func:`maintain_doc_lengths` convention); an id already in a
      live segment must raise — one id-keyed tombstone cannot net the
      old rows without also netting the new ones, so the update must
      split across two epochs (where the pre-compaction above heals
      it).

    ``key`` is the tombstone/segment id column name (``doc`` for the
    positional index, ``id`` for the ANN store); ``rm_ids(rm)``
    returns the DISTINCT frame of ids the delete batch actually
    tombstones (the positional maintainer exempts token-less docs);
    ``partition_by`` keeps the pre-compaction write partitioned like
    the maintainer's segments.
    """

    def prepare(spark, ins, rm, entries, epoch_id):
        tomb_entries = [n for kind, n in entries if kind == "tomb"]
        if tomb_entries:
            tomb_ids = None
            for n in tomb_entries:
                t = spark.read.parquet(
                    posixpath.join(state_path, n)
                ).select(key)
                tomb_ids = t if tomb_ids is None else tomb_ids.unionByName(t)
            hit = (
                ins.select(F.col(id_col).alias(key))
                .join(F.broadcast(tomb_ids), key, "left_semi")
                .limit(1)
                .count()
            )
            if hit:
                live = [
                    spark.read.parquet(posixpath.join(state_path, n))
                    for kind, n in entries
                    if kind == "live"
                ]
                if not live:
                    raise ValueError(
                        f"{caller}: state holds only ghost tombstones "
                        f"(deletes of {key}s no live segment ever "
                        "held) and the batch re-inserts one of them — "
                        "the feed is corrupt"
                    )
                tomb = [
                    spark.read.parquet(posixpath.join(state_path, n))
                    for kind, n in entries
                    if kind == "tomb"
                ]
                pre = f"seg-{epoch_id:012d}-pre"
                # unreferenced by any manifest yet → no reader can hold
                # it, so a replay's overwrite is safe (same argument as
                # the epoch's own segment dirs); referenced even when
                # the fold nets to EMPTY (a lone insert-delete-reinsert
                # id folds its prior state to zero rows — review
                # finding, reproduced: the empty partitioned dir was
                # unreadable and poisoned every later serve)
                _write_state_dir(
                    spark,
                    compact_fn(live, tomb or None),
                    posixpath.join(state_path, pre),
                    partition_by,
                )
                entries = [("live", pre)]
        if rm is not None:
            both = (
                ins.select(F.col(id_col).alias(key))
                .distinct()
                .join(rm_ids(rm), key, "left_semi")
            )
            if both.limit(1).count():
                live_ids = None
                for kind, n in entries:
                    if kind != "live":
                        continue
                    d = spark.read.parquet(
                        posixpath.join(state_path, n)
                    ).select(key)
                    live_ids = (
                        d if live_ids is None else live_ids.unionByName(d)
                    )
                if live_ids is not None:
                    poison = both.join(
                        live_ids.distinct(), key, "left_semi"
                    ).select(F.col(key).alias("_pl_tid"))
                    ins = (
                        ins.join(
                            F.broadcast(
                                poison.withColumn("_pl_bad", F.lit(True))
                            ),
                            F.col(id_col) == F.col("_pl_tid"),
                            "left",
                        )
                        .filter(
                            F.when(
                                F.col("_pl_bad").isNotNull(),
                                F.raise_error(
                                    F.concat(
                                        F.lit(
                                            f"{caller}: same-batch "
                                            "delete+insert of a stored "
                                            f"{key} — an id-keyed "
                                            "tombstone would net the "
                                            "new rows too; split the "
                                            "update across two epochs; "
                                            f"{key}: "
                                        ),
                                        F.col(id_col).cast("string"),
                                    )
                                ).cast("boolean"),
                            ).otherwise(F.lit(True))
                        )
                        .drop("_pl_tid", "_pl_bad")
                    )
        return ins, entries

    return prepare


def maintain_positional_index_lsm(
    changes,
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    op_col: str | None = None,
    checkpoint: str | None = None,
    query_name: str = "maintain_positional_index_lsm",
    keep_versions: int = 10,
    compact_above: int = 16,
):
    """The LSM streaming face of the POSITIONAL index — phrase serving
    stays maintained under appends AND deletes, completing the
    maintenance matrix the boolean index got in round 8
    (:func:`maintain_inverted_index_lsm`; the reference's
    append-updates-state + close-compacts discipline,
    stream/open_stream.go:52-105, 146-201). Per-epoch cost is
    O(delta): insert rows become a live segment
    (``search.build_positional_index`` over just the batch — the FLAT
    (token, doc, positions) layout, so no per-token megarow ever
    builds), delete rows a tombstone of DOC IDS ONLY — positional
    deletes are cheaper than boolean ones because a doc's occurrences
    live wholly in its own rows and segments hold disjoint docs, so
    subtraction is an anti-join on doc, no position algebra and no
    tombstone text stored. Compaction folds everything through
    ``search.compact_positional_segments`` above ``compact_above``
    segments (the measured 16-segment knee, SCALE.md).

    The change feed carries the SAME contract as the boolean
    maintainer (``op_col`` ∈ {'insert','delete'}, text on every row,
    NULL id/text raise): the delete row's text is not STORED, but it
    decides whether the doc had any postings — a token-less doc
    ('' text) deletes as a correct no-op instead of writing a ghost
    tombstone that compaction's integrity sweep would (rightly) raise
    on. ``op_col=None`` treats every row as an insert.

    Re-inserting a deleted doc: doc-keyed tombstones net their doc
    from every segment in the serving union, so a post-tombstone
    insert cannot simply append. A CROSS-EPOCH re-insert (the CDC
    update shape: delete in N, insert in N+1) SELF-HEALS — the fold
    pre-compacts the prior state (folding its tombstones away), then
    appends; a SAME-BATCH delete+insert of an indexed doc raises
    (split it across two epochs), while a same-batch insert+delete of
    a brand-new doc nets to absent, matching
    :func:`maintain_doc_lengths`'s convention.

    Serving reads the newest committed manifest
    (:func:`read_maintained_index_segments` — the manifest protocol is
    shared) and answers through ``search.phrase_search_segments(live,
    phrase, tombstones=tomb)``: deletes are visible immediately, no
    compaction on the query path, and the integrity guards (re-append
    across live segments, duplicate tombstone, NULL tombstone id;
    ghost deletes at compaction) apply as-is. Crash safety is the
    shared :func:`_lsm_publish` temp+rename manifest commit; replays
    short-circuit on a published epoch.
    """
    from esdb_spark.functions import tokens
    from esdb_spark.operators.search import (
        build_positional_index,
        compact_positional_segments,
    )

    _require_keep_versions(keep_versions, "maintain_positional_index_lsm")

    prepare = _id_keyed_prepare(
        state_path,
        "maintain_positional_index_lsm",
        id_col,
        "doc",
        compact_positional_segments,
        # only docs that HAVE postings tombstone (the build_tombstone
        # rule below) — the same exemption must apply here or a
        # same-batch delete+insert of a token-less doc would poison a
        # legal shape
        rm_ids=lambda rm: (
            rm.filter(F.size(tokens(text_col)) > 0)
            .select(F.col(id_col).alias("doc"))
            .distinct()
        ),
    )

    fold = _lsm_fold(
        state_path,
        "maintain_positional_index_lsm",
        op_col,
        id_col,
        text_col,
        keep_versions,
        compact_above,
        build_live=lambda ins: build_positional_index(ins, text_col, id_col),
        # ids only — but only of docs that HAVE postings: a token-less
        # doc indexed nothing, so tombstoning it would plant a
        # guaranteed ghost for the compaction sweep
        build_tombstone=lambda rm: (
            rm.filter(F.size(tokens(text_col)) > 0)
            .select(F.col(id_col).alias("doc"))
            .distinct()
        ),
        compact=compact_positional_segments,
        prepare=prepare,
    )
    writer = (
        changes.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def maintain_stored_fields(
    changes,
    state_path: str,
    cols: list[str] | None = None,
    id_col: str = "doc_id",
    op_col: str | None = None,
    checkpoint: str | None = None,
    query_name: str = "maintain_stored_fields",
    keep_versions: int = 10,
    compact_above: int = 16,
):
    """The LSM streaming face of the STORED-FIELDS store
    (:mod:`~esdb_spark.operators.storedfields`) — the reference's
    core competence, serving stored payloads by index
    (space.go:62-108), kept maintained under appends AND deletes as
    the FOURTH store on the shared fold (boolean index, positional
    index, ANN store, and now the payloads themselves). With it the
    whole search stack — boolean/phrase/NEAR matching, ``field:value``
    operands, KWIC snippets, the result page — serves without ever
    re-scanning the corpus frame.

    Per-epoch cost is O(delta): insert rows become a live segment
    (``build_stored_fields`` over just the batch — one row per doc,
    ``cols`` defaulting to every non-id column of the feed minus
    ``op_col``); delete rows become a tombstone of IDS ONLY (a doc is
    one row — key-only deletes are legal here, like the ANN store).
    Compaction folds everything through
    ``storedfields.compact_stored_segments`` above ``compact_above``
    segments (the measured 16-segment knee, SCALE.md).

    Id-keyed tombstones impose the shared ordering contract
    (:func:`_id_keyed_prepare`): a CROSS-EPOCH re-insert (the CDC
    update shape) SELF-HEALS via pre-compaction; a SAME-BATCH
    delete+insert of a stored id raises (split it across two epochs);
    a same-batch insert+delete of a brand-new id nets to absent; a
    re-insert against ghost-only state fail-stops.

    Serving reads the newest committed manifest
    (:func:`read_maintained_index_segments` — the manifest protocol
    is shared across all four stores) and answers through
    ``storedfields.stored_fields_segments(live, tombstones=tomb or
    None, ids=page_ids)`` — a page fetch reads O(k) rows per segment;
    deletes are visible immediately. Crash safety is the shared
    :func:`_lsm_publish` temp+rename manifest commit; replays
    short-circuit on a published epoch.
    """
    from esdb_spark.operators.storedfields import (
        build_stored_fields,
        compact_stored_segments,
    )

    _require_keep_versions(keep_versions, "maintain_stored_fields")

    def build_live(ins):
        names = cols if cols is not None else [
            c for c in ins.columns if c not in (id_col, op_col)
        ]
        return build_stored_fields(ins, id_col, names)

    prepare = _id_keyed_prepare(
        state_path,
        "maintain_stored_fields",
        id_col,
        "doc",
        compact_stored_segments,
        rm_ids=lambda rm: rm.select(F.col(id_col).alias("doc")).distinct(),
    )

    fold = _lsm_fold(
        state_path,
        "maintain_stored_fields",
        op_col,
        id_col,
        None,  # deletes are key-only — no text contract
        keep_versions,
        compact_above,
        build_live=build_live,
        build_tombstone=lambda rm: (
            rm.select(F.col(id_col).alias("doc")).distinct()
        ),
        compact=compact_stored_segments,
        prepare=prepare,
    )
    writer = (
        changes.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def maintain_ann_store(
    changes,
    state_path: str,
    centroids,
    vec_col: str = "vec",
    id_col: str = "doc_id",
    op_col: str | None = None,
    checkpoint: str | None = None,
    query_name: str = "maintain_ann_store",
    keep_versions: int = 10,
    compact_above: int = 16,
):
    """The LSM streaming face of the pay-once ANN store — approximate
    vector search stays maintained under appends AND deletes,
    completing for the VECTOR store the maintenance matrix the boolean
    index got in round 8 and the positional index got this round (the
    reference's append-updates-state + close-compacts discipline,
    stream/open_stream.go:52-105, 146-201, applied to the third and
    last serving store). Per-epoch cost is O(delta): insert rows are
    assigned to cells under the store's FIXED ``centroids`` via
    ``kmeans_assign`` with
    :func:`~esdb_spark.operators.similarity.ann_store_append`-
    equivalent projection-level guards — NULL ids and NULL/wrong-
    dimension vectors raise (a store append that silently drops an
    insert is CDC divergence); duplicate ids are caught by the fold's
    own delta probe, so the append face's aggregate never re-runs
    here — and written as a live segment ``partitionBy("cell")``
    so the probed-cell filter keeps pruning partitions across
    maintenance; delete rows become a tombstone of IDS ONLY (a doc's
    vector is one row, so subtraction is an anti probe — key-only
    deletes are legal here, unlike the text indexes where a delete
    needs the text to decide no-op-ness). Compaction folds everything
    through
    :func:`~esdb_spark.operators.similarity.compact_ann_segments`
    above ``compact_above`` segments (the measured 16-segment knee,
    SCALE.md).

    The change feed carries ``id_col``, ``vec_col`` and optionally
    ``op_col`` ∈ {'insert','delete'}; NULL ids raise; ``op_col=None``
    treats every row as an insert. Id-keyed tombstones impose the
    shared ordering contract (:func:`_id_keyed_prepare`): a
    CROSS-EPOCH re-insert (the CDC update shape) SELF-HEALS via
    pre-compaction; a SAME-BATCH delete+insert of a stored id raises
    (split it across two epochs); a same-batch insert+delete of a
    brand-new id nets to absent; a re-insert against ghost-only state
    fail-stops with the corrupt-feed diagnosis.

    Serving reads the newest committed manifest
    (:func:`read_maintained_index_segments` — the manifest protocol is
    shared across all three stores) and answers through
    ``similarity.ann_search_segments(live, queries, centroids,
    tombstones=tomb or None)``: deletes are visible immediately, no
    compaction on the query path, partition pruning intact, and the
    serving/compaction guards (top-k duplicate, ghost tombstone,
    cross-segment re-append) apply as-is. CENTROIDS NEVER CHANGE under
    maintenance — that is the pay-once contract; what drifts is
    pruning efficiency, not recall (measured, SCALE.md's drift probe),
    and the re-fit policy there says when to rebuild the store from a
    fresh fit instead of appending further. Crash safety is the shared
    :func:`_lsm_publish` temp+rename manifest commit; replays
    short-circuit on a published epoch.
    """
    from esdb_spark.operators.cluster import kmeans_assign
    from esdb_spark.operators.similarity import compact_ann_segments

    _require_keep_versions(keep_versions, "maintain_ann_store")

    def build_live(ins):
        # a projection-level guard, NOT ann_store_append's aggregate:
        # the fold's duplicate-insert probe has already guaranteed one
        # row per id and _op_guard raised on NULL ids, so re-grouping
        # the delta here would add a second shuffling aggregation to
        # every insert epoch for an unreachable arm (review finding).
        # What remains per-row: kmeans_assign marks NULL/wrong-dim
        # vectors with a NULL cell — a store append that silently
        # drops an insert is CDC divergence, so it raises.
        assigned = kmeans_assign(ins, centroids, vec_col, id_col,
                                 keep_vec=True)
        return assigned.filter(
            F.when(
                F.col("id").isNull(),
                # with op_col=None the _op_guard never runs, so the
                # NULL-id ingest guard must live HERE (third-review
                # finding: a NULL-id row would serve forever — no
                # tombstone can match it — and poison the first
                # compaction's audit on every replay)
                F.raise_error(
                    F.lit(
                        "maintain_ann_store: NULL id in the change "
                        "feed — equality-keyed guards and the delete "
                        "face can never match it"
                    )
                ).cast("boolean"),
            )
            .when(
                F.col("cluster").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "maintain_ann_store: NULL or wrong-"
                            "dimension vector in the delta "
                            "(kmeans_assign marked it corrupt); id: "
                        ),
                        F.col("id").cast("string"),
                    )
                ).cast("boolean"),
            )
            .otherwise(F.lit(True))
        ).select("id", "vec", F.col("cluster").cast("int").alias("cell"))

    prepare = _id_keyed_prepare(
        state_path,
        "maintain_ann_store",
        id_col,
        "id",
        compact_ann_segments,
        rm_ids=lambda rm: rm.select(F.col(id_col).alias("id")).distinct(),
        partition_by=["cell"],
    )

    fold = _lsm_fold(
        state_path,
        "maintain_ann_store",
        op_col,
        id_col,
        None,  # no text contract — vec integrity is build_live's guard
        keep_versions,
        compact_above,
        build_live=build_live,
        build_tombstone=lambda rm: (
            rm.select(F.col(id_col).alias("id")).distinct()
        ),
        compact=compact_ann_segments,
        prepare=prepare,
        partition_by=["cell"],
    )
    writer = (
        changes.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()

def maintain_spell_index(
    changes,
    state_path: str,
    token_col: str = "token",
    freq_col: str = "term_freq",
    max_dist: int = 2,
    op_col: str | None = None,
    checkpoint: str | None = None,
    query_name: str = "maintain_spell_index",
    keep_versions: int = 10,
    compact_above: int = 16,
):
    """The LSM streaming face of the SPELL INDEX — "did you mean"
    stays maintained under vocabulary growth AND shrink as the FIFTH
    store on the shared fold (round 11, the r10 verdict's "What's
    missing #2": before this, the variant expansion re-ran over the
    whole vocabulary per serve; now it is pay-once per delta, the
    same discipline as the other four stores).

    The change feed is TOKEN-KEYED vocab CDC: insert rows carry
    ``(token_col, freq_col)`` where the frequency is the token's NEW
    TOTAL; delete rows carry the token (key-only — a token's variant
    rows all die together). Produce the feed from document deltas
    with :func:`~esdb_spark.operators.search.spell_index_upserts`
    against :func:`~esdb_spark.operators.search.spell_segments_vocab`
    of the current state — a frequency CHANGE is the CDC update
    shape: delete the token in epoch N, insert the new total in
    epoch N+1 (the shared :func:`_id_keyed_prepare` contract:
    cross-epoch re-inserts SELF-HEAL via pre-compaction; a same-batch
    delete+insert of a stored token raises; a same-batch
    insert+delete of a brand-new token nets to absent).

    Per-epoch cost is O(delta tokens × L²): insert tokens expand to
    their deletion variants
    (:func:`~esdb_spark.operators.search.build_spell_index` over just
    the batch) as a live segment; deletes become a token tombstone.
    Compaction folds through
    :func:`~esdb_spark.operators.search.compact_spell_segments` above
    ``compact_above`` segments. Serving reads the newest committed
    manifest (:func:`read_maintained_index_segments` — the shared
    protocol) and answers through
    ``search.suggest_terms_segments(live, term, tombstones=tomb or
    None)``: the query word's own variants land as a sargable ``vh``
    in-filter below the segment union, deletes are visible
    immediately, no compaction and NO re-expansion on the query
    path. Crash safety is the shared :func:`_lsm_publish` temp+rename
    manifest commit; replays short-circuit on a published epoch.
    """
    from esdb_spark.operators.search import (
        build_spell_index,
        compact_spell_segments,
    )

    _require_keep_versions(keep_versions, "maintain_spell_index")

    def build_live(ins):
        vocab = ins.select(
            F.col(token_col).alias("token"),
            F.col(freq_col).cast("long").alias("term_freq"),
        )
        # NULL tokens raise inside build via an execution-time guard:
        # with op_col=None the fold's _op_guard never runs, and a
        # NULL-token row could never be tombstoned (the
        # maintain_ann_store NULL-id precedent)
        vocab = vocab.filter(
            F.when(
                F.col("token").isNull(),
                F.raise_error(
                    F.lit(
                        "maintain_spell_index: NULL token in the "
                        "change feed — equality-keyed guards and the "
                        "delete face can never match it"
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
        return build_spell_index(vocab, max_dist=max_dist)

    prepare = _id_keyed_prepare(
        state_path,
        "maintain_spell_index",
        token_col,
        "token",
        compact_spell_segments,
        rm_ids=lambda rm: (
            rm.select(F.col(token_col).alias("token")).distinct()
        ),
    )

    fold = _lsm_fold(
        state_path,
        "maintain_spell_index",
        op_col,
        token_col,
        None,  # key-only deletes — no text contract
        keep_versions,
        compact_above,
        build_live=build_live,
        build_tombstone=lambda rm: (
            rm.select(F.col(token_col).alias("token")).distinct()
        ),
        compact=compact_spell_segments,
        prepare=prepare,
    )
    writer = (
        changes.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
