"""Incremental corpus versioning: snapshot MERGE (upsert + delete)
and change accounting.

A training corpus is rebuilt continuously — recrawls update documents,
takedowns delete them, new sources append. The reference engine is
append-only (writer.go builds immutable archives; nothing in its
surface rewrites), so this is a §2.7 pipeline operator with no
reference analog: the MERGE INTO shape (warehouse upsert) applied to
corpus snapshots, composing with the incremental-dedup operators
(``corpus.dedup_against``, ``bloom.dedup_against_bloom``) that decide
WHAT goes into the update set.

Semantics are deliberately engine-portable (exact DuckDB oracle):

- ``merge_snapshot``: updates-wins upsert. A base row survives iff its
  id is absent from the updates; update rows marked deleted remove the
  id entirely; everything else from the updates enters as-is. With a
  ``version_col``, the max-version update row wins per id (ties break
  to the LARGEST row hash, so the result is a pure function of the
  data, never of partitioning).
- ``merge_stats``: the change summary a pipeline logs per corpus
  release — added / updated / unchanged / deleted counts, where
  "unchanged" is decided by an md5 row fingerprint over the compared
  columns (portable across engines).

Scale: one hash shuffle per side on the id (SMJ/anti-join); Catalyst
broadcasts the updates when small — the common incremental case: a
day's recrawl against a 100 TB base never moves the base. Neither
function collects anything; stats output is 1 row.

Both are plain DataFrame transforms, so they compose with Structured
Streaming unchanged: fold micro-batched update streams into
successive snapshots with ``foreachBatch`` + :func:`merge_snapshot`
(continuous corpus releases — tested in
``test_versioning.py::test_streaming_release_folding``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _row_fp(cols: list[str]) -> "F.Column":
    """Portable row fingerprint: md5 of the '|'-joined PER-FIELD md5s.
    Each field is hashed first so the outer join is over fixed-width
    tokens — a raw '|'-join is ambiguous across field boundaries
    (('a|b','c') and ('a','b|c') would collide, and '|' is ordinary in
    url/text columns). NULLs get an explicit sentinel (concat_ws
    silently drops NULLs, which would collide ('a', NULL) with
    ('a', ''))."""
    parts = [
        F.md5(F.coalesce(F.col(c).cast("string"), F.lit("\x00null")))
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *parts))


def merge_snapshot(
    base: DataFrame,
    updates: DataFrame,
    id_col: str,
    deleted_col: str | None = None,
    version_col: str | None = None,
) -> DataFrame:
    """Next corpus snapshot: ``updates`` rows replace same-id ``base``
    rows, deleted ids drop out, new ids append. Returns ``base``'s
    columns exactly.

    ``updates`` may carry multiple rows per id only when
    ``version_col`` is given (max version wins; ties by row
    fingerprint, so the winner is data-deterministic). ``deleted_col``
    (boolean) marks tombstones — a deleted winner removes the id even
    if older update rows also touched it. NULL ``deleted_col`` means
    not deleted; a NULL id is rejected nowhere but matches only NULL
    ids via the anti-join's null-safe semantics below.
    """
    out_cols = list(base.columns)
    for c in [id_col, *([deleted_col] if deleted_col else []),
              *([version_col] if version_col else [])]:
        if c not in updates.columns:
            raise ValueError(f"merge_snapshot: updates missing column {c!r}")
    upd = updates
    if version_col is not None:
        # one winner per id: greatest (version, fingerprint) — the
        # fingerprint tiebreak keeps the result a pure function of the
        # data when two update rows share the max version
        payload_cols = [c for c in upd.columns]
        winner_key = F.struct(
            F.col(version_col).alias("v"),
            _row_fp(payload_cols).alias("fp"),
        )
        upd = (
            upd.groupBy(id_col)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in upd.columns if c != id_col]),
                    winner_key,
                ).alias("_w")
            )
            .select(
                id_col,
                *[
                    F.col(f"_w.{c}").alias(c)
                    for c in upd.columns
                    if c != id_col
                ],
            )
        )
    # base rows whose id the updates touch (update OR tombstone) drop;
    # null-safe so a NULL-id update row shadows NULL-id base rows
    # rather than silently keeping both
    upd_ids = upd.select(F.col(id_col).alias("_mid")).distinct()
    kept = base.join(
        upd_ids, base[id_col].eqNullSafe(upd_ids["_mid"]), "left_anti"
    )
    live = upd
    if deleted_col is not None:
        live = live.filter(
            ~F.coalesce(F.col(deleted_col), F.lit(False))
        )
    missing = [c for c in out_cols if c not in live.columns]
    if missing:
        raise ValueError(
            f"merge_snapshot: updates missing base columns {missing}"
        )
    return kept.unionByName(live.select(*out_cols))


def merge_stats(
    base: DataFrame,
    updates: DataFrame,
    id_col: str,
    compare_cols: list[str] | None = None,
    deleted_col: str | None = None,
) -> DataFrame:
    """One-row change summary for a corpus release:
    (n_added, n_updated, n_unchanged, n_deleted, n_untouched).

    added = update id absent from base; deleted = tombstoned id present
    in base; updated/unchanged split by the md5 fingerprint of
    ``compare_cols`` (default: all shared non-id columns). Requires
    unique ids per side (corpus snapshots are keyed); a full outer
    null-safe join on the id is the whole plan.
    """
    if compare_cols is None:
        compare_cols = [
            c
            for c in base.columns
            if c != id_col and c in updates.columns and c != deleted_col
        ]
    b = base.select(
        F.col(id_col).alias("_bid"), _row_fp(compare_cols).alias("_bfp")
    )
    tomb = (
        F.coalesce(F.col(deleted_col), F.lit(False))
        if deleted_col is not None
        else F.lit(False)
    )
    u = updates.select(
        F.col(id_col).alias("_uid"),
        _row_fp(compare_cols).alias("_ufp"),
        tomb.alias("_del"),
    )
    j = b.join(u, b["_bid"].eqNullSafe(u["_uid"]), "full_outer")
    in_b = F.col("_bfp").isNotNull()
    in_u = F.col("_ufp").isNotNull()
    return j.agg(
        F.sum((in_u & ~in_b & ~F.col("_del")).cast("long")).alias("n_added"),
        F.sum(
            (in_u & in_b & ~F.col("_del") & (F.col("_bfp") != F.col("_ufp")))
            .cast("long")
        ).alias("n_updated"),
        F.sum(
            (in_u & in_b & ~F.col("_del") & (F.col("_bfp") == F.col("_ufp")))
            .cast("long")
        ).alias("n_unchanged"),
        F.sum((in_u & in_b & F.col("_del")).cast("long")).alias("n_deleted"),
        F.sum((in_b & ~in_u).cast("long")).alias("n_untouched"),
    )


# ---------------------------------------------------------------------------
# Release history: numbered snapshots + time travel
# ---------------------------------------------------------------------------
#
# The storage half of the MERGE story: each release is an immutable
# snapshot directory ``v{n}/`` under one root, committed by writing the
# parquet FIRST and a manifest LAST. Manifests are WRITE-ONCE numbered
# files (``_releases/manifest-%06d.json``, each holding the full log),
# never rewritten in place: an in-place rewrite truncates before
# writing, so a crash mid-commit would corrupt the whole history — a
# crashed writer here instead leaves at worst one orphaned snapshot
# dir (skipped, never adopted, by the next writer) or one torn newest
# manifest file (skipped by readers, which fall back to the previous
# one). All path operations go through the Hadoop FS wrapper
# (HDFS/S3A/file alike); a manifest is release-count-sized metadata,
# not data. Single-writer contract (one release pipeline per corpus
# root), same as the reference's archive lifecycle (writer.go
# finalize-once).

import json as _json


def _manifest_dir(root: str) -> str:
    return root.rstrip("/") + "/_releases"


def release_log(spark, root: str) -> list[dict]:
    """The committed releases, oldest first: [{version, path, note}] —
    the newest PARSEABLE manifest wins; a torn newest file (crashed
    writer) is skipped."""
    from esdb_spark import fs as _hfs

    md = _manifest_dir(root)
    names = sorted(
        (
            n
            for n, is_dir in _hfs.list_dir(spark, md)
            if not is_dir
            and n.startswith("manifest-")
            and n.endswith(".json")
        ),
        reverse=True,
    )
    for n in names:
        try:
            return _json.loads(_hfs.read_text(spark, md + "/" + n))
        except ValueError:
            continue  # torn newest manifest — fall back
    return []


def write_release(
    spark, root: str, df, note: str = "", gate: list | None = None
) -> int:
    """Commit ``df`` as the next numbered snapshot; returns its
    version. Parquet lands before the manifest entry, so readers never
    see an uncommitted release.

    ``gate``: optional expectations rule list
    (``operators.expectations``) — evaluated over the WRITTEN parquet
    before the manifest commits, so validated bytes are exactly the
    published bytes (checking ``df`` itself would validate one
    evaluation of a plan that is then re-executed for the write — a
    nondeterministic step could publish rows the gate never saw). A
    failing rule raises with the failing (rule, metric) pairs and the
    release never becomes visible: the written directory is exactly
    the orphan shape the version-skip logic already self-heals past."""
    from esdb_spark import fs as _hfs

    log = release_log(spark, root)
    version = (log[-1]["version"] + 1) if log else 0
    # Orphan directories (a writer that crashed after the parquet but
    # before the manifest, or whose gate failed) are SKIPPED, never
    # adopted: adopting could publish a torn or rejected snapshot, and
    # refusing would wedge the corpus until manual cleanup. The
    # manifest stays the single source of truth for what exists.
    path = root.rstrip("/") + f"/v{version}"
    while _hfs.exists(spark, path):
        version += 1
        path = root.rstrip("/") + f"/v{version}"
    df.write.parquet(path)
    if gate:
        from esdb_spark.operators.expectations import check

        failed = [
            (r["rule"], r["metric"])
            for r in check(spark.read.parquet(path), gate).collect()
            if not r["passed"]
        ]
        if failed:
            raise ValueError(
                f"write_release: expectations gate failed, release not "
                f"committed (rejected files left at {path}): {failed}"
            )
    log.append({"version": version, "path": path, "note": note})
    _hfs.mkdirs(spark, _manifest_dir(root))
    # write-once ENFORCED (overwrite=False), not just documented: two
    # writers racing to the same manifest number would otherwise
    # silently last-wins each other's history — the loser's snapshot
    # would vanish from the log with no error anywhere. With exclusive
    # create the second writer fails loudly and its parquet dir is
    # left in the orphan shape the version-skip already heals past.
    _hfs.touch_exclusive(
        spark,
        _manifest_dir(root) + f"/manifest-{version:06d}.json",
        _json.dumps(log, indent=1),
    )
    return version


def read_release(spark, root: str, version: int | None = None):
    """The snapshot at ``version`` (default: latest) — time travel
    over the release history."""
    log = release_log(spark, root)
    if not log:
        raise FileNotFoundError(f"read_release: no releases under {root}")
    if version is None:
        entry = log[-1]
    else:
        matches = [e for e in log if e["version"] == version]
        if not matches:
            raise FileNotFoundError(
                f"read_release: version {version} not in "
                f"{[e['version'] for e in log]}"
            )
        entry = matches[0]
    return spark.read.parquet(entry["path"])


def diff_releases(
    spark,
    root: str,
    v_from: int,
    v_to: int,
    id_col: str,
    compare_cols: list[str] | None = None,
):
    """Change accounting between two committed releases — the same
    1-row summary ``merge_stats`` gives for a pending update set,
    computed over history instead (deleted shows as n_untouched=0 side:
    ids present in ``v_from`` but absent from ``v_to`` count as
    n_deleted_rows)."""
    a = read_release(spark, root, v_from)
    b = read_release(spark, root, v_to)
    if compare_cols is None:
        compare_cols = [
            c for c in a.columns if c != id_col and c in b.columns
        ]
    fa = a.select(
        F.col(id_col).alias("_aid"), _row_fp(compare_cols).alias("_afp")
    )
    fb = b.select(
        F.col(id_col).alias("_bid2"), _row_fp(compare_cols).alias("_bfp2")
    )
    j = fa.join(fb, fa["_aid"].eqNullSafe(fb["_bid2"]), "full_outer")
    in_a = F.col("_afp").isNotNull()
    in_b = F.col("_bfp2").isNotNull()
    return j.agg(
        F.sum((in_b & ~in_a).cast("long")).alias("n_added"),
        F.sum(
            (in_a & in_b & (F.col("_afp") != F.col("_bfp2"))).cast("long")
        ).alias("n_updated"),
        F.sum(
            (in_a & in_b & (F.col("_afp") == F.col("_bfp2"))).cast("long")
        ).alias("n_unchanged"),
        F.sum((in_a & ~in_b).cast("long")).alias("n_deleted_rows"),
    )


# ---------------------------------------------------------------------------
# Slowly-changing dimension (Type 2) from a change log
# ---------------------------------------------------------------------------


def scd2(
    df: DataFrame,
    id_cols: list[str],
    tracked_cols: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from a change log: one
    output row per (entity, run of identical tracked values), with
    ``valid_from`` / ``valid_to`` half-open validity bounds and an
    ``is_current`` flag — the warehouse-standard versioned-dimension
    shape (Kimball SCD2), the history face of :func:`merge_snapshot`
    (MERGE folds snapshots forward; this reads the full change log
    back out as intervals).

    ``df`` holds observations ``(id_cols…, ts_col, tracked_cols…)``;
    consecutive observations of an entity with identical tracked
    values collapse into one version row anchored at the run's FIRST
    timestamp. ``valid_to`` is the next version's ``valid_from``
    (half-open, so an entity's intervals tile its observed lifetime
    with no gaps or overlaps) and NULL on the current version.
    ``tiebreak_cols`` must make the per-entity order total when one
    timestamp can carry several observations — without a total order
    the "previous row" is partition-luck, not data.

    NULL semantics: a change is detected with null-safe equality
    (``IS DISTINCT FROM``), so NULL→value and value→NULL transitions
    open new versions and NULL==NULL does not.

    Scale: ONE hash shuffle of the log on the entity id; both windows
    (change detection, then ``lead`` over the surviving version rows)
    share that partitioning and sort, so Catalyst plans a single
    exchange + sort and the second window is sort-free. Nothing is
    collected; output is bounded by the number of value changes, not
    observations.
    """
    tiebreak_cols = list(tiebreak_cols or [])
    w = Window.partitionBy(*id_cols).orderBy(
        *[F.col(c).asc() for c in [ts_col, *tiebreak_cols]]
    )
    prev_differs = [
        ~F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
        for c in tracked_cols
    ]
    first_row = F.row_number().over(w) == 1
    changed = first_row
    for d in prev_differs:
        changed = changed | d
    versions = df.withColumn("_scd_new", changed).filter(F.col("_scd_new"))
    return (
        versions.withColumn(
            "valid_to",
            F.lead(F.col(ts_col)).over(w),
        )
        .select(
            *id_cols,
            *tracked_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
