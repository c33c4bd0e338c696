"""Incremental aggregate maintenance: refresh a keyed aggregate from
a change feed without rescanning the base data.

At 100 TB the expensive thing about a dashboard aggregate is not the
math, it's the rescan. Sum/count (and anything derived from them —
mean, rates) are *self-maintainable*: state' = state + delta, where
the delta aggregates only the changed rows. This module is that
contract made explicit:

- :func:`snapshot_aggregate` — build the maintainable state from a
  base snapshot: one hash aggregation → ``(keys…, n_rows,
  sum_<measure>…)``.
- :func:`apply_changes` — fold a change feed (rows tagged
  insert/delete; an update is delete+insert of the same key) into the
  state: ONE aggregation over the feed (cardinality = touched keys)
  full-outer-joined onto the |keys|-row state. The base data is never
  read.

The invariant — ``apply_changes(snapshot_aggregate(base), feed) ==
snapshot_aggregate(base ∘ feed)`` — is exactly checkable when the
measures sum associatively: integers and DECIMALs re-associate
losslessly, so the catalog row casts its measure to decimal and
carries a full value-hash oracle that recomputes from scratch
(``lineitem_incremental_agg``); float measures stay correct to
re-association (the round-4 float-sum lesson) and are the caller's
accepted noise.

NOT maintainable under deletes, by construction: min/max/distinct
(a deleted extremum forces a rescan of its group — the classic
non-distributive aggregates). Under an INSERT-ONLY feed min/max ARE
foldable: ``track_minmax=True`` adds ``min_<m>``/``max_<m>`` columns
to the state, and ``apply_changes`` then REFUSES delete rows at
execution time (a raise_error arm) rather than silently corrupting
an extremum. Distinct counts get the same insert-only treatment via
``track_distinct=[cols]``: the state carries one mergeable HLL
sketch (``hll_<c>``, binary) per tracked column — sketch state is
the ONLY way a distinct count folds without re-reading the base
(exact distinct state would be the base itself) — folded with
``hll_union`` per feed batch and read through
:func:`distinct_estimates`. Small cardinalities stay exact (the
sketch's sparse mode stores raw coupons); large ones carry the
standard ~2% HLL error, which is the accepted price of
maintainability at 100 TB.

Deletes must describe rows that exist in the base — this module
applies arithmetic, it cannot validate membership without reading
the base (which is the whole point of not reading it). A group whose
row count reaches exactly zero drops from the state; a NEGATIVE
count means the feed deleted rows that were never there, and
``apply_changes`` raises by default (``allow_negative=True`` keeps
the arithmetic result for forensic inspection instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_OPS = ("insert", "delete")


def snapshot_aggregate(
    df: DataFrame,
    keys: list[str],
    measures: list[str],
    track_minmax: bool = False,
    track_distinct: list[str] | None = None,
) -> DataFrame:
    """Maintainable aggregate state over a base snapshot: one row per
    key combination with ``n_rows`` and ``sum_<m>`` for each measure
    (NULL measure values contribute 0 to sums, like SQL SUM).
    ``track_minmax`` adds ``min_<m>``/``max_<m>`` (NULLs ignored, like
    SQL MIN/MAX) — maintainable only under insert-only feeds, which
    :func:`apply_changes` then enforces. ``track_distinct`` adds one
    mergeable HLL sketch column ``hll_<c>`` (binary, NULLs ignored
    like COUNT(DISTINCT)) per listed column — same insert-only
    contract; read the estimates with :func:`distinct_estimates`."""
    if not keys:
        raise ValueError("snapshot_aggregate: keys must be non-empty")
    aggs = [F.count("*").cast("long").alias("n_rows")] + [
        F.sum(F.coalesce(F.col(m), F.lit(0))).alias(f"sum_{m}")
        for m in measures
    ]
    if track_minmax:
        for m in measures:
            aggs.append(F.min(m).alias(f"min_{m}"))
            aggs.append(F.max(m).alias(f"max_{m}"))
    for c in track_distinct or []:
        aggs.append(F.hll_sketch_agg(c).alias(f"hll_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def distinct_estimates(
    state: DataFrame, cols: list[str], drop_sketches: bool = True
) -> DataFrame:
    """Read ``ndv_<c>`` distinct-count estimates off the ``hll_<c>``
    sketch columns a ``track_distinct`` state carries (a group whose
    tracked column was all-NULL estimates 0, like COUNT(DISTINCT)).
    Estimates are exact while the sketch is in sparse mode (small
    per-group cardinality) and ~2%-accurate beyond."""
    out = state
    for c in cols:
        if f"hll_{c}" not in state.columns:
            raise ValueError(
                f"distinct_estimates: state lacks hll_{c} — build it "
                "with snapshot_aggregate(track_distinct=[...])"
            )
        out = out.withColumn(
            f"ndv_{c}",
            F.coalesce(
                F.hll_sketch_estimate(F.col(f"hll_{c}")), F.lit(0)
            ).cast("long"),
        )
    return out.drop(*[f"hll_{c}" for c in cols]) if drop_sketches else out


def apply_changes(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    measures: list[str],
    op_col: str = "op",
    allow_negative: bool = False,
    track_minmax: bool = False,
    track_distinct: list[str] | None = None,
) -> DataFrame:
    """Fold a change feed into aggregate state (see module docstring).

    ``changes`` carries the key columns, the measure columns, and
    ``op_col`` ∈ {'insert', 'delete'}; any other op value raises at
    execution time (a CASE with a raise_error arm — bad feeds must
    not silently vanish). Returns the same schema as the state.

    Plan shape: one hash aggregation over the feed keyed on the group
    columns (map-side combined — the shuffle carries one row per
    touched key per partition), one full-outer join against the
    |keys|-row state, pure-column addition (plus one ``hll_union``
    per ``track_distinct`` column). The base table is never touched;
    at 100 TB that is the entire value proposition.
    """
    track_distinct = track_distinct or []
    extrema_cols = [f"{p}_{m}" for m in measures for p in ("min", "max")]
    present = [c for c in extrema_cols if c in state.columns]
    if track_minmax and len(present) != len(extrema_cols):
        raise ValueError(
            "apply_changes: track_minmax=True but the state lacks "
            f"{sorted(set(extrema_cols) - set(present))} — build it "
            "with snapshot_aggregate(track_minmax=True)"
        )
    if not track_minmax and present:
        raise ValueError(
            f"apply_changes: the state carries extrema columns "
            f"{present} but track_minmax=False — the fold would "
            "silently drop them; pass track_minmax=True"
        )
    sketch_cols = [f"hll_{c}" for c in track_distinct]
    # sketch state is identified by name prefix AND BinaryType — a
    # legitimate key or carried column that merely happens to be
    # named hll_something must not trip the mismatch check (ADVICE r7)
    from pyspark.sql.types import BinaryType

    sk_present = [
        c
        for c in state.columns
        if c.startswith("hll_")
        and isinstance(state.schema[c].dataType, BinaryType)
    ]
    if sorted(sketch_cols) != sorted(sk_present):
        if track_distinct and not sk_present:
            raise ValueError(
                "apply_changes: track_distinct set but the state lacks "
                f"{sketch_cols} — build it with "
                "snapshot_aggregate(track_distinct=[...])"
            )
        raise ValueError(
            f"apply_changes: state sketch columns {sorted(sk_present)} "
            f"do not match track_distinct={track_distinct!r} — a "
            "mismatched fold would silently drop or miss sketches"
        )
    insert_only = track_minmax or bool(track_distinct)
    insert_only_why = (
        "min/max" if track_minmax else "distinct sketches"
    )
    sign = (
        F.when(F.col(op_col) == "insert", F.lit(1))
        .when(
            F.col(op_col) == "delete",
            F.raise_error(
                F.lit(
                    f"apply_changes: delete in a {insert_only_why}-"
                    "tracking feed — not maintainable under deletes"
                )
            ).cast("int")
            if insert_only
            else F.lit(-1),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("apply_changes: bad op (expected insert/delete): "),
                    F.col(op_col).cast("string"),
                )
            )
        )
    )
    delta_aggs = [F.sum(sign).cast("long").alias("_ia_dn")] + [
        F.sum(sign * F.coalesce(F.col(m), F.lit(0))).alias(f"_ia_d_{m}")
        for m in measures
    ]
    if track_minmax:
        for m in measures:
            delta_aggs.append(F.min(m).alias(f"_ia_min_{m}"))
            delta_aggs.append(F.max(m).alias(f"_ia_max_{m}"))
    for c in track_distinct:
        delta_aggs.append(F.hll_sketch_agg(c).alias(f"_ia_hll_{c}"))
    delta = changes.groupBy(*keys).agg(*delta_aggs)
    # NULL-SAFE key join: groupBy treats NULL as one group, but a plain
    # equi-join never matches NULL=NULL — a NULL-keyed group would
    # split into two rows (and a NULL-key delete would spuriously trip
    # the negative-count check). eqNullSafe + key coalesce keeps the
    # state' = recompute invariant for nullable keys.
    delta = delta.select(
        *[F.col(k).alias(f"_ia_k_{k}") for k in keys],
        "_ia_dn",
        *[f"_ia_d_{m}" for m in measures],
        *(
            [c for m in measures for c in (f"_ia_min_{m}", f"_ia_max_{m}")]
            if track_minmax
            else []
        ),
        *[f"_ia_hll_{c}" for c in track_distinct],
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_ia_k_{k}"))
        cond = c if cond is None else cond & c
    j = state.join(delta, cond, "full_outer")
    n = F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(
        F.col("_ia_dn"), F.lit(0)
    )
    out = j.select(
        *[
            F.coalesce(F.col(k), F.col(f"_ia_k_{k}")).alias(k)
            for k in keys
        ],
        n.cast("long").alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"sum_{m}"), F.lit(0))
                + F.coalesce(F.col(f"_ia_d_{m}"), F.lit(0))
            ).alias(f"sum_{m}")
            for m in measures
        ],
        *(
            [
                c
                for m in measures
                for c in (
                    F.least(F.col(f"min_{m}"), F.col(f"_ia_min_{m}")).alias(
                        f"min_{m}"
                    ),
                    F.greatest(
                        F.col(f"max_{m}"), F.col(f"_ia_max_{m}")
                    ).alias(f"max_{m}"),
                )
            ]
            if track_minmax
            else []
        ),
        # hll_union(NULL, s) is NULL — union only when both sides have
        # a sketch (a key new to either side keeps the one it has)
        *[
            F.when(
                F.col(f"hll_{c}").isNotNull()
                & F.col(f"_ia_hll_{c}").isNotNull(),
                F.hll_union(F.col(f"hll_{c}"), F.col(f"_ia_hll_{c}")),
            )
            .otherwise(
                F.coalesce(F.col(f"hll_{c}"), F.col(f"_ia_hll_{c}"))
            )
            .alias(f"hll_{c}")
            for c in track_distinct
        ],
    )
    if not allow_negative:
        out = out.withColumn(
            "n_rows",
            F.when(F.col("n_rows") >= 0, F.col("n_rows")).otherwise(
                F.raise_error(
                    F.lit(
                        "apply_changes: negative group count — the feed "
                        "deleted rows the base never had"
                    )
                )
            ),
        )
    return out.filter(F.col("n_rows") != 0)


def changes_between(
    old: DataFrame, new: DataFrame, op_col: str = "op"
) -> DataFrame:
    """Derive the change feed that turns snapshot ``old`` into
    snapshot ``new`` — the inverse of :func:`apply_changes`, closing
    the loop when no upstream CDC exists: rows in ``new`` but not
    ``old`` become inserts, rows in ``old`` but not ``new`` become
    deletes, with MULTISET semantics (a row appearing 3× then 1×
    yields 2 deletes), so
    ``apply_changes(snapshot_aggregate(old), changes_between(old,
    new)) == snapshot_aggregate(new)`` row-for-row — the composition
    is pytest-asserted and the catalog row's oracle recomputes it.

    Both inputs must agree column-for-column INCLUDING types (a
    name-only check would let Spark's set-op coercion silently widen
    a decimal measure to double, breaking the module's exactness
    contract), and ``op_col`` must not collide with a data column
    (it would be overwritten). Implementation is ONE pass over each
    side: union tagged ±1, one hash aggregation over the row values,
    then |Σtag| copies emitted per surviving row — the single
    full-data pass a snapshot diff fundamentally requires (two
    ``exceptAll``s would scan and shuffle both sides twice; compare
    ``versioning.merge_stats`` for the id-keyed variant that can skip
    bodies).
    """
    if op_col in old.columns:
        raise ValueError(
            f"changes_between: op_col {op_col!r} collides with a "
            "snapshot column"
        )
    if dict(old.dtypes) != dict(new.dtypes) or len(
        set(old.columns)
    ) != len(old.columns):
        raise ValueError(
            "changes_between: snapshot schemas differ (names AND "
            f"types must match): {sorted(old.dtypes)} vs "
            f"{sorted(new.dtypes)}"
        )
    cols = old.columns
    tagged = old.select(*cols, F.lit(-1).alias("_cb_tag")).unionByName(
        new.select(*cols, F.lit(1).alias("_cb_tag"))
    )
    net = (
        tagged.groupBy(*cols)
        .agg(F.sum("_cb_tag").cast("long").alias("_cb_c"))
        .filter(F.col("_cb_c") != 0)
    )
    # emit |c| copies per row; the filter above keeps sequence(1, n)
    # well-formed (sequence(1, 0) steps -1 — the standing lesson)
    return net.select(
        *cols,
        F.when(F.col("_cb_c") > 0, F.lit("insert"))
        .otherwise(F.lit("delete"))
        .alias(op_col),
        F.explode(F.sequence(F.lit(1), F.abs(F.col("_cb_c")))).alias(
            "_cb_i"
        ),
    ).drop("_cb_i")
