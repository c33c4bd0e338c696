"""Hypothesis property tests for the round-6 operator families — each
checked against a definitional pure-Python model (the house pattern of
test_properties.py: small randomized inputs, Spark result == model).
"""

import itertools

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

# short strings over a tiny alphabet so distance-1 pairs actually occur
_names = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=5),
    min_size=1,
    max_size=12,
)


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(names=_names, d=st.integers(min_value=1, max_value=2))
def test_levenshtein_join_complete_and_exact(spark, names, d):
    """Symmetric-delete blocking must find EVERY pair within distance d
    (completeness is the whole claim) and nothing beyond (exactness via
    the verify step)."""
    from esdb_spark.operators.linkage import fuzzy_join_levenshtein

    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "rid int, name string")
    a = df.select(F.col("rid").alias("left_id"), "name")
    b = df.select(F.col("rid").alias("right_id"), "name")
    got = {
        (r["left_id"], r["right_id"]): r["dist"]
        for r in fuzzy_join_levenshtein(
            a, b, "name", "name", max_dist=d
        ).collect()
    }
    want = {
        (i, j): _lev(x.lower(), y.lower())
        for i, x in rows
        for j, y in rows
        if _lev(x.lower(), y.lower()) <= d
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # basket
            st.integers(min_value=0, max_value=6),  # item
        ),
        min_size=1,
        max_size=60,
    )
)
def test_cooccurrence_matches_pair_model(spark, rows):
    from esdb_spark.operators.cooccur import cooccurrence_pairs

    df = spark.createDataFrame(rows, "g int, item int")
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_both"], r["n_a"], r["n_b"], r["n_groups"], r["lift"]
        )
        for r in cooccurrence_pairs(df, "g", "item").collect()
    }
    baskets = {}
    for g, i in rows:
        baskets.setdefault(g, set()).add(i)
    n_groups = len(baskets)
    support = {}
    for items in baskets.values():
        for i in items:
            support[i] = support.get(i, 0) + 1
    pair_n = {}
    for items in baskets.values():
        for x, y in itertools.combinations(sorted(items), 2):
            pair_n[(x, y)] = pair_n.get((x, y), 0) + 1
    want = {
        p: (
            n,
            support[p[0]],
            support[p[1]],
            n_groups,
            (n * n_groups) / (support[p[0]] * support[p[1]]),
        )
        for p, n in pair_n.items()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # user
            st.integers(min_value=0, max_value=50),  # ts
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda r: (r[0], r[1]),  # totalized order per user
    )
)
def test_transitions_match_sequence_model(spark, rows):
    from esdb_spark.operators.sequence import event_transitions

    df = spark.createDataFrame(rows, "u int, ts long, ev string")
    got = {
        (r["state"], r["next_state"]): (r["n"], r["n_from"], r["p"])
        for r in event_transitions(df, "u", "ts", "ev").collect()
    }
    per_user = {}
    for u, ts, ev in rows:
        per_user.setdefault(u, []).append((ts, ev))
    counts = {}
    for seq in per_user.values():
        seq.sort()
        for (_, s), (_, nxt) in zip(seq, seq[1:]):
            counts[(s, nxt)] = counts.get((s, nxt), 0) + 1
    from_total = {}
    for (s, _), n in counts.items():
        from_total[s] = from_total.get(s, 0) + n
    want = {
        k: (n, from_total[k[0]], n / from_total[k[0]])
        for k, n in counts.items()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=40,
    ),
    data=st.data(),
)
def test_apply_changes_equals_recompute(spark, base, data):
    """state + delta == recompute, for any feed whose deletes name
    rows the base actually has."""
    from esdb_spark.operators.incremental import (
        apply_changes,
        snapshot_aggregate,
    )

    n_del = data.draw(st.integers(min_value=0, max_value=len(base)))
    deletes = base[:n_del]
    inserts = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),
                st.integers(min_value=-50, max_value=50),
            ),
            max_size=10,
        )
    )
    bdf = spark.createDataFrame(base, "k int, v long")
    feed_rows = [(k, v, "delete") for k, v in deletes] + [
        (k, v, "insert") for k, v in inserts
    ]
    if not feed_rows:
        return
    feed = spark.createDataFrame(feed_rows, "k int, v long, op string")
    state = snapshot_aggregate(bdf, ["k"], ["v"])
    got = {
        r["k"]: (r["n_rows"], r["sum_v"])
        for r in apply_changes(state, feed, ["k"], ["v"]).collect()
    }
    edited = base[n_del:] + inserts
    want = {}
    for k, v in edited:
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + v)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=2,
        max_size=40,
    )
)
def test_robust_outliers_match_median_model(spark, vals):
    import statistics

    from esdb_spark.operators.profile import robust_outliers

    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "g string, v double")
    out = robust_outliers(df, "g", "v", threshold=3.5).collect()
    med = statistics.median([float(v) for v in vals])
    mad = statistics.median([abs(float(v) - med) for v in vals])
    for r in out:
        assert r["med"] == med and r["mad"] == mad
        if mad != 0.0:
            z = 0.6745 * (r["v"] - med) / mad
            assert r["robust_z"] == z
            assert r["is_outlier"] == (abs(z) > 3.5)
        else:
            assert r["robust_z"] is None
            assert r["is_outlier"] == (r["v"] != med)
