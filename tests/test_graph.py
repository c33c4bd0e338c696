"""PageRank (operators/graph.py): cross-validated against a numpy
power iteration on the same graph, plus structural invariants."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.graph import pagerank


def numpy_pagerank(edge_list, damping, iters):
    nodes = sorted({x for e in edge_list for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edge_list:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out == 0].sum()
        nxt = np.full(n, (1 - damping) / n + damping * dangling / n)
        for s, d in edge_list:
            nxt[idx[d]] += damping * r[idx[s]] / out[idx[s]]
        r = nxt
    return dict(zip(nodes, r))


EDGES = [
    (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (6, 4), (2, 4),
    (7, 1),  # 7 is dangling-free source; 8 below is a pure sink
    (5, 8),
]


def test_matches_numpy_power_iteration(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(df, iters=20).collect()}
    want = numpy_pagerank(EDGES, 0.85, 20)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_ranks_sum_to_one_and_positive(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    ranks = pagerank(df, iters=10).collect()
    total = sum(r["rank"] for r in ranks)
    assert abs(total - 1.0) < 1e-9
    assert all(r["rank"] > 0 for r in ranks)


def test_sink_accumulates_more_than_isolated_source(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(df, iters=20).collect()}
    # node 4 has 3 in-edges; node 7 has none — importance must reflect it
    assert got[4] > got[7]


def test_damping_validation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, iters=2).count() == 0


def test_null_edges_dropped_mass_conserved(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, None), (None, 2)], "src long, dst long"
    )
    ranks = pagerank(df, iters=8).collect()
    assert {r["id"] for r in ranks} == {1, 2}
    assert abs(sum(r["rank"] for r in ranks) - 1.0) < 1e-9


def test_triangle_count_known_graph(spark):
    """K4 + pendant: every K4 node sits in 3 triangles, the pendant in
    none; duplicate/reversed edges and self-loops are ignored."""
    from esdb_spark.operators.graph import triangle_count

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (1, 0), (2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["id"]: r["triangles"] for r in triangle_count(df).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0}


def test_triangle_count_matches_bruteforce(spark):
    import itertools
    import random

    from esdb_spark.operators.graph import triangle_count

    random.seed(11)
    n = 50
    es = {tuple(sorted(random.sample(range(n), 2))) for _ in range(180)}
    adj = {i: set() for i in range(n)}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    want = {i: 0 for i in range(n)}
    for a, b, c in itertools.combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            want[a] += 1
            want[b] += 1
            want[c] += 1
    got = {
        r["id"]: r["triangles"]
        for r in triangle_count(
            spark.createDataFrame(list(es), "src long, dst long")
        ).collect()
    }
    assert all(got.get(i, 0) == want[i] for i in range(n))


def test_triangle_count_hub_wedges_stay_bounded(spark):
    """The degree-orientation property: a star (one hub, 200 leaves)
    has zero triangles AND must produce zero wedge-join candidates at
    the hub (the naive formulation explodes d^2 = 40k candidates)."""
    from esdb_spark.operators.graph import triangle_count

    star = [(0, i) for i in range(1, 201)]
    df = spark.createDataFrame(star, "src long, dst long")
    out = triangle_count(df)
    assert out.filter("triangles > 0").count() == 0
    # every edge orients leaf -> hub (leaves have degree 1), so wedges
    # exist only at leaves (none have 2 out-edges): the wedge relation
    # is EMPTY — asserted via the same construction the operator uses
    from pyspark.sql import functions as F

    e = df.select(F.least("src", "dst").alias("u"),
                  F.greatest("src", "dst").alias("v")).distinct()
    deg = (e.select(F.col("u").alias("id")).unionAll(
        e.select(F.col("v").alias("id"))).groupBy("id")
        .agg(F.count("*").alias("deg")))
    # canonical edges are (u=hub, v=leaf); the hub is `lo` (gets the
    # out-edge) only if its (deg, id) sorts below the leaf's — never,
    # since deg(hub)=200 vs deg(leaf)=1
    hub_out = (e.join(deg.withColumnRenamed("id", "u")
                      .withColumnRenamed("deg", "du"), "u")
               .join(deg.withColumnRenamed("id", "v")
                     .withColumnRenamed("deg", "dv"), "v")
               .filter("du < dv or (du = dv and u < v)").count())
    assert hub_out == 0  # hub never gets an out-edge


def test_pagerank_exact_matches_python_model(spark):
    """pagerank_exact: scaled-bigint power iteration equals a pure
    python int model step for step (floor-div everywhere — the
    property that makes the DuckDB recursive-CTE oracle bit-exact)."""
    from esdb_spark.operators.graph import pagerank_exact

    und = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (1, 5), (5, 2)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["rank_scaled"]
        for r in pagerank_exact(df, iters=10).collect()
    }

    scale, num, den, iters = 10**12, 17, 20, 10
    adj, nodes = {}, set()
    for a, b in set(edges):
        adj.setdefault(a, set()).add(b)
        nodes.update((a, b))
    n = len(nodes)
    rank = {v: scale // n for v in nodes}
    base = (den - num) * (scale // n)
    for _ in range(iters):
        in_mass = {v: 0 for v in nodes}
        for a, outs in adj.items():
            c = rank[a] // len(outs)
            for b in outs:
                in_mass[b] += c
        rank = {v: (base + num * in_mass[v]) // den for v in nodes}
    assert got == rank


def test_pagerank_exact_rejects_dangling(spark):
    from esdb_spark.operators.graph import pagerank_exact

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="dangling"):
        pagerank_exact(df)


# ---------------------------------------------------------------------------
# label propagation (round 6)
# ---------------------------------------------------------------------------


def _lpa_model(edges, iters):
    """Definitional synchronous LPA: max-count in-neighbor label, ties
    to smallest; nodes without in-edges keep their own id."""
    nodes = sorted({x for e in edges for x in e})
    in_nbrs = {}
    for s, d in set(edges):
        in_nbrs.setdefault(d, []).append(s)
    labels = {v: v for v in nodes}
    for _ in range(iters):
        new = {}
        for v in nodes:
            nbs = in_nbrs.get(v)
            if not nbs:
                new[v] = labels[v]
                continue
            counts = {}
            for s in nbs:
                counts[labels[s]] = counts.get(labels[s], 0) + 1
            new[v] = min(
                counts, key=lambda lb: (-counts[lb], lb)
            )
        labels = new
    return labels


def test_label_propagation_two_cliques(spark):
    from esdb_spark.operators.graph import label_propagation

    # two triangles joined by one bridge edge — communities must
    # resolve to the min id of each triangle after a few rounds
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    directed = tri1 + tri2 + bridge
    edges = directed + [(b, a) for a, b in directed]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 2, 4):
        got = {
            r["id"]: r["label"]
            for r in label_propagation(df, iters=iters).collect()
        }
        assert got == _lpa_model(edges, iters), iters


def test_label_propagation_isolated_receiver_keeps_label(spark):
    from esdb_spark.operators.graph import label_propagation

    # 5 -> 6 only: node 5 has no in-edges and keeps its own label
    df = spark.createDataFrame([(5, 6)], "src long, dst long")
    got = {
        r["id"]: r["label"] for r in label_propagation(df, iters=3).collect()
    }
    assert got == {5: 5, 6: 5}


def test_label_propagation_tie_breaks_to_smallest(spark):
    from esdb_spark.operators.graph import label_propagation

    # node 9 hears labels {1, 2} once each -> must adopt 1
    df = spark.createDataFrame([(1, 9), (2, 9)], "src long, dst long")
    got = {
        r["id"]: r["label"] for r in label_propagation(df, iters=1).collect()
    }
    assert got[9] == 1


def test_label_propagation_validations(spark):
    from esdb_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    import pytest as _pt

    with _pt.raises(ValueError):
        label_propagation(df, checkpoint_every=0)
    empty = df.filter("false")
    assert label_propagation(empty, iters=2).count() == 0


def test_bfs_distances_hand_graph(spark):
    from esdb_spark.operators.graph import bfs_distances

    # 0->1->2->3->4 chain plus a shortcut 0->3 and an unreachable 9<-8
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (8, 9)],
        "src long, dst long",
    )
    src = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_distances(edges, src, max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}
    # hop bound truncates; unreached nodes absent
    got2 = {r["id"]: r["dist"] for r in bfs_distances(edges, src, max_hops=1).collect()}
    assert got2 == {0: 0, 1: 1, 3: 1}


def test_bfs_distances_multi_source_min(spark):
    from esdb_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 2), (2, 3)], "src long, dst long"
    )
    src = spark.createDataFrame([(0,), (5,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_distances(edges, src, max_hops=5).collect()}
    # node 2 reachable at hop 2 from 0 but hop 1 from 5 -> min wins
    assert got == {0: 0, 5: 0, 1: 1, 2: 1, 3: 2}
    import pytest as _pt
    with _pt.raises(ValueError):
        bfs_distances(edges, src, max_hops=-1)
