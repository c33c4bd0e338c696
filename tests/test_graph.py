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
