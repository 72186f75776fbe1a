"""PageRank correctness: exact parity against a dense numpy power
iteration on the same graph, plus the structural invariants (sum-to-1,
uniformity on vertex-transitive graphs)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from novelti_dingo_spark.operators.graph import DAMPING, ITERATIONS, pagerank


def _numpy_pagerank(edge_list, damping=DAMPING, iterations=ITERATIONS):
    """Reference: identical fixed-length power iteration, dense numpy."""
    nodes = sorted({x for e in edge_list for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in edge_list:
        adj[idx[a], idx[b]] = 1.0
        adj[idx[b], idx[a]] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        r = (1 - damping) / n + damping * (adj.T @ (r / deg))
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    # two triangles bridged by one edge + a pendant: asymmetric enough
    # that every node gets a distinct rank
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_uniform_on_cycle(spark):
    """On a vertex-transitive graph (a cycle) every node must end at
    exactly 1/N at every iteration — any drift is an implementation bug
    (degree misweighting, dropped teleport mass)."""
    n = 12
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    ranks = [r["rank"] for r in pagerank(df).collect()]
    assert len(ranks) == n
    assert all(abs(r - 1.0 / n) < 1e-12 for r in ranks)


def test_pagerank_doc_centrality_runs(spark, sf_small):
    from novelti_dingo_spark.operators.graph import pagerank_doc_centrality

    out = pagerank_doc_centrality(spark, sf_small)
    rows = out.collect()
    assert 0 < len(rows) <= 20
    assert [f.name for f in out.schema.fields] == ["doc_id", "rank"]
    # descending by rank, doc_id tiebreak
    vals = [(r["rank"], r["doc_id"]) for r in rows]
    assert vals == sorted(vals, key=lambda t: (-t[0], t[1]))
