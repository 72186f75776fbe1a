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


def _py_kcore(edges, k):
    """Reference peeling: repeatedly drop nodes with degree < k."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(ns) for n, ns in adj.items() if ns}


def test_kcore_matches_python_peeling(spark):
    from novelti_dingo_spark.operators.graph import kcore

    # a 4-clique (core 3) + a tail chain (peels at k=2) + an isolated edge
    edges = (
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        + [(3, 4), (4, 5), (5, 6)]
        + [(10, 11)]
    )
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    for k in (2, 3, 4):
        got = {r.node: r.core_degree for r in kcore(df, k).collect()}
        assert got == _py_kcore(edges, k), (k, got)
    # k=2 keeps only the clique; the chain and lone edge peel away
    assert set(kcore(df, 2).toPandas().node) == {0, 1, 2, 3}
    # k=4 empties the graph entirely — the loop must terminate
    assert kcore(df, 4).count() == 0


def test_kcore_neardup_consistent_with_reference(spark, sf_med):
    from novelti_dingo_spark.operators.dedup import _neardup_pairs
    from novelti_dingo_spark.operators.graph import kcore_neardup

    pairs = [
        (r.a_id, r.b_id) for r in _neardup_pairs(spark, sf_med).collect()
    ]
    want = _py_kcore(pairs, 2)
    got = {r.node: r.core_degree for r in kcore_neardup(spark, sf_med).collect()}
    assert got == want
