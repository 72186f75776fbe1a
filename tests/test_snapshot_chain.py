"""Delta snapshot chains (publish_snapshot_delta / read_snapshot_chain /
compact_snapshot_chain): O(batch) append commits for multi-table
snapshots, chain-aware vacuum pinning, and the ANN-index consumers
(round-10: removes the O(corpus) rewrite per streamed index append)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    compact_snapshot_chain,
    publish_snapshot,
    publish_snapshot_delta,
    read_snapshot,
    read_snapshot_chain,
    vacuum_snapshots,
)
from novelti_dingo_spark.sources import lakefs
from novelti_dingo_spark.sources.io import load_table


def _orders(spark, sf):
    return load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")


def test_delta_publish_writes_only_the_batch(spark, sf_small, tmp_path):
    base = str(tmp_path / "snap")
    o = _orders(spark, sf_small)
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    v1 = publish_snapshot(
        {"facts": o.filter("o_orderkey % 2 = 0"), "dim": dim}, base
    )
    batch = o.filter("o_orderkey % 2 = 1").limit(25)
    v2 = publish_snapshot_delta({"facts": batch}, base)
    assert v2 == v1 + 1
    # O(batch): the delta dir holds ONLY the delta table, no dim copy
    names = set(lakefs.listdir(spark, f"{base}/snap={v2}"))
    assert "facts" in names and "dim" not in names
    raw, m2 = read_snapshot(spark, base)
    assert m2["delta_parent"] == v1 and raw["facts"].count() == 25
    # chain read resolves the union + the ancestor's other tables
    tables, head = read_snapshot_chain(spark, base)
    assert head["snapshot"] == v2
    assert tables["facts"].count() == o.filter("o_orderkey % 2 = 0").count() + 25
    assert tables["dim"].count() == 2
    # pinned read at v1 is the pre-delta state
    t1, _ = read_snapshot_chain(spark, base, v1)
    assert t1["facts"].count() == o.filter("o_orderkey % 2 = 0").count()


def test_delta_requires_full_parent_and_vacuum_pins_chain(
    spark, sf_small, tmp_path
):
    base = str(tmp_path / "snap")
    o = _orders(spark, sf_small)
    with pytest.raises(ValueError, match="full parent"):
        publish_snapshot_delta({"facts": o.limit(1)}, base)
    v1 = publish_snapshot({"facts": o.filter("o_orderkey % 2 = 0")}, base)
    v2 = publish_snapshot_delta({"facts": o.limit(5)}, base)
    v3 = publish_snapshot_delta({"facts": o.limit(3)}, base)
    # keep_last=1 keeps the head — and must PIN its whole chain
    deleted = vacuum_snapshots(spark, base, keep_last=1)
    assert deleted == []
    n = read_snapshot_chain(spark, base)[0]["facts"].count()
    assert n == o.filter("o_orderkey % 2 = 0").count() + 8
    # compaction folds the chain into one full snapshot; afterwards the
    # old chain is reclaimable and the read needs no ancestors
    v4 = compact_snapshot_chain(spark, base)
    assert v4 == v3 + 1
    deleted = vacuum_snapshots(spark, base, keep_last=1)
    assert sorted(deleted) == [v1, v2, v3]
    tables, head = read_snapshot_chain(spark, base)
    assert head.get("delta_parent") is None
    assert tables["facts"].count() == n


def test_chain_cycle_is_refused(spark, sf_small, tmp_path):
    import json

    base = str(tmp_path / "snap")
    o = _orders(spark, sf_small)
    publish_snapshot({"facts": o.limit(4)}, base)
    v2 = publish_snapshot_delta({"facts": o.limit(2)}, base)
    # corrupt the chain into a self-cycle
    mpath = f"{base}/snap={v2}/_manifest.json"
    m = json.loads(lakefs.read_text(spark, mpath))
    m["delta_parent"] = v2
    lakefs.replace_text(spark, mpath, json.dumps(m))
    with pytest.raises(ValueError, match="cycle"):
        read_snapshot_chain(spark, base)


def test_ivfpq_delta_append_serves_and_compacts(spark, sf_small, tmp_path):
    """The consumer path: a delta append writes codes-only, serving
    resolves the chain with partition pruning intact, rewrite mode
    still works, and compaction folds the chain preserving layout."""
    from novelti_dingo_spark.operators.pq import (
        append_vectors_to_ivfpq_index,
        ivfpq_knn_from_index,
        publish_ivfpq_index,
    )

    base = str(tmp_path / "ivfpq")
    v1 = publish_ivfpq_index(spark, sf_small, base, k_cells=8)
    e = load_table(spark, sf_small, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).head().embedding]
    before = ivfpq_knn_from_index(
        spark, base, q, version=v1, n_probe=2, exclude_vec_id=0
    ).collect()

    extra = e.limit(6).withColumn("vec_id", F.col("vec_id") + 1_000_000)
    v2 = append_vectors_to_ivfpq_index(spark, base, extra)  # delta default
    # codes-only delta, cell-partitioned (pruning survives)
    names = set(lakefs.listdir(spark, f"{base}/snap={v2}"))
    assert "codes" in names and "coarse" not in names and "codebooks" not in names
    assert read_snapshot(spark, base)[0]["codes"].count() == 6
    adc_df = ivfpq_knn_from_index(spark, base, q, n_probe=2, exclude_vec_id=0)
    plan = adc_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert len(adc_df.collect()) == 10
    # pinned pre-append reader is byte-stable
    after = ivfpq_knn_from_index(
        spark, base, q, version=v1, n_probe=2, exclude_vec_id=0
    ).collect()
    assert after == before
    # rewrite mode still publishes the full set
    v3 = append_vectors_to_ivfpq_index(
        spark, base, extra.withColumn("vec_id", F.col("vec_id") + 50),
        mode="rewrite",
    )
    t3, m3 = read_snapshot(spark, base, v3)
    assert m3.get("delta_parent") is None
    assert t3["codes"].count() == e.count() + 12
    # compaction after more deltas keeps the hive layout
    append_vectors_to_ivfpq_index(
        spark, base, extra.withColumn("vec_id", F.col("vec_id") + 100)
    )
    v5 = compact_snapshot_chain(spark, base)
    assert any(
        n.startswith("cell=")
        for n in lakefs.listdir(spark, f"{base}/snap={v5}/codes")
    )
    tables, head = read_snapshot_chain(spark, base)
    assert head.get("delta_parent") is None
    assert tables["codes"].count() == e.count() + 18
    assert head.get("residual") is True  # format flags survive compaction


def test_ivfpq_drift_monitor(spark, sf_small, tmp_path):
    """The executable retrain threshold: in-distribution appends keep
    retrain_recommended False; a far-out-of-distribution batch (scaled
    vectors — residuals blow up) trips the norm ratio; a flood into
    one cell trips the skew ratio."""
    from novelti_dingo_spark.operators.pq import (
        append_vectors_to_ivfpq_index,
        ivfpq_index_drift,
        publish_ivfpq_index,
    )

    base = str(tmp_path / "ivfpq")
    publish_ivfpq_index(spark, sf_small, base, k_cells=8)
    e = load_table(spark, sf_small, "embeddings")

    in_dist = e.limit(20).withColumn("vec_id", F.col("vec_id") + 100_000)
    d0 = ivfpq_index_drift(spark, base, in_dist)
    assert d0["norm_ratio"] < 1.2 and not d0["retrain_recommended"]

    # out-of-distribution: 10x-norm vectors sit far from every centroid
    far = in_dist.withColumn(
        "embedding",
        F.transform("embedding", lambda x: x * F.lit(10.0)).cast(
            "array<float>"
        ),
    )
    d1 = ivfpq_index_drift(spark, base, far)
    assert d1["norm_ratio"] > 1.5 and d1["retrain_recommended"]

    # skew: flood one vector's cell with copies of itself
    one = e.filter(F.col("vec_id") == 0)
    flood = one
    for i in range(1, 8):
        flood = flood.unionByName(
            one.withColumn("vec_id", F.lit(200_000 + i))
        )
    big_flood = flood
    for j in range(1, 40):
        big_flood = big_flood.unionByName(
            flood.withColumn("vec_id", F.col("vec_id") + 1_000 * j)
        )
    append_vectors_to_ivfpq_index(spark, base, big_flood)
    d2 = ivfpq_index_drift(spark, base)
    assert d2["cell_skew"] > 4.0 and d2["retrain_recommended"]

    # the norm check must SURVIVE appends: the delta head's manifest
    # carries train_residual_norm forward, so the post-append drift
    # call still measures the ratio (round-11 advice: the carried-keys
    # tuple dropped it, silently disabling the norm branch exactly in
    # the post-append scenario the monitor was built for)
    d3 = ivfpq_index_drift(spark, base, far)
    assert "norm_ratio" in d3 and d3["norm_ratio"] > 1.5
    # ... and compaction (carry-everything minus chain bookkeeping)
    compact_snapshot_chain(spark, base)
    d4 = ivfpq_index_drift(spark, base, far)
    assert "norm_ratio" in d4 and d4["norm_ratio"] > 1.5


def test_chain_len_bookkeeping(spark, sf_small, tmp_path):
    """chain_len is the O(1) counter the streaming auto-compaction
    policy reads instead of walking the chain: full snapshot = absent,
    each delta = parent's + 1, compaction resets (and never carries the
    counter into the compacted manifest), the next delta restarts at
    1 on top of the compacted snapshot."""
    base = str(tmp_path / "snap")
    o = _orders(spark, sf_small)
    publish_snapshot({"facts": o.limit(10)}, base)
    _, m1 = read_snapshot(spark, base)
    assert "chain_len" not in m1
    publish_snapshot_delta({"facts": o.limit(3)}, base)
    _, m2 = read_snapshot(spark, base)
    assert int(m2["chain_len"]) == 1
    publish_snapshot_delta({"facts": o.limit(2)}, base)
    _, m3 = read_snapshot(spark, base)
    assert int(m3["chain_len"]) == 2
    v4 = compact_snapshot_chain(spark, base)
    _, m4 = read_snapshot(spark, base)
    assert m4["snapshot"] == v4 and "chain_len" not in m4
    assert m4.get("compacted_chain") is True
    publish_snapshot_delta({"facts": o.limit(1)}, base)
    _, m5 = read_snapshot(spark, base)
    assert int(m5["chain_len"]) == 1 and int(m5["delta_parent"]) == v4
    tables, _ = read_snapshot_chain(spark, base)
    assert tables["facts"].count() == 10 + 3 + 2 + 1


def test_pq_drift_monitor(spark, sf_small, tmp_path):
    """The plain-PQ retrain threshold is executable (round-11): the
    publish records the corpus training MSE ON the codes write; an
    in-distribution batch sits at mse_ratio ~ 1, a far-out-of-
    distribution batch trips it, and the baseline SURVIVES delta
    appends and compaction (the carried-keys lesson from the IVF-PQ
    norm baseline)."""
    from novelti_dingo_spark.operators.pq import (
        append_vectors_to_pq_index,
        pq_index_drift,
        publish_pq_index,
    )

    base = str(tmp_path / "pq")
    publish_pq_index(spark, sf_small, base)
    _, manifest = read_snapshot(spark, base)
    assert manifest["train_quant_mse"] > 0
    e = load_table(spark, sf_small, "embeddings")

    in_dist = e.limit(20).withColumn("vec_id", F.col("vec_id") + 100_000)
    d0 = pq_index_drift(spark, base, in_dist)
    assert 0.5 < d0["mse_ratio"] < 1.5 and not d0["retrain_recommended"]

    far = in_dist.withColumn(
        "embedding",
        F.transform("embedding", lambda x: x * F.lit(10.0)).cast(
            "array<float>"
        ),
    )
    d1 = pq_index_drift(spark, base, far)
    assert d1["mse_ratio"] > 1.5 and d1["retrain_recommended"]

    # baseline survives a delta append ...
    append_vectors_to_pq_index(spark, base, in_dist)
    d2 = pq_index_drift(spark, base, far)
    assert "mse_ratio" in d2 and d2["mse_ratio"] > 1.5
    # ... and compaction
    compact_snapshot_chain(spark, base)
    d3 = pq_index_drift(spark, base, far)
    assert "mse_ratio" in d3 and d3["mse_ratio"] > 1.5
    # no-batch call: structural stats only, no recommendation
    d4 = pq_index_drift(spark, base)
    assert d4["n_codes"] == 500 + 20 and not d4["retrain_recommended"]
