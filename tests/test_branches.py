"""Named branches over the versioned lake: O(1) branch creation,
branch-isolated appends, fast-forward merge with divergence refusal,
vacuum protection of branch heads, pointer hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    branch_head,
    create_branch,
    delete_branch,
    merge_branch,
    publish_append,
    publish_versioned,
    read_branch,
    read_version_chain,
    vacuum_versions,
)
from novelti_dingo_spark.sources import lakefs
from novelti_dingo_spark.sources.io import load_table


def _orders(spark, sf):
    return load_table(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice"
    )


def test_branch_isolated_appends_and_fast_forward(spark, sf_small, tmp_path):
    o = _orders(spark, sf_small)
    base = str(tmp_path / "ds")
    publish_versioned(o.filter(F.col("o_orderkey") % 2 == 0), base)  # v1
    n_main = o.filter(F.col("o_orderkey") % 2 == 0).count()
    create_branch(spark, base, "exp1")
    publish_append(
        o.filter(F.col("o_orderkey") % 2 == 1), base, branch="exp1"
    )  # v2 on the branch
    # main unchanged, branch sees both segments
    main, mm = read_version_chain(spark, base)
    assert mm[0]["version"] == 1 and main.count() == n_main
    br, bm = read_branch(spark, base, "exp1")
    assert bm[0]["version"] == 2 and br.count() == o.count()
    # fast-forward: main was the branch's ancestor
    assert merge_branch(spark, base, "exp1") == 2
    main2, _ = read_version_chain(spark, base)
    assert main2.count() == o.count()
    assert not lakefs.exists(spark, f"{base}/BRANCH_exp1")


def test_diverged_main_refuses_fast_forward(spark, sf_small, tmp_path):
    o = _orders(spark, sf_small)
    base = str(tmp_path / "ds")
    publish_versioned(o.limit(100), base)  # v1
    create_branch(spark, base, "exp")
    publish_append(o.limit(10), base, branch="exp")  # v2 (branch)
    publish_append(o.limit(20), base)  # v3 (main moved!)
    with pytest.raises(ValueError, match="diverged"):
        merge_branch(spark, base, "exp")
    # branch still intact and readable after the refusal
    assert branch_head(spark, base, "exp") == 2
    br, _ = read_branch(spark, base, "exp")
    assert br.count() == 110


def test_vacuum_protects_branch_chain(spark, sf_small, tmp_path):
    o = _orders(spark, sf_small)
    base = str(tmp_path / "ds")
    publish_versioned(o.limit(50), base)  # v1
    create_branch(spark, base, "keepme")
    publish_append(o.limit(10), base, branch="keepme")  # v2
    publish_versioned(o.limit(70), base)  # v3 (main full publish)
    publish_versioned(o.limit(80), base)  # v4
    deleted = vacuum_versions(spark, base, keep_last=1)
    # v4 (LATEST) kept; branch head v2 and its ancestor v1 kept; v3 gone
    assert deleted == [3]
    br, _ = read_branch(spark, base, "keepme")
    assert br.count() == 60
    # releasing the branch frees its chain on the next vacuum
    delete_branch(spark, base, "keepme")
    deleted2 = vacuum_versions(spark, base, keep_last=1)
    assert set(deleted2) == {1, 2}


def test_branch_name_hygiene(spark, sf_small, tmp_path):
    o = _orders(spark, sf_small)
    base = str(tmp_path / "ds")
    publish_versioned(o.limit(5), base)
    for bad in ("", "has space", "LATEST", "staged"):
        with pytest.raises(ValueError):
            create_branch(spark, base, bad)
    create_branch(spark, base, "ok-name_1")
    with pytest.raises(ValueError, match="already exists"):
        create_branch(spark, base, "ok-name_1")


def test_stream_tails_a_named_branch(spark, sf_small, tmp_path):
    """A subscriber with option('branch', name) follows the branch's
    commits and never sees main's — the streaming face of branch
    isolation."""
    from novelti_dingo_spark.sources.lake_stream import (
        register_lake_stream_source,
    )

    register_lake_stream_source(spark)
    o = _orders(spark, sf_small)
    base = str(tmp_path / "lake")
    publish_versioned(o.limit(100), base)  # v1 (shared base)
    create_branch(spark, base, "exp")
    sink = str(tmp_path / "sink")
    q = (
        spark.readStream.format("lake_chain")
        .option("path", base)
        .option("branch", "exp")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def settled_count():
        # processAllAvailable blocks until every offset visible at the
        # time of the call has been committed to the sink — a
        # deterministic sync point regardless of machine load (the old
        # fixed-interval sleep poll flaked whenever the 300 ms trigger
        # was starved by concurrent suites).
        q.processAllAvailable()
        try:
            return spark.read.parquet(sink).count()
        except Exception:
            return 0

    try:
        assert settled_count() == 100  # the shared base
        publish_append(o.limit(150), base)  # main moves: not ours
        publish_append(
            o.filter(F.col("o_orderkey") > 10_000_000), base, branch="exp"
        )  # empty branch append — a commit, zero rows
        publish_append(o.limit(130), base, branch="exp")
        # only the BRANCH commits arrive (130 rows; main's 150 never do)
        assert settled_count() == 230
    finally:
        q.stop()


def test_rebase_diverged_branch_then_fast_forward(spark, sf_small, tmp_path):
    """rebase_branch replays the branch-only appends onto the moved
    main, after which merge_branch fast-forwards; no row is lost or
    duplicated and the abandoned segments become vacuum garbage."""
    from novelti_dingo_spark.pipelines import rebase_branch

    o = _orders(spark, sf_small)
    base = str(tmp_path / "ds")
    m0 = o.filter(F.col("o_orderkey") % 4 == 0)
    m1 = o.filter(F.col("o_orderkey") % 4 == 1)
    b2 = o.filter(F.col("o_orderkey") % 4 == 2)
    b3 = o.filter(F.col("o_orderkey") % 4 == 3)
    publish_versioned(m0, base)  # v1
    create_branch(spark, base, "exp")
    publish_append(b2, base, branch="exp")  # v2 (branch)
    publish_append(b3, base, branch="exp")  # v3 (branch)
    publish_append(m1, base)  # v4 (main moved → diverged)
    with pytest.raises(ValueError, match="cannot fast-forward"):
        merge_branch(spark, base, "exp")
    old_branch_versions = {2, 3}
    new_head = rebase_branch(spark, base, "exp")
    assert new_head == branch_head(spark, base, "exp") == 6
    br, bm = read_branch(spark, base, "exp")
    assert br.count() == o.count()
    # replayed segments chain onto main's head, not the old fork
    assert {m["version"] for m in bm} == {1, 4, 5, 6}
    merged = merge_branch(spark, base, "exp")
    assert merged == new_head
    main, _ = read_version_chain(spark, base)
    assert main.count() == o.count()
    assert main.select("o_orderkey").distinct().count() == o.count()
    # the pre-rebase branch segments are unreachable → vacuumable
    deleted = vacuum_versions(spark, base, keep_last=1)
    # chain expansion keeps {6,5,4,1}; only the orphaned segments go
    assert set(deleted) == old_branch_versions


def test_rebase_noop_and_refusals(spark, sf_small, tmp_path):
    from novelti_dingo_spark.pipelines import (
        delete_rows_mor,
        rebase_branch,
    )

    o = _orders(spark, sf_small)
    base = str(tmp_path / "ds")
    publish_versioned(o.filter(F.col("o_orderkey") % 2 == 0), base)  # v1
    create_branch(spark, base, "exp")
    publish_append(
        o.filter(F.col("o_orderkey") % 2 == 1), base, branch="exp"
    )  # v2
    # main has not moved: rebase is a no-op, head unchanged
    assert rebase_branch(spark, base, "exp") == 2
    # a branch segment carrying schema evolution refuses to replay
    base2 = str(tmp_path / "ds2")
    publish_versioned(o, base2)  # v1
    create_branch(spark, base2, "exp")
    publish_append(
        o.withColumn("flag", F.lit(1)), base2, branch="exp",
        evolve="additive",
    )  # v2 (branch, adds a column)
    publish_append(o.limit(5), base2)  # v3: main moves
    with pytest.raises(ValueError, match="schema/partition evolution"):
        rebase_branch(spark, base2, "exp")
    # main evolving since the fork also refuses (schema mismatch)
    base3 = str(tmp_path / "ds3")
    publish_versioned(o, base3)  # v1
    create_branch(spark, base3, "exp")
    publish_append(o.limit(3), base3, branch="exp")  # v2 (plain)
    publish_append(
        o.withColumn("flag", F.lit(1)), base3, evolve="additive"
    )  # v3: main evolved
    with pytest.raises(ValueError, match="schema differs"):
        rebase_branch(spark, base3, "exp")
