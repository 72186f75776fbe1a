"""Write-audit-publish (WAP): staged candidates are invisible to
LATEST followers, audits run against the written files and gate
promotion, promotion is a pointer flip, abort and vacuum never touch
published versions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import (
    abort_staged,
    audit_staged,
    promote_staged,
    publish_staged,
    publish_versioned,
    read_staged,
    read_version,
    vacuum_versions,
)
from novelti_dingo_spark.sources import lakefs, load_table


def _orders(spark, sf):
    return load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def test_staged_invisible_until_promoted(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "ds")
    df = _orders(spark, sf_small)
    v1 = publish_versioned(df.filter(F.col("o_orderkey") % 2 == 0), base)
    n1 = read_version(spark, base)[0].count()

    v2 = publish_staged(df, base)
    assert v2 == v1 + 1
    # LATEST followers still see v1
    got, manifest = read_version(spark, base)
    assert manifest["version"] == v1 and got.count() == n1
    # the candidate is readable through the staged pointer, flagged
    staged, smani = read_staged(spark, base)
    assert smani["staged"] is True
    assert staged.count() == df.count() > n1

    audit = audit_staged(
        spark, base, constraints=[("price_pos", "check", F.col("o_totalprice") > 0)]
    )
    assert audit["pass"]
    assert promote_staged(spark, base) == v2
    got2, mani2 = read_version(spark, base)
    assert mani2["version"] == v2 and got2.count() == df.count()
    assert mani2["wap_audit"]["pass"] and "staged" not in mani2
    assert not lakefs.exists(spark, f"{base}/STAGED")


def test_failed_audit_blocks_promotion_and_abort_cleans(
    spark, sf_small, tmp_path
):
    base = os.path.join(str(tmp_path), "ds")
    df = _orders(spark, sf_small)
    publish_versioned(df.limit(10), base)
    v = publish_staged(
        df.withColumn("o_totalprice", -F.col("o_totalprice")), base
    )
    audit = audit_staged(
        spark,
        base,
        constraints=[("price_pos", "check", F.col("o_totalprice") > 0)],
        expectations=[("enough_orders", "ndv_min", ("o_orderkey", 5))],
    )
    assert not audit["pass"]
    assert audit["constraints"]["price_pos"] > 0
    assert audit["expectations"]["enough_orders"]["pass"]
    with pytest.raises(ValueError, match="refusing to promote"):
        promote_staged(spark, base)
    # LATEST unmoved
    assert read_version(spark, base)[1]["version"] == 1
    aborted = abort_staged(spark, base)
    assert aborted == v
    assert not lakefs.exists(spark, f"{base}/v={v}")
    assert not lakefs.exists(spark, f"{base}/STAGED")
    assert read_version(spark, base)[0].count() == 10


def test_unaudited_candidate_refused_unless_overridden(
    spark, sf_small, tmp_path
):
    base = os.path.join(str(tmp_path), "ds")
    df = _orders(spark, sf_small)
    publish_versioned(df.limit(5), base)
    v = publish_staged(df.limit(50), base)
    with pytest.raises(ValueError, match="no audit_staged record"):
        promote_staged(spark, base)
    assert promote_staged(spark, base, require_audit_pass=False) == v
    assert read_version(spark, base)[0].count() == 50


def test_restage_orphans_old_candidate_and_vacuum_reclaims(
    spark, sf_small, tmp_path
):
    base = os.path.join(str(tmp_path), "ds")
    df = _orders(spark, sf_small)
    publish_versioned(df.limit(5), base)  # v1
    v2 = publish_staged(df.limit(10), base)
    v3 = publish_staged(df.limit(20), base)  # STAGED moves; v2 orphaned
    assert int(lakefs.read_text(spark, f"{base}/STAGED").strip()) == v3
    # vacuum keeps LATEST (v1) and the live candidate (v3); the
    # orphaned v2 is reclaimable garbage
    deleted = vacuum_versions(spark, base, keep_last=1)
    assert v2 in deleted and v3 not in deleted
    assert lakefs.exists(spark, f"{base}/v={v3}")
    assert read_version(spark, base)[1]["version"] == 1
    audit = audit_staged(spark, base)
    assert audit["pass"]  # vacuously: no constraints declared
    assert promote_staged(spark, base) == v3


def test_unique_constraint_counts_duplicate_keys(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "ds")
    df = _orders(spark, sf_small).limit(100)
    publish_staged(df.unionByName(df.limit(7)), base)
    audit = audit_staged(
        spark, base, constraints=[("pk", "unique", ["o_orderkey"])]
    )
    assert audit["constraints"]["pk"] == 7 and not audit["pass"]


def test_append_parents_from_latest_not_staged_candidate(
    spark, sf_small, tmp_path
):
    """An append while a WAP candidate is staged must chain off LATEST:
    chaining off max(existing) would pull the unpromoted candidate's
    rows into main."""
    base = os.path.join(str(tmp_path), "ds")
    df = _orders(spark, sf_small)
    publish_versioned(df.limit(10), base)  # v1 = LATEST
    publish_staged(df.limit(500), base)  # v2 = candidate
    from novelti_dingo_spark.pipelines import (
        publish_append,
        read_version_chain,
    )

    v3 = publish_append(df.limit(20), base)  # must parent v1
    got, manifests = read_version_chain(spark, base)
    assert [m["version"] for m in manifests] == [v3, 1]
    assert got.count() == 30  # candidate's 500 rows stayed invisible
    # the candidate is still intact and promotable afterwards
    from novelti_dingo_spark.pipelines import read_staged

    staged, smani = read_staged(spark, base)
    assert smani["version"] == 2 and staged.count() == 500


def test_append_on_staged_only_base_refused(spark, sf_small, tmp_path):
    """A dataset whose FIRST commit is an unpromoted WAP candidate has
    no published line at all — an append must not chain off the staged
    version and flip LATEST over it (regression: the max(existing)
    fallback made un-audited staged bytes readable from main)."""
    from novelti_dingo_spark.pipelines import publish_append

    base = os.path.join(str(tmp_path), "ds")
    df = _orders(spark, sf_small)
    publish_staged(df.limit(5), base)  # fresh base: no LATEST yet
    with pytest.raises(ValueError, match="STAGED"):
        publish_append(df.limit(3), base)
    # candidate untouched and still promotable; main still unreadable
    staged, smani = read_staged(spark, base)
    assert staged.count() == 5 and smani["staged"] is True
    assert not lakefs.exists(spark, f"{base}/LATEST")
    v = promote_staged(spark, base, require_audit_pass=False)
    got, mani = read_version(spark, base)
    assert mani["version"] == v and got.count() == 5
    # and appends work normally once a published line exists
    publish_append(df.limit(3), base)
    from novelti_dingo_spark.pipelines import read_version_chain

    assert read_version_chain(spark, base)[0].count() == 8


def test_promotion_refuses_moved_base(spark, sf_small, tmp_path):
    """If main moved after staging, promotion would discard the new
    commit — refused unless explicitly overridden."""
    from novelti_dingo_spark.pipelines import publish_append

    base = os.path.join(str(tmp_path), "ds")
    df = _orders(spark, sf_small)
    publish_versioned(df.limit(10), base)  # v1
    publish_staged(df.limit(50), base)  # v2 staged off v1
    publish_append(df.limit(20), base)  # v3: main moved
    with pytest.raises(ValueError, match="LATEST moved"):
        promote_staged(spark, base, require_audit_pass=False)
    assert read_version(spark, base)[1]["version"] == 3
    v = promote_staged(
        spark, base, require_audit_pass=False, allow_moved_base=True
    )
    assert v == 2 and read_version(spark, base)[0].count() == 50
