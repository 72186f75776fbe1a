"""Publish-time constraint enforcement (pipelines.publish_checked):
fail mode aborts with per-constraint counts and leaves no version;
quarantine mode splits exactly, names every broken constraint per row,
and records the audit in the manifest."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import publish_checked, read_version
from novelti_dingo_spark.sources import load_table
from novelti_dingo_spark.sources import lakefs


def test_fail_mode_aborts_and_publishes_nothing(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "events_checked")
    ev = load_table(spark, sf_small, "events")
    with pytest.raises(ValueError, match="rejected"):
        publish_checked(
            ev, base, [("value_capped", "check", F.col("value") <= 100)]
        )
    assert not lakefs.exists(spark, f"{base}/LATEST")


def test_fail_mode_clean_data_publishes(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "events_ok")
    ev = load_table(spark, sf_small, "events")
    v, audit = publish_checked(
        ev,
        base,
        [
            ("value_nonneg", "check", F.col("value") >= 0),
            ("ids", "not_null", ["event_id", "user_id"]),
            ("pk", "unique", ["event_id"]),
        ],
    )
    assert v == 1
    assert audit["rows_quarantined"] == 0
    assert set(audit["violations"].values()) == {0}
    df, manifest = read_version(spark, base)
    assert df.count() == ev.count()
    assert manifest["constraints"]["checked"] == ["value_nonneg", "ids", "pk"]


def test_quarantine_splits_exactly(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "events_q")
    ev = load_table(spark, sf_small, "events")
    n = ev.count()
    n_bad = ev.filter(F.col("value") > 100).count()
    assert 0 < n_bad < n
    v, audit = publish_checked(
        ev,
        base,
        [("value_capped", "check", F.col("value") <= 100)],
        on_violation="quarantine",
    )
    assert audit["rows_quarantined"] == n_bad
    assert audit["violations"]["value_capped"] == n_bad
    clean, manifest = read_version(spark, base)
    assert clean.count() == n - n_bad
    assert clean.filter(F.col("value") > 100).count() == 0
    assert "_violations" not in clean.columns
    q = spark.read.parquet(f"{base}_quarantine")
    assert q.count() == n_bad
    assert q.filter(F.array_contains("_violations", "value_capped")).count() == n_bad
    assert manifest["constraints"]["violations"]["value_capped"] == n_bad


def test_unique_flags_all_copies_and_multi_violations(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "events_dup")
    ev = load_table(spark, sf_small, "events").limit(50)
    dup = ev.limit(3)  # re-appended ids -> 6 rows share a key
    both = ev.unionByName(dup).withColumn(
        "value",
        F.when(F.col("event_id") == 0, F.lit(-1.0)).otherwise(F.col("value")),
    )
    v, audit = publish_checked(
        both,
        base,
        [
            ("value_nonneg", "check", F.col("value") >= 0),
            ("pk", "unique", ["event_id"]),
        ],
        on_violation="quarantine",
    )
    assert audit["violations"]["pk"] == 6  # every copy of a dup key flags
    q = spark.read.parquet(f"{base}_quarantine")
    # event_id 0 was duplicated AND negative: both names on its rows
    multi = q.filter(F.col("event_id") == 0).select("_violations").collect()
    assert multi and all(
        set(r._violations) == {"value_nonneg", "pk"} for r in multi
    )
    clean, _ = read_version(spark, base)
    assert clean.filter(F.col("event_id") == 0).count() == 0
    # clean set keeps no dup keys
    assert clean.groupBy("event_id").count().filter("count > 1").count() == 0


def test_fk_constraint_flags_orphans(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "events_fk")
    ev = load_table(spark, sf_small, "events").limit(100)
    cust = load_table(spark, sf_small, "customer")
    # manufacture orphans: shift some user_ids beyond the customer range
    maxk = cust.agg(F.max("c_custkey")).head()[0]
    dirty = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 == 0, F.col("user_id") + maxk + 1000)
        .otherwise(F.col("user_id")),
    )
    n_orphan = dirty.filter(F.col("event_id") % 10 == 0).count()
    v, audit = publish_checked(
        dirty,
        base,
        [("valid_user", "fk", ("user_id", cust, "c_custkey"))],
        on_violation="quarantine",
    )
    assert audit["violations"]["valid_user"] == n_orphan
    clean, _ = read_version(spark, base)
    assert clean.count() == 100 - n_orphan
    # every surviving row joins a real customer
    orphans_left = clean.join(
        cust.select(F.col("c_custkey").alias("user_id")), "user_id", "left_anti"
    ).count()
    assert orphans_left == 0


def test_fk_null_is_not_a_violation(spark, sf_small, tmp_path):
    base = os.path.join(str(tmp_path), "events_fknull")
    ev = load_table(spark, sf_small, "events").limit(20)
    cust = load_table(spark, sf_small, "customer")
    with_null = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(None)).otherwise(
            F.col("user_id")
        ),
    )
    v, audit = publish_checked(
        with_null,
        base,
        [("valid_user", "fk", ("user_id", cust, "c_custkey"))],
        on_violation="quarantine",
    )
    assert audit["violations"]["valid_user"] == 0
    clean, _ = read_version(spark, base)
    assert clean.count() == 20


def test_unknown_kind_rejected(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events")
    with pytest.raises(ValueError, match="unknown kind"):
        publish_checked(
            ev, os.path.join(str(tmp_path), "x"), [("c", "regex", "x")]
        )


def test_expectations_gate_the_publish(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events")
    base = os.path.join(str(tmp_path), "ev_exp")
    # value > 100 happens on well over 0.1% of rows -> rate_max fails
    with pytest.raises(ValueError, match="expectations failed"):
        publish_checked(
            ev,
            base,
            [],
            expectations=[
                ("value_outliers", "rate_max", (F.col("value") > 100, 0.001)),
            ],
        )
    assert not lakefs.exists(spark, f"{base}/LATEST")
    # record mode publishes anyway and the manifest carries the measure
    v, audit = publish_checked(
        ev,
        base,
        [],
        expectations=[
            ("value_outliers", "rate_max", (F.col("value") > 100, 0.001)),
            ("users_present", "ndv_min", ("user_id", 5)),
        ],
        expectations_action="record",
    )
    assert audit["expectations"]["value_outliers"]["pass"] is False
    assert audit["expectations"]["value_outliers"]["value"] > 0.001
    assert audit["expectations"]["users_present"]["pass"] is True
    _, manifest = read_version(spark, base)
    assert manifest["constraints"]["expectations"]["users_present"]["pass"]


def test_expectations_pass_with_row_constraints_one_pass(
    spark, sf_small, tmp_path
):
    ev = load_table(spark, sf_small, "events")
    base = os.path.join(str(tmp_path), "ev_both")
    v, audit = publish_checked(
        ev,
        base,
        [("value_capped", "check", F.col("value") <= 100)],
        on_violation="quarantine",
        expectations=[
            ("ts_set", "rate_max", (F.col("ts").isNull(), 0.0)),
        ],
    )
    assert audit["expectations"]["ts_set"]["pass"] is True
    assert audit["rows_quarantined"] > 0  # both kinds coexisted


def test_mv_staleness_contract(spark, sf_small, tmp_path):
    from novelti_dingo_spark.plans.mv import MvSpec, publish_mv, rewrite_agg

    li = load_table(spark, sf_small, "lineitem")
    base = os.path.join(str(tmp_path), "mv_stale")
    publish_mv(
        li,
        base,
        MvSpec(("l_returnflag",), {"n_items": ("count", None)}),
        published_ts="2026-01-01T00:00:00.000000Z",
    )
    m = {"n_items": "n_items"}
    assert rewrite_agg(
        spark, base, ["l_returnflag"], m,
        min_published_ts="2026-02-01T00:00:00.000000Z",
    ) is None  # stale -> fall back to the fact
    assert rewrite_agg(
        spark, base, ["l_returnflag"], m,
        min_published_ts="2025-12-01T00:00:00.000000Z",
    ) is not None
