"""Geodesic (haversine) radius join: completeness vs a numpy brute
force, the ulp-safety margin guard the cross-engine hash match relies
on, latitude-corrected cell-width invariants, and candidate-reduction
evidence that the banded grid actually blocks."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from novelti_dingo_spark.operators.spatial import (
    CELL_LAT_GEO,
    EARTH_R_KM,
    KM_PER_DEG_LAT,
    RADIUS_KM,
    _points,
    lat_expr,
    lon_expr,
    radius_join_geo,
    spatial_radius_join_geo,
)


def _coords(sf_dir: str, table: str, key: str):
    rows = duckdb.sql(
        f"SELECT {key}, {lat_expr(key)} AS lat, {lon_expr(key)} AS lon "
        f"FROM '{sf_dir}/{table}.parquet' ORDER BY {key}"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    lat = np.radians(np.array([r[1] for r in rows]))
    lon = np.radians(np.array([r[2] for r in rows]))
    return ids, lat, lon


def _hav_matrix(la1, lo1, la2, lo2):
    a = (
        np.sin((la1[:, None] - la2[None, :]) / 2) ** 2
        + np.cos(la1)[:, None]
        * np.cos(la2)[None, :]
        * np.sin((lo1[:, None] - lo2[None, :]) / 2) ** 2
    )
    return 2 * EARTH_R_KM * np.arcsin(np.sqrt(a))


def test_geo_join_complete_vs_numpy(spark, sf_med):
    cid, cla, clo = _coords(sf_med, "customer", "c_custkey")
    sid, sla, slo = _coords(sf_med, "supplier", "s_suppkey")
    d = _hav_matrix(cla, clo, sla, slo)
    want = {
        (int(cid[i]), int(sid[j]))
        for i, j in zip(*np.where(d <= RADIUS_KM))
    }
    got = {
        (r.c_custkey, r.s_suppkey)
        for r in spatial_radius_join_geo(spark, sf_med).collect()
    }
    assert got == want
    assert len(want) > 100  # non-trivial at sf0.01


def test_boundary_margin_guards_ulp_drift(sf_med, sf_big):
    """The cross-engine hash match is only sound if no pair sits at
    ulp distance from the radius boundary — pin the measured margin at
    BOTH gate scale factors (>= 1e-4 km, eleven orders above libm
    drift). If testdata ever regenerates closer to the boundary, this
    fails before the oracle gate silently could."""
    for sf_dir in (sf_med, sf_big):
        _, cla, clo = _coords(sf_dir, "customer", "c_custkey")
        _, sla, slo = _coords(sf_dir, "supplier", "s_suppkey")
        d = _hav_matrix(cla, clo, sla, slo)
        assert np.abs(d - RADIUS_KM).min() > 1e-4, sf_dir


def test_lat_band_completeness_bounds():
    """The two analytic facts the grid relies on, checked numerically
    over the corpus latitude band: (1) a true pair spans at most half
    a latitude row; (2) its longitude span is at most half the
    looked-up row's corrected cell width."""
    r_deg_lat = RADIUS_KM / KM_PER_DEG_LAT
    assert 2 * r_deg_lat <= CELL_LAT_GEO + 1e-12
    for lat_deg in np.linspace(0, 75, 16):
        phi = np.radians(lat_deg)
        # max lon span of a true pair at this latitude (exact bound)
        dlam = 2 * np.arcsin(
            min(np.sin(RADIUS_KM / (2 * EARTH_R_KM)) / np.cos(phi), 1.0)
        )
        span_deg = np.degrees(dlam)
        # the width used for any row this pair can be looked up in —
        # its correction latitude is at least as extreme as the pair's
        width = (
            2 * RADIUS_KM * 1.02 / KM_PER_DEG_LAT / np.cos(phi)
        )
        assert span_deg <= width / 2 + 1e-12, lat_deg


def test_geo_blocking_reduces_candidates(spark, sf_med):
    """The banded grid must propose far fewer candidates than the
    cross product — the point of blocking."""
    c = _points(spark, sf_med, "customer", "c_custkey")
    s = _points(spark, sf_med, "supplier", "s_suppkey")
    n_c, n_s = c.count(), s.count()
    got = radius_join_geo(c, s)
    n_pairs = got.count()
    # candidate count = pairs surviving the CELL join, before the
    # distance filter: rebuild without the residual predicate
    row = F.floor(F.col("lat") / F.lit(CELL_LAT_GEO))
    from novelti_dingo_spark.operators.spatial import _lon_cell_width

    lc = c.select(
        "c_custkey",
        row.alias("_gx"),
        F.floor(F.col("lon") / _lon_cell_width(row)).alias("_gy"),
    )
    cells = []
    for drow in (-1, 0, 1):
        trow = row + drow
        base = F.floor(F.col("lon") / _lon_cell_width(trow))
        for dcol in (-1, 0, 1):
            cells.append(F.struct(trow.alias("_gx"), (base + dcol).alias("_gy")))
    rc = s.select(
        "s_suppkey", F.explode(F.array(*cells)).alias("_cell")
    ).select("s_suppkey", "_cell._gx", "_cell._gy")
    n_cand = lc.join(rc, ["_gx", "_gy"]).count()
    assert n_pairs <= n_cand
    assert n_cand < 0.05 * n_c * n_s, (n_cand, n_c * n_s)


def test_high_latitude_wrong_with_planar_right_with_geo(spark):
    """The failure mode the geodesic variant exists for: at 70N a
    planar-degrees radius calls two points 'near' that are ~0.14 deg
    apart in longitude even though that is only ~5.3 km east-west —
    and misses nothing — while at the same planar distance along
    latitude the true km distance differs by ~3x. Check the geodesic
    join classifies by true km, not degrees."""
    rows = [
        # (id, lat, lon): A-B differ only in lon by 0.35 deg at 70N
        # -> planar 0.35 deg "far" (> 0.15), but true dist ~13.3 km < 15
        (1, 70.0, 10.00),
        (2, 70.0, 10.35),
        # C-D differ in lat by 0.35 deg -> same planar separation, but
        # true dist ~38.9 km > 15 km
        (3, 70.0, 20.00),
        (4, 70.35, 20.00),
    ]
    df = spark.createDataFrame(rows, "id int, lat double, lon double")
    left = df.select(F.col("id").alias("lid"), "lat", "lon")
    right = df.select(F.col("id").alias("rid"), "lat", "lon")
    got = {
        (r.lid, r.rid)
        for r in radius_join_geo(left, right).collect()
        if r.lid < r.rid
    }
    assert (1, 2) in got  # near in km despite 0.35 deg of lon
    assert (3, 4) not in got  # far in km at the same deg separation


def test_geo_join_broadcast_knob_matches(spark, sf_med):
    c = _points(spark, sf_med, "customer", "c_custkey")
    s = _points(spark, sf_med, "supplier", "s_suppkey")
    a = {
        (r.c_custkey, r.s_suppkey, r.dist_km)
        for r in radius_join_geo(c, s).collect()
    }
    b = {
        (r.c_custkey, r.s_suppkey, r.dist_km)
        for r in radius_join_geo(c, s, broadcast_right=True).collect()
    }
    assert a == b


def test_geo_top1_rank_gap_guard(sf_med, sf_big):
    """spatial_nearest_supplier_geo ranks RAW haversine doubles (libm),
    which is cross-engine-sound only while best-vs-second-best gaps
    dwarf ulp drift — pin the measured margin at both gate SFs."""
    for sf_dir in (sf_med, sf_big):
        _, cla, clo = _coords(sf_dir, "customer", "c_custkey")
        _, sla, slo = _coords(sf_dir, "supplier", "s_suppkey")
        d = _hav_matrix(cla, clo, sla, slo)
        within = d <= RADIUS_KM
        gaps = []
        for i in range(d.shape[0]):
            dr = np.sort(d[i][within[i]])
            if len(dr) >= 2:
                gaps.append(dr[1] - dr[0])
        assert gaps and min(gaps) > 1e-6, sf_dir
