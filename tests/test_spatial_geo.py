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


def _pip_ref(px, py, verts):
    """Independent reference ray-casting (crossing number)."""
    n = len(verts)
    inside = False
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if (y1 <= py < y2) or (y2 <= py < y1):
            cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
            if (y2 > y1 and cross > 0) or (y2 < y1 and cross < 0):
                inside = not inside
    return inside


def test_point_in_polygon_matches_reference(spark, sf_med):
    from novelti_dingo_spark.operators.spatial import (
        POLYGONS,
        spatial_point_in_polygon,
    )

    cid, cla, clo = _coords(sf_med, "customer", "c_custkey")
    lat = np.degrees(cla)
    lon = np.degrees(clo)
    want: dict[str, set[int]] = {name: set() for name in POLYGONS}
    for k, key in enumerate(cid):
        for name, verts in sorted(POLYGONS.items()):
            if _pip_ref(lat[k], lon[k], verts):
                want[name].add(int(key))
                break
    rows = spatial_point_in_polygon(spark, sf_med).collect()
    got = {r.polygon_id: r.n_customers for r in rows}
    assert got == {
        n: len(s) for n, s in want.items() if s
    }
    for r in rows:
        assert r.first_cust == min(want[r.polygon_id])
        assert r.last_cust == max(want[r.polygon_id])


def test_point_in_polygon_codegen_compiles(spark, sf_med):
    """Regression for the round-8 Janino 64 KB overflow: the unrolled
    ray-cast CASE blew the fused scan->agg method limit and the whole
    stage silently ran interpreted. With fallback disabled, a compile
    failure raises — so this test passing proves the HOF-folded form
    stays within the method limit AND produces the same rows."""
    from novelti_dingo_spark.operators.spatial import spatial_point_in_polygon

    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        rows = spatial_point_in_polygon(spark, sf_med).collect()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")
    assert {r.polygon_id for r in rows} == {"quad_west", "notch_east"}


def test_polygon_concavity_actually_excludes_notch():
    """notch_east is concave: a point inside its convex hull but in
    the notch must be OUTSIDE — the case a bounding-box or convex test
    gets wrong."""
    from novelti_dingo_spark.operators.spatial import POLYGONS

    verts = POLYGONS["notch_east"]
    assert _pip_ref(46.5, 2.2, verts)  # solidly inside
    assert not _pip_ref(45.2, 3.4, verts)  # inside hull, in the notch
    assert not _pip_ref(43.0, 2.0, verts)  # below the polygon


def test_no_corpus_point_near_polygon_edges(sf_med, sf_big):
    """The exact even-odd test is cross-engine-sound because no corpus
    point sits ON (or at float distance from) a polygon edge — pin the
    measured margin like the radius-boundary guard."""
    from novelti_dingo_spark.operators.spatial import POLYGONS

    for sf_dir in (sf_med, sf_big):
        _, cla, clo = _coords(sf_dir, "customer", "c_custkey")
        px = np.degrees(cla)
        py = np.degrees(clo)
        for verts in POLYGONS.values():
            n = len(verts)
            for i in range(n):
                x1, y1 = verts[i]
                x2, y2 = verts[(i + 1) % n]
                # distance of every point to the edge segment
                vx, vy = x2 - x1, y2 - y1
                t = np.clip(
                    ((px - x1) * vx + (py - y1) * vy) / (vx * vx + vy * vy),
                    0.0,
                    1.0,
                )
                d = np.hypot(px - (x1 + t * vx), py - (y1 + t * vy))
                assert d.min() > 1e-6, (sf_dir, i)


def test_polygon_join_matches_reference_and_overlap(spark, sf_med):
    """spatial_polygon_join vs the pure-python ray-cast over every
    (point, polygon) pair — and the overlap region must emit one row
    per CONTAINING polygon (join semantics, not first-match)."""
    from novelti_dingo_spark.operators.spatial import (
        TABLE_POLYGONS,
        spatial_polygon_join,
    )

    cid, cla, clo = _coords(sf_med, "customer", "c_custkey")
    lat = np.degrees(cla)
    lon = np.degrees(clo)
    want: dict[str, set[int]] = {name: set() for name in TABLE_POLYGONS}
    per_point: dict[int, int] = {}
    for k, key in enumerate(cid):
        for name, verts in TABLE_POLYGONS.items():
            if _pip_ref(lat[k], lon[k], verts):
                want[name].add(int(key))
                per_point[int(key)] = per_point.get(int(key), 0) + 1
    rows = spatial_polygon_join(spark, sf_med).collect()
    got = {r.polygon_id: r.n_customers for r in rows}
    assert got == {n: len(s) for n, s in want.items() if s}
    for r in rows:
        assert r.first_cust == min(want[r.polygon_id])
        assert r.last_cust == max(want[r.polygon_id])
    # the polygon set genuinely overlaps: some point is inside >1 polygon
    assert any(v > 1 for v in per_point.values()), (
        "fixture polygons never overlap — overlap semantics untested"
    )
