"""Geo point queries (LatLonPoint box/distance/nearest analogues)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _pts(spark):
    # 1,000 deterministic points covering the globe incl. dateline edges
    return spark.range(1000).select(
        F.col("id"),
        ((F.col("id") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("id") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    )


def test_box_query_and_dateline_split(spark):
    from lucene_spark.relational.geo import geo_box

    pts = _pts(spark)
    plain = geo_box(pts, "lat", "lon", -10, 10, 20, 60).collect()
    assert plain and all(-10 <= r.lat <= 10 and 20 <= r.lon <= 60 for r in plain)

    # dateline-crossing box (GeoUtils.java:158): min_lon > max_lon
    wrapped = geo_box(pts, "lat", "lon", -90, 90, 170, -170).collect()
    assert wrapped and all(r.lon >= 170 or r.lon <= -170 for r in wrapped)
    # equals the union of the two straight boxes
    a = {r.id for r in geo_box(pts, "lat", "lon", -90, 90, 170, 180).collect()}
    b = {r.id for r in geo_box(pts, "lat", "lon", -90, 90, -180, -170).collect()}
    assert {r.id for r in wrapped} == a | b


def test_distance_query_matches_exhaustive_haversine(spark):
    from lucene_spark.relational.geo import geo_distance, haversine_meters

    pts = _pts(spark)
    r_m = 3_000_000.0
    got = {r.id for r in geo_distance(pts, "lat", "lon", 48.85, 2.35, r_m).collect()}
    # exhaustive: no bbox prefilter — the box must never cut a true hit
    exact = {
        r.id
        for r in pts.withColumn(
            "d", haversine_meters(F.col("lat"), F.col("lon"),
                                  F.lit(48.85), F.lit(2.35))
        ).filter(F.col("d") <= r_m).collect()
    }
    assert got == exact and got


def test_distance_bbox_is_conservative_at_edges(spark):
    """Regression: the circle bbox must use the EXACT max longitude
    deviation asin(sin(r/R)/cosφ) — a linear approximation drops a thin
    crescent of true hits at high latitude; a pole-containing circle
    spans all longitudes."""
    from lucene_spark.relational.geo import geo_distance, haversine_meters

    # point in the crescent the linear bbox used to drop:
    # dist(center=(48.85,2.35), p=(57.99,45.93)) ≈ 2,999,999 m ≤ 3,000 km
    pts = spark.createDataFrame(
        [(1, 57.99, 45.93), (2, 85.0, 180.0), (3, 0.0, 0.0)],
        "id long, lat double, lon double")
    got1 = {r.id for r in geo_distance(
        pts, "lat", "lon", 48.85, 2.35, 3_000_000.0).collect()}
    exact1 = {
        r.id for r in pts.withColumn(
            "d", haversine_meters(F.col("lat"), F.col("lon"),
                                  F.lit(48.85), F.lit(2.35))
        ).filter(F.col("d") <= 3_000_000.0).collect()}
    assert got1 == exact1 and 1 in got1

    # circle containing the north pole: (85,180) is ~35° from (60,0)
    # over the top — inside a ~40° radius despite the 180° lon gap
    got2 = {r.id for r in geo_distance(
        pts, "lat", "lon", 60.0, 0.0, 4_445_000.0).collect()}
    exact2 = {
        r.id for r in pts.withColumn(
            "d", haversine_meters(F.col("lat"), F.col("lon"),
                                  F.lit(60.0), F.lit(0.0))
        ).filter(F.col("d") <= 4_445_000.0).collect()}
    assert got2 == exact2 and 2 in got2


def test_distance_formula_sanity(spark):
    from lucene_spark.relational.geo import haversine_meters

    one = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
    # 1 degree of longitude at the equator ≈ 111.195 km (mean-radius sphere)
    d = one.select(haversine_meters(
        F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(1.0)).alias("d")).first()["d"]
    assert math.isclose(d, 111_195, rel_tol=1e-3)


def test_nearest_is_take_ordered_not_global_sort(spark):
    from lucene_spark.relational.geo import geo_nearest

    pts = _pts(spark)
    top = geo_nearest(pts, "lat", "lon", 10.0, 20.0, k=5, tie_col="id")
    rows = top.collect()
    assert len(rows) == 5
    ds = [r.distance_m for r in rows]
    assert ds == sorted(ds)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_polygon_concave_matches_numpy_raycast(spark):
    """geo_polygon (LatLonShape newPolygonQuery role): concave ring vs an
    independent numpy even-odd oracle; closed-ring input; validation."""
    import numpy as np
    import pytest

    from lucene_spark.relational.geo import geo_polygon

    poly = [(0.0, 0.0), (45.0, 10.0), (15.0, 20.0), (45.0, 40.0), (0.0, 30.0)]
    pts = _pts(spark)
    got = {r.id for r in geo_polygon(pts, "lat", "lon", poly).collect()}

    rows = pts.collect()

    def inside(py, px):
        n = len(poly)
        c = 0
        for i in range(n):
            y1, x1 = poly[i]
            y2, x2 = poly[(i + 1) % n]
            if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                c += 1
        return c % 2 == 1

    want = {r.id for r in rows if inside(r.lat, r.lon)}
    assert got == want and want
    # concavity actually exercised: some bbox points are excluded
    bbox = {r.id for r in rows if 0 <= r.lat <= 45 and 0 <= r.lon <= 40}
    assert want < bbox

    # a closed ring (first == last vertex) is accepted and identical
    closed = poly + [poly[0]]
    assert {r.id for r in geo_polygon(pts, "lat", "lon", closed).collect()} == want

    with pytest.raises(ValueError):
        geo_polygon(pts, "lat", "lon", poly[:2])
    with pytest.raises(ValueError):
        geo_polygon(pts, "lat", "lon", [(0.0, 0.0), (0.0, 10.0), (0.0, 20.0)])
