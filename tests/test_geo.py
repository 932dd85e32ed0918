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
