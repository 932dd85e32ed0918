"""Geo point queries — LatLonPoint box/distance/nearest restated.

Role analogue: lucene/core/src/java/org/apache/lucene/document/
LatLonPoint.java:205 (newBoxQuery), LatLonPointDistanceQuery.java
(newDistanceQuery), LatLonPointSortField.java + LatLonPointDistanceComparator.java
(nearest-first sort), lucene/core/src/java/org/apache/lucene/geo/
GeoUtils.java:158 (dateline-crossing boxes split into two disjuncts).

Spark-first restatement: Lucene encodes points into a BKD tree and walks
cells; a columnar engine gets the same pruning for free from parquet
min/max row-group statistics ON the raw lat/lon DOUBLE columns — a
box predicate expressed as plain range filters pushes down to the scan
(PushedFilters: GreaterThanOrEqual(lat,...)...) and skips row groups,
which IS the BKD cell-skip in parquet clothing. Partition the table by a
coarse geohash-style cell prefix and the same predicate also prunes
whole partitions. Distance queries wrap the haversine great-circle
formula (SloppyMath.haversinMeters, util/SloppyMath.java:47) in JVM
Column arithmetic — codegen'd, no Python — pre-filtered by the bounding
box of the circle so the trig only runs on box survivors (exactly the
two-phase box-then-distance shape of LatLonPointDistanceQuery).

All functions return Columns/DataFrames built from pyspark.sql.functions
only: no UDFs anywhere on this path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

# mean earth radius in meters, as GeoUtils.EARTH_MEAN_RADIUS_METERS
EARTH_MEAN_RADIUS_METERS = 6_371_008.7714


def haversine_meters(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (haversine; SloppyMath.java:47
    computes the same quantity with trig approximations — we use exact
    JVM trig, deterministic and codegen'd)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    # clamp: fp rounding can push h infinitesimally past 1 for
    # near-antipodal pairs, turning asin into NaN
    return (F.lit(2.0 * EARTH_MEAN_RADIUS_METERS)
            * F.asin(F.least(F.sqrt(h), F.lit(1.0))))


def box_predicate(
    lat: Column,
    lon: Column,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> Column:
    """LatLonPoint.newBoxQuery (LatLonPoint.java:205): points inside the
    closed box. A dateline-crossing box (min_lon > max_lon) splits into
    two longitude ranges, mirroring GeoUtils.java:158."""
    lat_ok = (lat >= F.lit(float(min_lat))) & (lat <= F.lit(float(max_lat)))
    if min_lon > max_lon:  # crosses the dateline
        lon_ok = (lon >= F.lit(float(min_lon))) | (lon <= F.lit(float(max_lon)))
    else:
        lon_ok = (lon >= F.lit(float(min_lon))) & (lon <= F.lit(float(max_lon)))
    return lat_ok & lon_ok


def geo_box(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> DataFrame:
    """Filter to points inside the box — plain range predicates that push
    down to the parquet scan (row-group min/max skip = BKD cell skip)."""
    return df.filter(box_predicate(
        F.col(lat_col), F.col(lon_col), min_lat, max_lat, min_lon, max_lon))


def _circle_bbox(center_lat: float, center_lon: float, radius_m: float):
    """Bounding box of a circle (GeoUtils.pointInsideCircle's pre-check):
    cheap range predicates that prune before any trig runs."""
    # EXACT spherical-circle bounds (GeoUtils.Rectangle#fromPointDistance
    # does the same math): latitude extent is the meridian arc r/R; the
    # max longitude deviation of a circle NOT containing a pole is
    # asin(sin(r/R)/cosφ) — strictly larger than the naive (r/R)/cosφ at
    # high latitude, which silently drops a thin crescent of true hits.
    # A circle whose latitude band touches a pole, or whose sin-ratio
    # leaves asin's domain, spans ALL longitudes.
    t = radius_m / EARTH_MEAN_RADIUS_METERS            # angular radius, rad
    dlat = math.degrees(t)
    min_lat, max_lat = center_lat - dlat, center_lat + dlat
    if min_lat <= -90.0 or max_lat >= 90.0 or t >= math.pi:
        return (max(-90.0, min_lat), min(90.0, max_lat), -180.0, 180.0)
    x = math.sin(t) / math.cos(math.radians(center_lat))
    if abs(x) >= 1.0:
        return (min_lat, max_lat, -180.0, 180.0)
    dlon = math.degrees(math.asin(x)) + 1e-7           # float-safety margin
    return (min_lat, max_lat, center_lon - dlon, center_lon + dlon)


def geo_distance(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    radius_m: float,
    distance_col: str = "distance_m",
) -> DataFrame:
    """LatLonPoint.newDistanceQuery: points within radius_m of the
    center, with the haversine distance attached. Two-phase like
    LatLonPointDistanceQuery: pushed-down box filter first, exact
    haversine only on survivors."""
    min_lat, max_lat, min_lon, max_lon = _circle_bbox(
        center_lat, center_lon, radius_m)
    dist = haversine_meters(
        F.col(lat_col), F.col(lon_col),
        F.lit(float(center_lat)), F.lit(float(center_lon)))
    cond = (F.col(lat_col) >= F.lit(min_lat)) & (F.col(lat_col) <= F.lit(max_lat))
    if -180.0 <= min_lon and max_lon <= 180.0:
        # lon range crossing the dateline would need a split predicate;
        # the latitude band alone still prunes, and the haversine filter
        # below is always the decider
        cond = cond & (F.col(lon_col) >= F.lit(min_lon)) & (F.col(lon_col) <= F.lit(max_lon))
    boxed = df.filter(cond)
    return (
        boxed.withColumn(distance_col, dist)
        .filter(F.col(distance_col) <= F.lit(float(radius_m)))
    )


def polygon_predicate(lat: Column, lon: Column,
                      vertices: list[tuple[float, float]]) -> Column:
    """Point-in-polygon via even-odd crossing number (the planar test
    Lucene's tessellated LatLonShape/Polygon2D performs per triangle —
    lucene/core/src/java/org/apache/lucene/geo/Polygon2D.java relies on
    GeoUtils.lineCrossesLine-style orientation tests; here the classic
    ray-cast over the original ring, unrolled into pure Column
    arithmetic: one crossing term per edge, summed, parity tested).
    `vertices` is a list of (lat, lon) pairs; the ring closes itself.
    Boundary points follow ray-cast parity (simple polygons only; for
    dateline-crossing rings split the polygon first, as Lucene requires
    of its callers too — Polygon.java rejects lon outside [-180,180])."""
    verts = list(vertices)
    if len(verts) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    if verts[0] == verts[-1]:
        verts = verts[:-1]
    crossings: Column | None = None
    n = len(verts)
    for i in range(n):
        y1, x1 = float(verts[i][0]), float(verts[i][1])
        y2, x2 = float(verts[(i + 1) % n][0]), float(verts[(i + 1) % n][1])
        if y1 == y2:
            continue  # horizontal edge can never cross a horizontal ray
        straddles = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        # x of edge∩ray; slope written exactly as the oracle SQL writes it
        # so both engines run identical IEEE ops
        xin = (F.lit(x2 - x1) * (lat - F.lit(y1)) / F.lit(y2 - y1)) + F.lit(x1)
        term = F.when(straddles & (lon < xin), F.lit(1)).otherwise(F.lit(0))
        crossings = term if crossings is None else crossings + term
    if crossings is None:
        raise ValueError("degenerate polygon (all edges horizontal)")
    return crossings % 2 == 1


def geo_polygon(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    vertices: list[tuple[float, float]],
) -> DataFrame:
    """LatLonShape polygon containment (LatLonShape.java newPolygonQuery
    role): a pushed-down bounding-box range filter does the BKD-style
    coarse prune at the parquet scan, then the exact crossing-number test
    runs codegen'd on box survivors — the same two-phase shape Lucene
    gets from its tessellation tree. No UDFs."""
    lats = [float(v[0]) for v in vertices]
    lons = [float(v[1]) for v in vertices]
    lat, lon = F.col(lat_col), F.col(lon_col)
    bbox = ((lat >= F.lit(min(lats))) & (lat <= F.lit(max(lats)))
            & (lon >= F.lit(min(lons))) & (lon <= F.lit(max(lons))))
    return df.filter(bbox & polygon_predicate(lat, lon, vertices))


def geo_nearest(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    k: int,
    distance_col: str = "distance_m",
    tie_col: str | None = None,
) -> DataFrame:
    """Nearest-k by great-circle distance (LatLonPointSortField +
    LatLonPointDistanceComparator): orderBy(distance).limit(k) compiles
    to TakeOrderedAndProject — per-partition top-k, ≤k×P rows to the
    driver, never a global sort."""
    dist = haversine_meters(
        F.col(lat_col), F.col(lon_col),
        F.lit(float(center_lat)), F.lit(float(center_lon)))
    out = df.withColumn(distance_col, dist)
    order = [F.col(distance_col).asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    return out.orderBy(*order).limit(k)


def heatmap_facets(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    rows: int,
    columns: int,
) -> DataFrame:
    """Spatial 2D facets as a grid of counts — the heatmap
    (spatial-extras HeatmapFacetCounter.java:53-74 returns a dense
    columns×rows int array; Solr exposes it as SpatialHeatmapFacets).

    Spark shape: two floor-divisions to cell indices + ONE
    map-side-combined groupBy — the range predicate pushes to the scan
    first (the reference walks only prefix-tree cells intersecting the
    region; parquet row-group min/max skipping is the same pruning).
    Returns SPARSE non-zero cells (cell_x, cell_y, count): the
    reference's dense array is a driver-memory object it must cap at
    MAX_ROWS_OR_COLUMNS² (HeatmapFacetCounter.java:45) — at 100 TB the
    sparse frame is the scalable response; densify client-side for
    display (zero cells are the complement).

    Cell addressing matches the reference grid: half-open
    [min + i·size, min + (i+1)·size) per axis, except points exactly on
    the region's max edge land in the last cell (the grid covers the
    closed region). A dateline-crossing region (min_lon > max_lon) is
    handled by the modular longitude shift of GeoUtils.java:158's split,
    so cell_x stays contiguous across the seam."""
    if rows <= 0 or columns <= 0:
        raise ValueError(f"rows/columns must be positive, got {rows}x{columns}")
    if not (min_lat < max_lat):
        raise ValueError("min_lat must be < max_lat")
    lat, lon = F.col(lat_col), F.col(lon_col)
    lat_size = (float(max_lat) - float(min_lat)) / rows
    if min_lon > max_lon:  # crosses the dateline
        lon_extent = (float(max_lon) - float(min_lon)) + 360.0
        # shift into [0, lon_extent): contiguous across the seam
        lon_off = (lon - F.lit(float(min_lon)) + F.lit(360.0)) % F.lit(360.0)
    else:
        lon_extent = float(max_lon) - float(min_lon)
        lon_off = lon - F.lit(float(min_lon))
    if lon_extent <= 0:
        raise ValueError("longitude extent must be positive")
    lon_size = lon_extent / columns
    inside = box_predicate(lat, lon, min_lat, max_lat, min_lon, max_lon)
    cell_x = F.least(F.floor(lon_off / F.lit(lon_size)),
                     F.lit(columns - 1)).cast("int")
    cell_y = F.least(F.floor((lat - F.lit(float(min_lat))) / F.lit(lat_size)),
                     F.lit(rows - 1)).cast("int")
    return (df.filter(inside)
            .select(cell_x.alias("cell_x"), cell_y.alias("cell_y"))
            .groupBy("cell_x", "cell_y")
            .agg(F.count("*").alias("count")))
