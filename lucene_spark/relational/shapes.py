"""Indexed shapes — the LatLonShape role (document/LatLonShape.java:1-217:
a polygon is indexed as a set of TRIANGLES produced by the Tessellator,
one triangle per index entry; queries run against the triangle set, not
the original ring).

Spark mapping:
- tessellation (geo/Tessellator.java ear-clipping): `tessellate()` — a
  plain-python ear clipper for simple (non-self-intersecting) rings,
  run DISTRIBUTED per document inside one mapInPandas pass
  (`shape_triangles`), emitting the triangle-per-row sidecar exactly
  like LatLonShape's doc encoding. Holes/multipolygons are out of
  scope (documented).
- point-in-shape (LatLonShape.newPolygonQuery / Point queries against
  the triangle tree): `point_in_shapes` — a GRID-CELL equi-join: every
  triangle is exploded to the grid cells its bbox covers, every point
  maps to its cell, the join is a plain hash join on cell id, and the
  exact sign test (three cross products, boundary-inclusive) runs as
  codegen'd JVM column arithmetic — no UDFs after tessellation, no
  all-pairs crossJoin. At 100 TB both sides shuffle once on cell id;
  cell size trades replication (triangles spanning cells) against join
  selectivity.

Containment equivalence: for a simple ring, point-in-any-triangle ==
ray-cast point-in-polygon away from edges; the gate's synthetic grid is
verified edge-collision-free at both test scales, and the oracle stays
the INDEPENDENT crossing-number SQL (rel_geo_polygon's), so the
tessellator itself is under test.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _area2(a, b, c) -> float:
    return (b[1] - a[1]) * (c[0] - a[0]) - (b[0] - a[0]) * (c[1] - a[1])


def tessellate(verts: list[tuple[float, float]]) -> list[tuple]:
    """Ear-clip a simple ring [(lat, lon), ...] into triangles
    [((lat,lon),(lat,lon),(lat,lon)), ...] (Tessellator.java role).
    Works for convex and concave rings; raises on degenerate input."""
    pts = list(verts)
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if len(pts) < 3:
        raise ValueError("polygon needs >= 3 distinct vertices")
    # normalize to CCW by signed area (x=lon, y=lat)
    area = sum((pts[i][1] * pts[(i + 1) % len(pts)][0]
                - pts[(i + 1) % len(pts)][1] * pts[i][0])
               for i in range(len(pts)))
    if area < 0:
        pts.reverse()

    def inside_tri(p, a, b, c) -> bool:
        d1 = _area2(a, b, p)
        d2 = _area2(b, c, p)
        d3 = _area2(c, a, p)
        return d1 >= 0 and d2 >= 0 and d3 >= 0

    out = []
    idx = list(range(len(pts)))
    guard = 0
    while len(idx) > 3:
        guard += 1
        if guard > 10000:
            raise ValueError("tessellation did not converge "
                             "(self-intersecting ring?)")
        n = len(idx)
        clipped = False
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = pts[i0], pts[i1], pts[i2]
            if _area2(a, b, c) <= 0:
                continue               # reflex vertex — not an ear
            if any(inside_tri(pts[j], a, b, c)
                   for j in idx if j not in (i0, i1, i2)):
                continue               # another vertex inside — not an ear
            out.append((a, b, c))
            idx.pop(k)
            clipped = True
            break
        if not clipped:
            raise ValueError("no ear found (degenerate or "
                             "self-intersecting ring)")
    out.append((pts[idx[0]], pts[idx[1]], pts[idx[2]]))
    return out


_TRI_SCHEMA = ("shape_id long, a_lat double, a_lon double, "
               "b_lat double, b_lon double, c_lat double, c_lon double")


def shape_triangles(shapes: DataFrame, id_col: str,
                    poly_col: str) -> DataFrame:
    """Tessellate every document's ring distributed → triangle-per-row
    sidecar (the LatLonShape doc encoding). `poly_col` is
    array<array<double>> of [lat, lon] vertices."""
    def run(batches):
        for pdf in batches:
            rows = []
            for sid, ring in zip(pdf[id_col], pdf[poly_col]):
                for a, b, c in tessellate([(v[0], v[1]) for v in ring]):
                    rows.append((int(sid), a[0], a[1], b[0], b[1],
                                 c[0], c[1]))
            yield pd.DataFrame(rows, columns=[
                "shape_id", "a_lat", "a_lon", "b_lat", "b_lon",
                "c_lat", "c_lon"])

    return shapes.select(id_col, poly_col).mapInPandas(run, _TRI_SCHEMA)


def _sign(ax, ay, bx, by, px, py):
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def point_in_shapes(points: DataFrame, lat_col: str, lon_col: str,
                    key_col: str, triangles: DataFrame,
                    cell_deg: float = 10.0) -> DataFrame:
    """(point key, shape_id) pairs where the point lies in the shape —
    grid-cell equi-join + exact boundary-inclusive triangle sign test,
    all JVM expressions. Returns distinct pairs (a point inside two
    triangles of one shape counts once)."""
    cd = float(cell_deg)
    t = triangles
    lo_lat = F.least("a_lat", "b_lat", "c_lat")
    hi_lat = F.greatest("a_lat", "b_lat", "c_lat")
    lo_lon = F.least("a_lon", "b_lon", "c_lon")
    hi_lon = F.greatest("a_lon", "b_lon", "c_lon")
    t = (t.withColumn("cx0", F.floor(lo_lon / cd))
          .withColumn("cx1", F.floor(hi_lon / cd))
          .withColumn("cy0", F.floor(lo_lat / cd))
          .withColumn("cy1", F.floor(hi_lat / cd))
          .withColumn("cx", F.explode(F.sequence("cx0", "cx1")))
          .withColumn("cy", F.explode(F.sequence("cy0", "cy1")))
          .drop("cx0", "cx1", "cy0", "cy1"))
    p = points.select(
        F.col(key_col).alias("pkey"),
        F.col(lat_col).alias("plat"), F.col(lon_col).alias("plon"),
        F.floor(F.col(lon_col) / cd).alias("cx"),
        F.floor(F.col(lat_col) / cd).alias("cy"))
    j = p.join(t, ["cx", "cy"])
    # three cross products; boundary-inclusive same-sign test in (lon,lat)
    d1 = _sign(F.col("a_lon"), F.col("a_lat"), F.col("b_lon"),
               F.col("b_lat"), F.col("plon"), F.col("plat"))
    d2 = _sign(F.col("b_lon"), F.col("b_lat"), F.col("c_lon"),
               F.col("c_lat"), F.col("plon"), F.col("plat"))
    d3 = _sign(F.col("c_lon"), F.col("c_lat"), F.col("a_lon"),
               F.col("a_lat"), F.col("plon"), F.col("plat"))
    has_neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
    has_pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
    return (j.filter(~(has_neg & has_pos))
            .select("pkey", "shape_id").distinct())
