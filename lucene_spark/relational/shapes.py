"""Indexed shapes — the LatLonShape role (document/LatLonShape.java:1-217:
a polygon is indexed as a set of TRIANGLES produced by the Tessellator,
one triangle per index entry; queries run against the triangle set, not
the original ring).

Spark mapping:
- tessellation (geo/Tessellator.java ear-clipping): `tessellate()` — a
  plain-python ear clipper for simple (non-self-intersecting) rings,
  run DISTRIBUTED per document inside one mapInPandas pass
  (`shape_triangles`), emitting the triangle-per-row sidecar exactly
  like LatLonShape's doc encoding.
- holes + multipolygons (r5, VERDICT r4 item 6): `tessellate_polygon`
  eliminates each hole by splicing a BRIDGE edge to a visible outer
  vertex (the Tessellator.java eliminateHoles/splitPolygon approach:
  rightmost-hole-vertex → visible outer vertex, holes processed
  right-to-left), then ear-clips the single combined ring;
  `multipolygon_triangles` tessellates every part and unions the
  triangle sets (one shape_id, many parts — MultiPolygon semantics).
- point-in-shape (LatLonShape.newPolygonQuery / Point queries against
  the triangle tree): `point_in_shapes` — a GRID-CELL equi-join: every
  triangle is exploded to the grid cells its bbox covers, every point
  maps to its cell, the join is a plain hash join on cell id, and the
  exact sign test (three cross products, boundary-inclusive) runs as
  codegen'd JVM column arithmetic — no UDFs after tessellation, no
  all-pairs crossJoin. At 100 TB both sides shuffle once on cell id;
  cell size trades replication (triangles spanning cells) against join
  selectivity.
- shape-vs-shape relations (r5): `relate_polygon` answers
  INTERSECTS / WITHIN / DISJOINT of every indexed triangle set against
  a query (multi)polygon-with-holes — LatLonShape's QueryRelation over
  ShapeField triangles. The query is tessellated DRIVER-side (it is
  one small geometry), its triangle soup + polygon boundary edges ride
  the task closure (broadcast), and a vectorized numpy kernel relates
  each partition's triangles in one mapInPandas pass: per-triangle
  vertex-in-query / query-vertex-in-triangle / edge-crossing tests,
  then a per-shape groupBy aggregates (every-triangle-within /
  any-triangle-intersects). The corpus never shuffles for the relate;
  the only shuffle is the per-shape boolean aggregation. Soundness:
  with no boundary crossing and no enclosed boundary vertex, a
  triangle can neither poke out of nor swallow part of the query
  (Jordan curve argument) — crossing tests run against the query's
  POLYGON edges only (bridge/diagonal edges are interior and must not
  fail WITHIN).

Containment equivalence: for a simple ring, point-in-any-triangle ==
ray-cast point-in-polygon away from edges; the gate's synthetic grid is
verified edge-collision-free at both test scales, and the oracle stays
the INDEPENDENT crossing-number SQL (rel_geo_polygon's), so the
tessellator itself is under test. Boundary semantics are INCLUSIVE
throughout (Lucene's triangles are boundary-inclusive too).
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
        if guard > 100000:
            raise ValueError("tessellation did not converge "
                             "(self-intersecting ring?)")
        n = len(idx)
        clipped = False
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = pts[i0], pts[i1], pts[i2]
            ar = _area2(a, b, c)
            if ar < 0:
                continue               # reflex vertex — not an ear
            if ar == 0:
                # collinear sliver (bridge splices create these): drop
                # the middle vertex, no triangle emitted
                idx.pop(k)
                clipped = True
                break
            # compare by VALUE, not index: bridge splices duplicate
            # vertices, and a duplicate of an ear corner must not veto
            if any(inside_tri(pts[j], a, b, c)
                   for j in idx
                   if j not in (i0, i1, i2)
                   and pts[j] != a and pts[j] != b and pts[j] != c):
                continue               # another vertex inside — not an ear
            out.append((a, b, c))
            idx.pop(k)
            clipped = True
            break
        if not clipped:
            raise ValueError("no ear found (degenerate or "
                             "self-intersecting ring)")
    last = (pts[idx[0]], pts[idx[1]], pts[idx[2]])
    if _area2(*last) != 0:
        out.append(last)
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


# -- holes / multipolygons / shape-vs-shape (r5) --------------------------

def _seg_properly_crosses(p1, p2, q1, q2) -> bool:
    """True when open segments p1p2 and q1q2 cross at an interior point
    (shared endpoints / touching at endpoints do NOT count)."""
    d1 = _area2(q1, q2, p1)
    d2 = _area2(q1, q2, p2)
    d3 = _area2(p1, p2, q1)
    d4 = _area2(p1, p2, q2)
    return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))


def _ring_ccw(pts: list) -> list:
    pts = list(pts)
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    area = sum((pts[i][1] * pts[(i + 1) % len(pts)][0]
                - pts[(i + 1) % len(pts)][1] * pts[i][0])
               for i in range(len(pts)))
    if area < 0:
        pts.reverse()
    return pts


def _eliminate_hole(outer: list, hole: list) -> list:
    """Splice one hole (any orientation; normalized CW here) into the
    outer ring via a bridge edge to a mutually visible vertex — the
    Tessellator.java eliminateHoles/splitPolygon role. Returns the
    combined simple ring (bridge vertices duplicated)."""
    hole = _ring_ccw(hole)[::-1]           # CW hole for CCW outer
    # rightmost hole vertex first (x = lon) — the earcut/Tessellator
    # heuristic that guarantees a visible outer vertex to its right
    hi = max(range(len(hole)), key=lambda i: (hole[i][1], hole[i][0]))
    m = hole[hi]
    edges = [(outer[i], outer[(i + 1) % len(outer)])
             for i in range(len(outer))]
    hedges = [(hole[i], hole[(i + 1) % len(hole)])
              for i in range(len(hole))]

    def visible(oi: int) -> bool:
        p = outer[oi]
        if p == m:
            return False
        for (a, b) in edges + hedges:
            if m in (a, b) or p in (a, b):
                continue
            if _seg_properly_crosses(m, p, a, b):
                return False
        return True

    # nearest visible outer vertex (squared distance), ties by index —
    # deterministic bridge choice
    cands = sorted(
        (((outer[i][0] - m[0]) ** 2 + (outer[i][1] - m[1]) ** 2), i)
        for i in range(len(outer)) if visible(i))
    if not cands:
        raise ValueError("no visible bridge vertex for hole")
    oi = cands[0][1]
    # splice: ...P, M, (hole CW), M, P... — both bridge endpoints
    # duplicated, exactly the Tessellator splitPolygon edge pair
    hole_cycle = hole[hi:] + hole[:hi]
    return outer[:oi + 1] + hole_cycle + [hole_cycle[0]] + outer[oi:]


def tessellate_polygon(rings: list) -> list:
    """Tessellate a polygon-with-holes: rings[0] is the outer ring,
    rings[1:] are holes. Holes are eliminated right-to-left via bridge
    edges (Tessellator.java eliminateHoles), then the combined simple
    ring is ear-clipped. Returns triangles like tessellate()."""
    outer = _ring_ccw(rings[0])
    holes = [_ring_ccw(h) for h in rings[1:]]
    # rightmost hole first: its bridge cannot be blocked by a
    # not-yet-spliced hole further left
    holes.sort(key=lambda h: -max(v[1] for v in h))
    for h in holes:
        outer = _eliminate_hole(outer, h)
    return tessellate(outer + [outer[0]])


def multipolygon_triangles(shapes: DataFrame, id_col: str,
                           mp_col: str) -> DataFrame:
    """Tessellate MultiPolygon documents distributed → triangle-per-row
    sidecar. `mp_col` is array<array<array<array<double>>>>: polygons →
    rings (first outer, rest holes) → [lat, lon] vertices. One shape_id
    owns the union of all its parts' triangles (MultiPolygon
    semantics, LatLonShape.createIndexableFields over Polygon[])."""
    def run(batches):
        for pdf in batches:
            rows = []
            for sid, polys in zip(pdf[id_col], pdf[mp_col]):
                for rings in polys:
                    tris = tessellate_polygon(
                        [[(v[0], v[1]) for v in ring] for ring in rings])
                    for a, b, c in tris:
                        rows.append((int(sid), a[0], a[1], b[0], b[1],
                                     c[0], c[1]))
            yield pd.DataFrame(rows, columns=[
                "shape_id", "a_lat", "a_lon", "b_lat", "b_lon",
                "c_lat", "c_lon"])

    return shapes.select(id_col, mp_col).mapInPandas(run, _TRI_SCHEMA)


def _tri_kernel(tri: "pd.DataFrame", q_tris, q_edges, q_verts):
    """Vectorized per-batch relate: for N indexed triangles against the
    broadcast query soup, returns (within[N], intersects[N]) bools.
    numpy only — one kernel call per Arrow batch."""
    import numpy as np

    n = len(tri)
    ax, ay = tri["a_lon"].to_numpy(), tri["a_lat"].to_numpy()
    bx, by = tri["b_lon"].to_numpy(), tri["b_lat"].to_numpy()
    cx, cy = tri["c_lon"].to_numpy(), tri["c_lat"].to_numpy()

    def pts_in_q(px, py):
        """boundary-inclusive point-in-query-soup for N points."""
        inside = np.zeros(n, dtype=bool)
        for (qax, qay, qbx, qby, qcx, qcy) in q_tris:
            d1 = (qbx - qax) * (py - qay) - (qby - qay) * (px - qax)
            d2 = (qcx - qbx) * (py - qby) - (qcy - qby) * (px - qbx)
            d3 = (qax - qcx) * (py - qcy) - (qay - qcy) * (px - qcx)
            neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
            pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
            inside |= ~(neg & pos)
        return inside

    in_a = pts_in_q(ax, ay)
    in_b = pts_in_q(bx, by)
    in_c = pts_in_q(cx, cy)

    # query polygon vertices inside each indexed triangle
    # (boundary-inclusive) — catches a query hole/part swallowed whole
    qv_in = np.zeros(n, dtype=bool)
    for (px, py) in q_verts:
        d1 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        d2 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
        d3 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
        neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
        pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
        qv_in |= ~(neg & pos)

    # proper crossings: each indexed-triangle edge vs each query
    # POLYGON edge (bridge/diagonal edges are interior — see module doc)
    cross = np.zeros(n, dtype=bool)
    edges = ((ax, ay, bx, by), (bx, by, cx, cy), (cx, cy, ax, ay))
    for (p1x, p1y, p2x, p2y) in edges:
        for (q1x, q1y, q2x, q2y) in q_edges:
            d1 = (q2x - q1x) * (p1y - q1y) - (q2y - q1y) * (p1x - q1x)
            d2 = (q2x - q1x) * (p2y - q1y) - (q2y - q1y) * (p2x - q1x)
            d3 = (p2x - p1x) * (q1y - p1y) - (p2y - p1y) * (q1x - p1x)
            d4 = (p2x - p1x) * (q2y - p1y) - (p2y - p1y) * (q2x - p1x)
            cross |= ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))

    within = in_a & in_b & in_c & ~cross & ~qv_in
    intersects = in_a | in_b | in_c | qv_in | cross
    return within, intersects


def relate_polygon(triangles: DataFrame, polygons, relation: str,
                   id_col: str = "shape_id") -> DataFrame:
    """shape_ids whose triangle set satisfies `relation`
    ('intersects' | 'within' | 'disjoint') against the query
    (multi)polygon — LatLonShape.newPolygonQuery(QueryRelation) over
    the triangle sidecar. `polygons` is a list of polygons, each a list
    of rings (outer first), each ring [(lat, lon), ...]. The query is
    tessellated driver-side and broadcast in the task closure; the
    corpus triangles never shuffle (only the per-shape bool groupBy)."""
    rel = relation.lower()
    if rel not in ("intersects", "within", "disjoint"):
        raise ValueError(f"unknown relation {relation!r}")
    q_tris = []
    q_edges = []
    q_verts = []
    for rings in polygons:
        for a, b, c in tessellate_polygon(rings):
            q_tris.append((a[1], a[0], b[1], b[0], c[1], c[0]))
        for ring in rings:
            r = list(ring)
            if len(r) >= 2 and tuple(r[0]) == tuple(r[-1]):
                r = r[:-1]
            for i in range(len(r)):
                p, q = r[i], r[(i + 1) % len(r)]
                q_edges.append((p[1], p[0], q[1], q[0]))
                q_verts.append((p[1], p[0]))

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            within, inter = _tri_kernel(pdf, q_tris, q_edges, q_verts)
            yield pd.DataFrame({
                "shape_id": pdf[id_col].to_numpy(),
                "w": within, "i": inter})

    flags = triangles.mapInPandas(run, "shape_id long, w boolean, i boolean")
    agg = flags.groupBy("shape_id").agg(
        F.min("w").alias("within"), F.max("i").alias("intersects"))
    if rel == "within":
        out = agg.filter(F.col("within"))
    elif rel == "intersects":
        out = agg.filter(F.col("intersects"))
    else:
        out = agg.filter(~F.col("intersects"))
    return out.select("shape_id")
