"""Indexed shapes (LatLonShape/Tessellator role) — relational/shapes.py:
ear-clip tessellation parity with ray casting, the triangle sidecar, and
the grid-cell containment join."""

from __future__ import annotations

import random

import pytest

from lucene_spark.relational.shapes import (
    _area2,
    point_in_shapes,
    shape_triangles,
    tessellate,
)

CONCAVE = [(0.0, 0.0), (45.0, 10.0), (15.0, 20.0), (45.0, 40.0), (0.0, 30.0)]


def _ray(pt, poly):
    y, x = pt
    inside = False
    n = len(poly)
    for i in range(n):
        y1, x1 = poly[i]
        y2, x2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xint:
                inside = not inside
    return inside


def _tri_contains(pt, t):
    def s(a, b, p):
        return (b[1] - a[1]) * (p[0] - a[0]) - (b[0] - a[0]) * (p[1] - a[1])

    d = [s(t[0], t[1], pt), s(t[1], t[2], pt), s(t[2], t[0], pt)]
    return not (min(d) < 0 and max(d) > 0)


def test_tessellation_area_and_count():
    tris = tessellate(CONCAVE)
    assert len(tris) == len(CONCAVE) - 2
    ring = abs(sum(CONCAVE[i][1] * CONCAVE[(i + 1) % 5][0]
                   - CONCAVE[(i + 1) % 5][1] * CONCAVE[i][0]
                   for i in range(5))) / 2
    assert sum(abs(_area2(a, b, c)) / 2 for a, b, c in tris) == ring


def test_orientation_and_closure_invariance():
    assert len(tessellate(list(reversed(CONCAVE)))) == 3
    assert len(tessellate(CONCAVE + [CONCAVE[0]])) == 3
    with pytest.raises(ValueError):
        tessellate([(0.0, 0.0), (1.0, 1.0)])


@pytest.mark.parametrize("seed", range(3))
def test_containment_parity_with_raycast(seed):
    rng = random.Random(seed)
    # random star-shaped (hence simple) rings around a center
    import math

    cx, cy = rng.uniform(-10, 10), rng.uniform(-10, 10)
    angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(8))
    ring = [(cy + rng.uniform(2, 15) * math.sin(a),
             cx + rng.uniform(2, 15) * math.cos(a)) for a in angles]
    tris = tessellate(ring)
    for _ in range(3000):
        pt = (rng.uniform(-30, 30), rng.uniform(-30, 30))
        assert _ray(pt, ring) == any(_tri_contains(pt, t) for t in tris)


def test_spark_sidecar_and_grid_join(spark):
    rows = [
        (1, [[v[0], v[1]] for v in CONCAVE]),
        (2, [[-30.0, -100.0], [0.0, -100.0], [0.0, -60.0], [-30.0, -60.0]]),
    ]
    shapes = spark.createDataFrame(
        rows, "sid long, ring array<array<double>>")
    tri = shape_triangles(shapes, "sid", "ring")
    got = tri.collect()
    assert {r["shape_id"] for r in got} == {1, 2}
    assert len([r for r in got if r["shape_id"] == 1]) == 3
    assert len([r for r in got if r["shape_id"] == 2]) == 2

    pts = spark.createDataFrame(
        [(10, 20.0, 15.0),     # inside concave ring 1 (left lobe region)
         (11, 30.0, 20.0),     # in the concave notch → outside
         (12, -15.0, -80.0),   # inside square 2
         (13, 80.0, 170.0)],   # nowhere
        "k long, lat double, lon double")
    hits = {(r["pkey"], r["shape_id"]) for r in
            point_in_shapes(pts, "lat", "lon", "k", tri).collect()}
    want = set()
    tris1 = tessellate(CONCAVE)
    tris2 = tessellate([(v[0], v[1]) for v in rows[1][1]])
    for k, lat, lon in [(10, 20.0, 15.0), (11, 30.0, 20.0),
                        (12, -15.0, -80.0), (13, 80.0, 170.0)]:
        if any(_tri_contains((lat, lon), t) for t in tris1):
            want.add((k, 1))
        if any(_tri_contains((lat, lon), t) for t in tris2):
            want.add((k, 2))
    assert hits == want
    assert (12, 2) in hits and (13, 1) not in hits and (13, 2) not in hits


# -- r5: holes, multipolygons, shape-vs-shape (VERDICT r4 item 6) ---------

def _tri_area(tris):
    return sum(abs(_area2(a, b, c)) / 2 for a, b, c in tris)


def _ray_rings(pt, rings):
    """even-odd crossing number over outer+holes."""
    cnt = 0
    for ring in rings:
        r = list(ring)
        if r[0] == r[-1]:
            r = r[:-1]
        for i in range(len(r)):
            (y1, x1), (y2, x2) = r[i], r[(i + 1) % len(r)]
            if (x1 > pt[1]) != (x2 > pt[1]):
                yl = y1 + (pt[1] - x1) * (y2 - y1) / (x2 - x1)
                if yl > pt[0]:
                    cnt += 1
    return cnt % 2 == 1


def test_holes_area_exact():
    from lucene_spark.relational.shapes import tessellate_polygon

    outer = [(0, 0), (0, 10), (10, 10), (10, 0)]
    hole = [(3, 3), (3, 7), (7, 7), (7, 3)]
    hole2 = [(1, 1), (1, 2), (2, 2), (2, 1)]
    assert _tri_area(tessellate_polygon([outer, hole])) == 84.0
    assert _tri_area(tessellate_polygon([outer, hole, hole2])) == 83.0
    # concave outer + hole
    outer3 = [(0, 0), (0, 10), (4, 10), (4, 4), (6, 4), (6, 10),
              (10, 10), (10, 0)]
    assert _tri_area(tessellate_polygon(
        [outer3, [(1, 1), (1, 3), (3, 3), (3, 1)]])) == 84.0


def test_holes_containment_parity_with_even_odd():
    from lucene_spark.relational.shapes import tessellate_polygon

    outer = [(0, 0), (0, 10), (10, 10), (10, 0)]
    hole = [(3, 3), (3, 7), (7, 7), (7, 3)]
    hole2 = [(1, 1), (1, 2), (2, 2), (2, 1)]
    tris = tessellate_polygon([outer, hole, hole2])
    rng = random.Random(17)
    for _ in range(2000):
        p = (rng.uniform(-1, 11), rng.uniform(-1, 11))
        want = _ray_rings(p, [outer, hole, hole2])
        got = any(_tri_contains(p, t) for t in tris)
        assert want == got, p


def test_concave_hole_in_concave_outer():
    from lucene_spark.relational.shapes import tessellate_polygon

    outer = [(0, 0), (0, 20), (20, 20), (20, 0), (10, 8)]   # concave
    hole = [(12, 10), (16, 12), (12, 16), (14, 12)]          # concave
    tris = tessellate_polygon([outer, hole])
    rng = random.Random(3)
    for _ in range(2000):
        p = (rng.uniform(-1, 21), rng.uniform(-1, 21))
        want = _ray_rings(p, [outer, hole])
        got = any(_tri_contains(p, t) for t in tris)
        assert want == got, p


def test_multipolygon_spark_sidecar(spark):
    from lucene_spark.relational.shapes import multipolygon_triangles

    # two parts with one hole each
    mp = [
        [[[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]],
         [[3.0, 3.0], [3.0, 7.0], [7.0, 7.0], [7.0, 3.0]]],
        [[[0.0, 20.0], [0.0, 30.0], [10.0, 30.0], [10.0, 20.0]]],
    ]
    df = spark.createDataFrame(
        [(1, mp)],
        "sid long, mp array<array<array<array<double>>>>")
    tris = multipolygon_triangles(df, "sid", "mp").collect()
    area = sum(abs((t["b_lon"] - t["a_lon"]) * (t["c_lat"] - t["a_lat"])
                   - (t["b_lat"] - t["a_lat"]) * (t["c_lon"] - t["a_lon"]))
               / 2 for t in tris)
    assert area == pytest.approx(84.0 + 100.0)
    assert all(t["shape_id"] == 1 for t in tris)


def test_relate_polygon_spark(spark):
    """WITHIN/INTERSECTS/DISJOINT of a grid of squares vs a query
    multipolygon-with-holes, against exact bbox logic (squares are
    axis-aligned; margins guarantee bbox logic is exact)."""
    from lucene_spark.relational.shapes import (relate_polygon,
                                                shape_triangles)

    # squares of half-size 0.7 centered on a lattice
    rows = []
    sid = 0
    for cy in range(-45, 46, 3):
        for cx in range(-45, 46, 3):
            h = 0.7
            rows.append((sid, [[cy - h, cx - h], [cy - h, cx + h],
                               [cy + h, cx + h], [cy + h, cx - h]]))
            sid += 1
    df = spark.createDataFrame(rows, "sid long, ring array<array<double>>")
    tris = shape_triangles(df, "sid", "ring")
    # query: two rects with holes (gap 8 between parts, margins >= 6)
    P1 = [[(-40.0, -40.0), (-40.0, -4.0), (40.0, -4.0), (40.0, -40.0)],
          [(-8.0, -30.0), (-8.0, -14.0), (8.0, -14.0), (8.0, -30.0)]]
    P2 = [[(-40.0, 4.0), (-40.0, 40.0), (40.0, 40.0), (40.0, 4.0)],
          [(-8.0, 14.0), (-8.0, 30.0), (8.0, 30.0), (8.0, 14.0)]]

    def bbox_label(cy, cx, h=0.7):
        y0, y1, x0, x1 = cy - h, cy + h, cx - h, cx + h
        out = "disjoint"
        for (oy0, oy1, ox0, ox1), (hy0, hy1, hx0, hx1) in [
                ((-40, 40, -40, -4), (-8, 8, -30, -14)),
                ((-40, 40, 4, 40), (-8, 8, 14, 30))]:
            overlap = not (x1 < ox0 or x0 > ox1 or y1 < oy0 or y0 > oy1)
            in_outer = ox0 <= x0 and x1 <= ox1 and oy0 <= y0 and y1 <= oy1
            in_hole = (hx0 < x0 and x1 < hx1 and hy0 < y0 and y1 < hy1)
            ovl_hole_int = not (x1 <= hx0 or x0 >= hx1
                                or y1 <= hy0 or y0 >= hy1)
            if overlap and not in_hole:
                out = "intersects"
                if in_outer and not ovl_hole_int:
                    return "within"
        return out

    want = {}
    sid = 0
    for cy in range(-45, 46, 3):
        for cx in range(-45, 46, 3):
            want[sid] = bbox_label(cy, cx)
            sid += 1
    got_within = {r["shape_id"] for r in
                  relate_polygon(tris, [P1, P2], "within").collect()}
    got_inter = {r["shape_id"] for r in
                 relate_polygon(tris, [P1, P2], "intersects").collect()}
    got_disj = {r["shape_id"] for r in
                relate_polygon(tris, [P1, P2], "disjoint").collect()}
    assert got_within == {s for s, l in want.items() if l == "within"}
    assert got_inter == {s for s, l in want.items() if l != "disjoint"}
    assert got_disj == {s for s, l in want.items() if l == "disjoint"}
    assert got_within and got_disj and got_inter - got_within
