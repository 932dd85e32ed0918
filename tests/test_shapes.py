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
