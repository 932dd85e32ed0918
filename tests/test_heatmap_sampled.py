"""Heatmap grid facets (HeatmapFacetCounter role) and sampled facets
(RandomSamplingFacetsCollector role) vs brute-force references."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from lucene_spark.relational.facets import facet_counts, sampled_facet_counts
from lucene_spark.relational.geo import heatmap_facets


def _pts(n):
    # deterministic scatter incl. exact-edge values
    out = [(i, ((i * 7919) % 1800) / 10.0 - 90.0,
            ((i * 104729) % 3600) / 10.0 - 180.0) for i in range(n)]
    out.append((n, 60.0, 120.0))      # exactly on the max corner
    out.append((n + 1, -60.0, -120.0))  # exactly on the min corner
    return out


def _brute_heatmap(pts, min_lat, max_lat, min_lon, max_lon, rows, columns):
    lat_size = (max_lat - min_lat) / rows
    counts = Counter()
    if min_lon > max_lon:
        lon_extent = (max_lon - min_lon) + 360.0
    else:
        lon_extent = max_lon - min_lon
    lon_size = lon_extent / columns
    for _, lat, lon in pts:
        if not (min_lat <= lat <= max_lat):
            continue
        if min_lon > max_lon:
            if not (lon >= min_lon or lon <= max_lon):
                continue
            off = (lon - min_lon + 360.0) % 360.0
        else:
            if not (min_lon <= lon <= max_lon):
                continue
            off = lon - min_lon
        cx = min(int(math.floor(off / lon_size)), columns - 1)
        cy = min(int(math.floor((lat - min_lat) / lat_size)), rows - 1)
        counts[(cx, cy)] += 1
    return sorted((x, y, c) for (x, y), c in counts.items())


def _collect_grid(df):
    return sorted((r["cell_x"], r["cell_y"], r["count"]) for r in df.collect())


def test_heatmap_matches_brute_force(spark):
    pts = _pts(400)
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = _collect_grid(heatmap_facets(
        df, "lat", "lon", -60.0, 60.0, -120.0, 120.0, rows=6, columns=8))
    assert got == _brute_heatmap(pts, -60.0, 60.0, -120.0, 120.0, 6, 8)
    assert sum(c for _, _, c in got) == sum(
        1 for _, la, lo in pts if -60 <= la <= 60 and -120 <= lo <= 120)
    # max-edge point landed in the last cell, not an out-of-range one
    assert all(0 <= x < 8 and 0 <= y < 6 for x, y, _ in got)


def test_heatmap_dateline_crossing(spark):
    pts = _pts(400)
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = _collect_grid(heatmap_facets(
        df, "lat", "lon", -30.0, 30.0, 150.0, -150.0, rows=3, columns=4))
    assert got == _brute_heatmap(pts, -30.0, 30.0, 150.0, -150.0, 3, 4)
    assert got  # the scatter does populate the seam region


def test_heatmap_rejects_bad_grid(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0)], "id long, lat double, lon double")
    with pytest.raises(ValueError):
        heatmap_facets(df, "lat", "lon", -10.0, 10.0, -10.0, 10.0, 0, 4)
    with pytest.raises(ValueError):
        heatmap_facets(df, "lat", "lon", 10.0, -10.0, -10.0, 10.0, 2, 2)


def _sha8(key, salt):
    return hashlib.sha256(f"{key}{salt}".encode()).hexdigest()[:8]


def test_sampled_equals_exact_when_under_sample_size(spark):
    rows = [(i, f"lang{i % 4}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sampled_facet_counts(df, "lang", "doc_id", sample_size=100, top_n=4)
    exact = facet_counts(df, "lang", top_n=4)
    assert [(r["lang"], r["sampled_count"], r["count"]) for r in got.collect()] \
        == [(r["lang"], r["count"], r["count"]) for r in exact.collect()]


def test_sampled_matches_hash_replay(spark):
    rows = [(i, f"lang{i % 5}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    sample_size, salt = 80, "s1"
    rate = sample_size / len(rows)
    thr = format(int(rate * (1 << 32)), "08x")
    sampled = Counter(l for k, l in rows if _sha8(k, salt) < thr)
    expect = sorted(sampled.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = sampled_facet_counts(df, "lang", "doc_id",
                               sample_size=sample_size, top_n=3, salt=salt)
    assert [(r["lang"], r["sampled_count"], r["count"])
            for r in got.collect()] \
        == [(l, c, int(c / rate)) for l, c in expect]


def test_sampled_cap_binds_at_true_count(spark):
    # a rare label whose members are ALL sampled: the amortized estimate
    # (sampled/rate = 10x) would overshoot; the universe cap clamps it
    salt = "s2"
    rate = 0.1
    thr = format(int(rate * (1 << 32)), "08x")
    ids_in = [i for i in range(10_000) if _sha8(i, salt) < thr][:3]
    rows = [(i, "common") for i in range(10_000) if i not in ids_in]
    rows += [(i, "rare") for i in ids_in]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r["lang"]: (r["sampled_count"], r["count"])
           for r in sampled_facet_counts(
               df, "lang", "doc_id", sample_size=1_000, top_n=5,
               salt=salt, universe=df).collect()}
    assert got["rare"][0] == 3
    assert got["rare"][1] == 3          # capped: floor(3/0.1)=30 -> 3
    assert got["common"][1] <= 10_000 - 3
