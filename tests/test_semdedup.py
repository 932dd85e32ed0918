"""SemDeDup (Abbas et al. 2023) — deterministic clustering + the
triu-max removal rule, brute-force-verified."""

import math

import numpy as np
import pytest

from lucene_spark.pipeline.semdedup import semdedup


def _brute(vectors, keys, centroids, threshold, round_to=6):
    """Driver-side twin of the whole algorithm."""
    v = np.asarray(vectors, dtype=np.float64)
    c = np.asarray(centroids, dtype=np.float64)
    # assignment: argmin squared distance, ties to lowest centroid
    d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    cid = d2.argmin(axis=1)
    removed = {}
    for cl in np.unique(cid):
        idx = np.where(cid == cl)[0]
        cd = np.round(np.sqrt(d2[idx, cl]), round_to)
        order = idx[np.lexsort((np.asarray(keys)[idx], -cd))]
        vn = v[order] / np.maximum(np.linalg.norm(v[order], axis=1), 1e-300)[:, None]
        sims = np.round(vn @ vn.T, round_to)
        for i in range(len(order)):
            removed[keys[order[i]]] = bool(
                (sims[i, :i] >= threshold).any())
    return cid, removed


def test_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    n, dim = 120, 8
    base = rng.normal(size=(n, dim))
    # plant near-duplicates: rows 50.. copy earlier rows with tiny noise
    for i in range(50, 70):
        base[i] = base[i - 50] + rng.normal(scale=1e-3, size=dim)
    keys = list(range(n))
    df = spark.createDataFrame(
        [(k, [float(x) for x in base[k]]) for k in keys],
        "key long, vec array<double>")
    cents = [list(map(float, base[j])) for j in range(4)]
    out = {r["key"]: (r["cluster"], r["removed"])
           for r in semdedup(df, "vec", "key", threshold=0.99,
                             centroids=cents).collect()}
    cid, removed = _brute(base, keys, cents, 0.99)
    assert len(out) == n
    for k in keys:
        assert out[k][0] == cid[k], f"cluster mismatch key {k}"
        assert out[k][1] == removed[k], f"removed mismatch key {k}"
    # each planted pair lost exactly one side (either the copy or the
    # original — whichever sits closer to the centroid)
    caught = sum(1 for k in range(50, 70) if out[k][1] or out[k - 50][1])
    assert caught >= 18


def test_keeps_farthest_from_centroid_first(spark):
    """Two identical vectors: the one FARTHER from the centroid is kept
    (the paper's rule), not the lower key."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0])],  # same direction, cos=1
        "key long, vec array<double>")
    cents = [[0.0, 0.0]]
    out = {r["key"]: r["removed"]
           for r in semdedup(df, "vec", "key", threshold=0.99,
                             centroids=cents).collect()}
    assert out[2] is False and out[1] is True  # key 2 is farther → kept


def test_threshold_zero_removes_all_but_first(spark):
    """threshold <= 0 must compare real similarities, not masked zeros:
    orthogonal vectors have sim 0 >= 0, so only the first survives."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "key long, vec array<double>")
    out = {r["key"]: r["removed"]
           for r in semdedup(df, "vec", "key", threshold=0.0,
                             centroids=[[0.0, 0.0]]).collect()}
    assert sum(out.values()) == 1


def test_cluster_size_cap(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)],
        "key long, vec array<double>")
    with pytest.raises(Exception) as ei:
        semdedup(df, "vec", "key", centroids=[[0.0, 0.0]],
                 max_cluster_size=5).collect()
    assert "max_cluster_size" in str(ei.value)


def test_kmeans_fit_path(spark):
    """No centroids given: the deterministic Lloyd fit runs and every
    row comes back exactly once."""
    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=4)]) for i in range(40)],
        "key long, vec array<double>")
    out = semdedup(df, "vec", "key", k=3, threshold=0.95).collect()
    assert sorted(r["key"] for r in out) == list(range(40))
    assert {r["cluster"] for r in out} <= {0, 1, 2}
