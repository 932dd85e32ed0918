"""Distributed Lloyd k-means (pipeline/cluster.py) vs a numpy
reimplementation."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.pipeline.cluster import kmeans


def _np_kmeans(X: np.ndarray, k: int, iters: int):
    cents = X[:k].astype(float).copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)  # argmin takes the first (lowest) index on ties
        for c in range(k):
            if (a == c).any():
                cents[c] = X[a == c].mean(axis=0)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), cents


def test_matches_numpy_lloyd(spark):
    rng = np.random.default_rng(11)
    X = np.round(rng.normal(size=(120, 6)), 3)  # round → exact float sums
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(120)],
        "vec_id long, embedding array<double>")
    out, cents = kmeans(df, "embedding", "vec_id", k=3, iterations=4)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    exp_a, exp_c = _np_kmeans(X, 3, 4)
    assert got == {i: int(exp_a[i]) for i in range(120)}
    assert np.allclose(np.array(cents), exp_c, atol=1e-9)


def test_separated_blobs_recovered(spark):
    rng = np.random.default_rng(5)
    blobs = [rng.normal(loc, 0.05, size=(30, 4)) for loc in (0.0, 5.0, 10.0)]
    X = np.concatenate(blobs)
    order = rng.permutation(len(X))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in order],
        "vec_id long, embedding array<double>")
    # one seed per blob: the default lowest-id init would put all three
    # seeds inside blob 0 — a genuine Lloyd local minimum (two blobs
    # merge), which is about init policy, not the iteration math
    out, _ = kmeans(df, "embedding", "vec_id", k=3, iterations=6,
                    init=[[float(v) for v in X[i]] for i in (0, 30, 60)])
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    for lo in (0, 30, 60):
        labels = {got[i] for i in range(lo, lo + 30)}
        assert len(labels) == 1  # each blob lands in exactly one cluster
    assert len({got[0], got[30], got[60]}) == 3  # and they are distinct


def test_empty_cluster_keeps_centroid_and_bad_init_rejected(spark):
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [0.1]), (2, [0.2])],
        "vec_id long, embedding array<double>")
    # a far-away centroid never wins a point: it must survive unchanged
    out, cents = kmeans(df, "embedding", "vec_id", k=2, iterations=2,
                        init=[[0.0], [99.0]])
    assert cents[1] == [99.0]
    assert {r["cluster"] for r in out.collect()} == {0}
    with pytest.raises(ValueError):
        kmeans(df, "embedding", "vec_id", k=3, iterations=1, init=[[0.0]])
