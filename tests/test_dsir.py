"""DSIR-style importance resampling — brute-force python twin.

The model is the published recipe (arXiv:2302.03169): smoothed n-gram
feature distributions over target/raw, per-doc log importance ratio,
Gumbel-top-k selection with the deterministic Lehmer noise stream."""

from __future__ import annotations

import math

import pytest

from lucene_spark.pipeline.dsir import (
    _LEHMER_A,
    _LEHMER_M,
    fit_importance_model,
    importance_resample,
    importance_weights,
)

TARGET = [
    "spark engine fast spark",
    "distributed spark engine",
    "fast engine",
]
RAW = [
    (0, "spark engine fast"),
    (1, "slow database rows"),
    (2, "spark spark spark"),
    (3, "database index rows and rows"),
    (4, ""),
    (5, "distributed engine"),
]
NS = (1, 2)
ALPHA = 0.5


def _grams(text, ns=NS):
    toks = text.split()
    out = []
    for n in ns:
        out += [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return out


def _brute():
    ct, cr = {}, {}
    for t in TARGET:
        for g in _grams(t):
            ct[g] = ct.get(g, 0) + 1
    for _, t in RAW:
        for g in _grams(t):
            cr[g] = cr.get(g, 0) + 1
    vocab = set(ct) | set(cr)
    t_tot, r_tot, v = sum(ct.values()), sum(cr.values()), len(vocab)
    dt, dr = t_tot + ALPHA * v, r_tot + ALPHA * v
    lr = {g: math.log((ct.get(g, 0) + ALPHA) / dt)
          - math.log((cr.get(g, 0) + ALPHA) / dr) for g in vocab}
    unseen = math.log(dr / dt)
    weights = {}
    for i, t in RAW:
        weights[i] = sum(lr.get(g, unseen) for g in _grams(t))
    return lr, unseen, weights


@pytest.fixture(scope="module")
def frames(spark):
    tdf = spark.createDataFrame([(t,) for t in TARGET], "text string")
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    return tdf, rdf


def test_weights_match_bruteforce(spark, frames):
    tdf, rdf = frames
    lr_df, unseen = fit_importance_model(tdf, rdf, "text", ns=NS, alpha=ALPHA)
    lr_b, unseen_b, weights_b = _brute()
    assert abs(unseen - unseen_b) < 1e-12
    got_lr = {r["feature"]: r["log_ratio"] for r in lr_df.collect()}
    assert set(got_lr) == set(lr_b)
    for g in lr_b:
        assert abs(got_lr[g] - lr_b[g]) < 1e-9, g
    w = importance_weights(rdf, "text", "doc_id", lr_df, unseen, ns=NS)
    got = {r["doc_id"]: (r["n_features"], r["weight"]) for r in w.collect()}
    assert set(got) == {i for i, _ in RAW}
    for i, t in RAW:
        assert got[i][0] == len(_grams(t))
        assert abs(got[i][1] - weights_b[i]) < 1e-9, i
    # direction: target-like docs weigh more than database docs
    assert got[0][1] > got[3][1]


def test_resample_gumbel_topk_deterministic(spark, frames):
    tdf, rdf = frames
    lr_df, unseen = fit_importance_model(tdf, rdf, "text", ns=NS, alpha=ALPHA)
    w = importance_weights(rdf, "text", "doc_id", lr_df, unseen, ns=NS)
    _, _, weights_b = _brute()

    def brute_key(i, seed, temp=1.0):
        u = ((i * _LEHMER_A + seed) % _LEHMER_M + 0.5) / _LEHMER_M
        return weights_b[i] / temp - math.log(-math.log(u))

    for seed in (0, 7):
        got = importance_resample(w, "doc_id", 3, seed=seed).collect()
        exp = sorted(weights_b, key=lambda i: (-brute_key(i, seed), i))[:3]
        assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == exp
        again = importance_resample(w, "doc_id", 3, seed=seed).collect()
        assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in got)
    # temperature → 0 approaches pure argmax by weight
    cold = importance_resample(w, "doc_id", 2, seed=0, temperature=1e-9)
    top_by_weight = sorted(weights_b, key=lambda i: (-weights_b[i], i))[:2]
    assert sorted(r["doc_id"] for r in cold.collect()) == sorted(top_by_weight)


def test_hashed_feature_path_bounds_table(spark, frames):
    tdf, rdf = frames
    lr_df, unseen = fit_importance_model(
        tdf, rdf, "text", ns=NS, alpha=ALPHA, hash_buckets=8)
    assert lr_df.count() <= 8
    w = importance_weights(rdf, "text", "doc_id", lr_df, unseen,
                           ns=NS, hash_buckets=8)
    rows = {r["doc_id"]: r for r in w.collect()}
    # feature counts are hash-invariant; weights stay finite
    for i, t in RAW:
        assert rows[i]["n_features"] == len(_grams(t))
        assert math.isfinite(rows[i]["weight"])


def test_empty_doc_weighs_zero(spark, frames):
    tdf, rdf = frames
    lr_df, unseen = fit_importance_model(tdf, rdf, "text", ns=NS, alpha=ALPHA)
    w = importance_weights(rdf, "text", "doc_id", lr_df, unseen, ns=NS)
    r4 = {r["doc_id"]: r for r in w.collect()}[4]
    assert r4["n_features"] == 0 and r4["weight"] == 0.0
