"""Bigram-LM perplexity filter (pipeline/lm.py) against hand-computed
probabilities on tiny corpora."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lucene_spark.pipeline.lm import (perplexity_filter, score_perplexity,
                                      train_bigram_lm)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_and_hand_computed_score(spark):
    docs = _mk(spark, [(0, "a b a b"), (1, "a b c")])
    bi, ctx, v = train_bigram_lm(docs, "text")
    assert v == 3
    cnt = {(r["w1"], r["w2"]): r["c"] for r in bi.collect()}
    assert cnt == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    cx = {r["w1"]: r["ctx"] for r in ctx.collect()}
    assert cx == {"a": 3, "b": 2}

    out = {r["doc_id"]: r for r in
           score_perplexity(docs, "text", "doc_id", bi, ctx, v).collect()}
    # doc 1: bigrams (a,b), (b,c) under alpha=0.1, V=3
    lp = [math.log((3 + 0.1) / (3 + 0.3)), math.log((1 + 0.1) / (2 + 0.3))]
    ce = -(lp[0] + lp[1]) / 2
    assert out[1]["n_bigrams"] == 2
    assert abs(out[1]["cross_entropy"] - ce) < 1e-12
    assert abs(out[1]["perplexity"] - math.exp(ce)) < 1e-12


def test_unseen_bigrams_hit_the_alpha_floor(spark):
    train = _mk(spark, [(0, "a b a b")])
    bi, ctx, v = train_bigram_lm(train, "text")  # V=2
    test = _mk(spark, [(9, "z q")])  # both words OOV
    out = score_perplexity(test, "text", "doc_id", bi, ctx, v).collect()[0]
    # unseen context: ln(alpha / (0 + alpha*V)) = ln(1/V)
    assert abs(out["cross_entropy"] - (-math.log(0.1 / 0.2))) < 1e-12


def test_min_count_prunes_but_context_stays_calibrated(spark):
    docs = _mk(spark, [(0, "a b a b a c")])
    bi, ctx, v = train_bigram_lm(docs, "text", min_count=2)
    # bigrams: (a,b)x2, (b,a)x2, (a,c)x1 — the hapax (a,c) is pruned
    cnt = {(r["w1"], r["w2"]): r["c"] for r in bi.collect()}
    assert cnt == {("a", "b"): 2, ("b", "a"): 2}
    cx = {r["w1"]: r["ctx"] for r in ctx.collect()}
    # contexts keep the UNPRUNED mass: a->{b,b,c}=3, b->{a,a}=2
    assert cx == {"a": 3, "b": 2}


def test_short_docs_score_null_and_are_kept_by_filter(spark):
    docs = _mk(spark, [(0, "common words common words"),
                       (1, "common words common words again"),
                       (2, "solo"), (3, "")])
    bi, ctx, v = train_bigram_lm(docs, "text")
    out = {r["doc_id"]: r for r in
           score_perplexity(docs, "text", "doc_id", bi, ctx, v).collect()}
    assert out[2]["n_bigrams"] == 0 and out[2]["perplexity"] is None
    assert out[3]["n_bigrams"] == 0
    kept = perplexity_filter(docs, "text", "doc_id", max_perplexity=1e9)
    assert {r["doc_id"] for r in kept.collect()} == {0, 1, 2, 3}


def test_filter_drops_out_of_distribution_doc(spark):
    """CCNet pattern: LM trained on a clean reference slice; the junk
    doc's bigrams are unseen there and hit the add-alpha floor.  (Pure
    self-training would NOT separate them: a doc of hapax bigrams over
    hapax contexts scores (c+a)/(ctx+aV) = 1.1/(1+aV) — high — which is
    exactly why the `lm_docs` parameter exists.)"""
    clean_rows = [(i, "the cat sat on the mat and the cat sat again")
                  for i in range(20)]
    clean = _mk(spark, clean_rows)
    docs = _mk(spark, clean_rows + [(99, "zq xv qp rr zq wk jj qq pz vv")])
    scored = score_perplexity(
        docs, "text", "doc_id", *train_bigram_lm(clean, "text"))
    vals = {r["doc_id"]: r["perplexity"] for r in scored.collect()}
    # every doc-99 bigram is unseen+OOV-context: P = a/(aV) = 1/V, V=7
    assert abs(vals[99] - 7.0) < 1e-9
    assert vals[99] > vals[0] * 3
    kept = perplexity_filter(docs, "text", "doc_id",
                             max_perplexity=(vals[0] + vals[99]) / 2,
                             lm_docs=clean)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 99 not in ids and ids == set(range(20))
