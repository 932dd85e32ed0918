"""TermFreqValueSource-family function values vs a brute-force twin
computed straight from the corpus (TermFreqValueSource zero-freq stub,
TFValueSource sqrt, NormValueSource exact lengthNorm,
ClassicSimilarity.idf)."""

from __future__ import annotations

import math

import pytest

from lucene_spark.search.functionvalues import (classic_idf,
                                                term_function_values)

TERM = "merge"


@pytest.fixture(scope="module")
def fv(spark, reader):
    return {r["doc_id"]: r for r in
            term_function_values(reader, TERM).collect()}


@pytest.fixture(scope="module")
def truth(corpus_pdf, reader):
    # brute force from the corpus the index was built from, tokenized by
    # the SAME analyzer chain the index used (the session index is "code")
    from lucene_spark.analysis import get_analyzer

    an = get_analyzer(reader.field_analyzer_name(reader.default_field))
    toks = {(r, p, c): an.tokenize_one(t) for r, p, c, t in
            zip(corpus_pdf["repo"], corpus_pdf["path"],
                corpus_pdf["commit"], corpus_pdf["content"])}
    ids = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in
           reader.docstats().select("doc_id", "repo", "path", "commit")
           .collect()}
    return toks, ids


def test_every_doc_has_a_row(fv, truth, reader):
    assert len(fv) == reader.doc_count == len(truth[0])


def test_termfreq_and_tf(fv, truth):
    toks, ids = truth
    hits = 0
    for ext, ts in toks.items():
        row = fv[ids[ext]]
        want = sum(1 for t in ts if t == TERM)
        assert row["termfreq"] == want
        assert row["tf"] == pytest.approx(math.sqrt(want))
        hits += want > 0
    assert hits > 0  # the corpus must actually contain the term


def test_norm_is_exact_inverse_sqrt_doclen(fv, truth):
    toks, ids = truth
    for ext, ts in list(toks.items())[:50]:
        assert fv[ids[ext]]["norm"] == pytest.approx(1.0 / math.sqrt(len(ts)))


def test_constants(fv, truth, reader):
    toks, _ = truth
    df = sum(1 for ts in toks.values() if TERM in ts)
    cf = sum(ts.count(TERM) for ts in toks.values())
    n = len(toks)
    any_row = next(iter(fv.values()))
    assert any_row["docfreq"] == df
    assert any_row["totaltermfreq"] == cf
    assert any_row["maxdoc"] == any_row["numdocs"] == n
    assert any_row["idf"] == pytest.approx(classic_idf(df, n))
    assert any_row["idf"] == pytest.approx(math.log((n + 1) / (df + 1)) + 1.0)
    assert any_row["sumtotaltermfreq"] == sum(len(ts) for ts in toks.values())


def test_absent_term_all_zero(reader):
    out = term_function_values(reader, "zzz_no_such_term_zzz").collect()
    assert len(out) == reader.doc_count
    assert all(r["termfreq"] == 0 and r["tf"] == 0.0 for r in out)
    assert out[0]["docfreq"] == 0 and out[0]["totaltermfreq"] == 0
    # idf degrades to log(N+1)+1, the reference's df=0 behavior
    assert out[0]["idf"] == pytest.approx(classic_idf(0, reader.doc_count))
