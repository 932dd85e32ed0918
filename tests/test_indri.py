"""IndriAndQuery (search/IndriAndQuery.java, IndriAndScorer.java:35-61)
with IndriDirichletSimilarity (similarities/IndriDirichletSimilarity.java).

Brute-force twin: recompute the boost-normalized sum of Dirichlet
log-probs (freq-0 smoothing for absent terms) from the tokenized corpus.
"""

from __future__ import annotations

import math

import pytest

import lucene_spark.search.plan as P
from lucene_spark.analysis import get_analyzer


def _brute(reader, corpus_pdf, terms, boosts=None, mu=2000.0):
    a = get_analyzer("code")
    toks = {}
    key = {}
    for row in corpus_pdf.itertuples(index=False):
        key[(row.repo, row.path, row.commit)] = a.tokenize_one(row.content)
    ds = reader.docstats().select("repo", "path", "commit", "doc_id").collect()
    for r in ds:
        toks[r["doc_id"]] = key[(r["repo"], r["path"], r["commit"])]
    sum_ttf = reader.field_stats[reader.default_field]["sum_ttf"]
    cf = {t: sum(tt.count(t) for tt in toks.values()) for t in terms}
    present = [t for t in terms if cf[t] > 0]
    boosts = boosts or [1.0] * len(terms)
    bmap = dict(zip(terms, boosts))
    exp = {}
    for d, tt in toks.items():
        if not any(t in tt for t in present):
            continue
        dl = len(tt)
        acc, bsum = 0.0, 0.0
        for t in present:
            p = cf[t] / sum_ttf
            tf = tt.count(t)
            acc += bmap[t] * math.log((tf + mu * p) / (dl + mu))
            bsum += bmap[t]
        exp[d] = acc / bsum
    return exp


def test_indri_and_matches_brute_force(searcher, reader, corpus_pdf):
    terms = ("index", "merge")
    node = P.IndriAndNode(terms=terms)
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}
    exp = _brute(reader, corpus_pdf, terms)
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-3, d
    # scores are negative log-probs; docs holding both terms rank higher
    assert got and all(v < 0 for v in got.values())


def test_indri_and_boosts_and_absent_term(searcher, reader, corpus_pdf):
    """Per-term boosts weight the normalized sum; an index-absent term
    contributes neither score nor boost (IndriAndWeight.java:47-57)."""
    terms = ("index", "merge", "zzzabsent")
    node = P.IndriAndNode(terms=terms, boosts=(2.0, 1.0, 5.0))
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}
    exp = _brute(reader, corpus_pdf, terms, boosts=[2.0, 1.0, 5.0])
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-3, d


def test_indri_and_topk_ordering(searcher, reader, corpus_pdf):
    """search(k) over negative scores keeps Indri order (closer to 0 =
    more probable)."""
    node = P.IndriAndNode(terms=("index", "merge"))
    top = searcher.search(node, k=5).collect()
    exp = sorted(_brute(reader, corpus_pdf, ("index", "merge")).items(),
                 key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [r["doc_id"] for r in top] == [d for d, _ in exp]


def test_indri_all_absent(searcher):
    assert searcher.matches(P.IndriAndNode(terms=("zzzq", "zzzr"))).count() == 0
