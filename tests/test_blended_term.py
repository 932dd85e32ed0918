"""BlendedTermQuery (search/BlendedTermQuery.java:56-300).

Twin strategy: per-term scores with the blended weight are the plain
BM25 term scores rescaled by idf(df_blend)/idf(df_term) (the per-doc
factor is stat-free), combined via DisjunctionMax(tie=0.01).
"""

from __future__ import annotations

import pytest

import lucene_spark.search.plan as P


def _stats(reader, terms):
    st = reader.term_stats([(reader.default_field, t) for t in terms])
    return {t: st.get((reader.default_field, t), (0, 0)) for t in terms}


def _expected_blended(searcher, reader, terms, boosts=None, tie=0.01):
    boosts = boosts or [1.0] * len(terms)
    st = _stats(reader, terms)
    present = [t for t in terms if st[t][0]]
    df_b = max(st[t][0] for t in present)
    n = reader.field_stats[reader.default_field]["doc_count"]
    idf = searcher.sim.idf
    per = {}
    for t, b in zip(terms, boosts):
        if not st[t][0]:
            continue
        scale = b * float(idf(df_b, n)) / float(idf(st[t][0], n))
        per[t] = {r["doc_id"]: r["score"] * scale
                  for r in searcher.matches(t).collect()}
    exp = {}
    for d in set().union(*(set(v) for v in per.values())):
        leg = [per[t][d] for t in per if d in per[t]]
        exp[d] = max(leg) + tie * (sum(leg) - max(leg))
    return exp


def test_blended_equals_rescaled_dismax(searcher, reader):
    terms = ("index", "merge")
    node = P.BlendedTermNode(terms=terms)
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}
    exp = _expected_blended(searcher, reader, terms)
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-3, d
    assert got


def test_blended_boosts_and_tie(searcher, reader):
    terms = ("index", "merge", "scan")
    boosts = (2.0, 1.0, 0.5)
    node = P.BlendedTermNode(terms=terms, boosts=boosts, tie_breaker=0.3)
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}
    exp = _expected_blended(searcher, reader, terms, boosts, tie=0.3)
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-3, d


def test_blended_absent_leg_and_in_boolean(searcher, reader):
    """Absent terms contribute only df=0/ttf=0 to the blend (rewrite
    loops over all contexts); the node composes inside a boolean."""
    node = P.BlendedTermNode(terms=("index", "zzzabsent"))
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}
    exp = _expected_blended(searcher, reader, ("index", "zzzabsent"))
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-3

    combo = P.BooleanNode(clauses=(
        P.Clause(P.Occur.MUST, P.BlendedTermNode(terms=("index", "merge"))),
        P.Clause(P.Occur.MUST_NOT, P.TermNode(term="scan")),
    ))
    got2 = {r["doc_id"] for r in searcher.matches(combo).collect()}
    blended = set(_expected_blended(searcher, reader, ("index", "merge")))
    scan = {r["doc_id"] for r in searcher.matches("scan").collect()}
    assert got2 == blended - scan


def test_blended_all_absent_matches_nothing(searcher):
    assert searcher.matches(
        P.BlendedTermNode(terms=("zzzq", "zzzr"))).count() == 0


def test_blended_explain_matches_score(searcher):
    node = P.BlendedTermNode(terms=("index", "merge"))
    rows = searcher.matches(node).collect()
    assert rows
    r = rows[0]
    ex = searcher.explain(node, r["doc_id"])
    assert ex["match"] and abs(ex["value"] - r["score"]) < 1e-4
