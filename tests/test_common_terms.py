"""CommonTermsQuery (queries/CommonTermsQuery.java:54-204).

Brute-force twins in the style of TestCommonTermsQuery: recompute the
df classification + two-group boolean over per-term match sets and
compare docs and scores.
"""

from __future__ import annotations

import math

import pytest

import lucene_spark.search.plan as P


def _per_term(searcher, terms):
    return {t: {r["doc_id"]: r["score"] for r in searcher.matches(t).collect()}
            for t in terms}


def _classify(reader, terms, cutoff):
    """The reference's buildQuery:149-155 classification, recomputed
    independently from termdict stats."""
    stats = reader.term_stats([(reader.default_field, t) for t in terms])
    n = reader.doc_count
    low, high = [], []
    for t in terms:
        st = stats.get((reader.default_field, t))
        if st is not None and ((cutoff >= 1 and st[0] > cutoff)
                               or st[0] > math.ceil(cutoff * n)):
            high.append(t)
        else:
            low.append(t)
    return low, high


def test_common_terms_low_must_high_should(searcher, reader):
    """Default shape (low=MUST, high=SHOULD): docs must match every
    low-frequency term; high-frequency terms only add to the score."""
    terms = ("index", "merge", "writer")
    # put the cutoff strictly between the min and max df so both groups
    # are non-empty regardless of corpus composition
    stats = reader.term_stats([(reader.default_field, t) for t in terms])
    dfs = sorted(df for df, _ in stats.values())
    assert dfs[0] < dfs[-1], "corpus degenerate: equal dfs"
    cutoff = (dfs[0] + dfs[-1]) / 2 / reader.doc_count
    low, high = _classify(reader, terms, cutoff)
    assert low and high

    node = P.CommonTermsNode(terms=terms, max_term_frequency=cutoff)
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}

    pt = _per_term(searcher, terms)
    exp = {}
    must_docs = set.intersection(*(set(pt[t]) for t in low))
    for d in must_docs:
        exp[d] = sum(pt[t].get(d, 0.0) for t in terms)
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-3, d


def test_common_terms_all_high_is_conjunction(searcher, reader):
    """Only high-frequency terms → rewritten to a conjunction
    (buildQuery:172-180): all terms must match."""
    terms = ("index", "merge")
    node = P.CommonTermsNode(terms=terms, max_term_frequency=1.0 / reader.doc_count)
    low, high = _classify(reader, terms, 1.0 / reader.doc_count)
    assert not low
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}
    pt = _per_term(searcher, terms)
    both = set(pt["index"]) & set(pt["merge"])
    assert set(got) == both
    for d in both:
        assert abs(got[d] - (pt["index"][d] + pt["merge"][d])) < 1e-3


def test_common_terms_low_should_msm(searcher, reader):
    """low_freq_occur=SHOULD with a fractional minimum-should-match:
    minNrShouldMatch(0.5, 3) = round(1.5) = 2 of the low terms."""
    terms = ("index", "merge", "writer", "scan")
    # force everything low (0.99 is a FRACTION; 1.0 would flip to the
    # absolute-count branch of the cutoff — maxTermFrequency >= 1f)
    node = P.CommonTermsNode(
        terms=terms, max_term_frequency=0.99,
        low_freq_occur=P.Occur.SHOULD, low_freq_msm=0.5)
    low, high = _classify(reader, terms, 0.99)
    assert len(low) == 4 and not high
    need = int(0.5 * 4 + 0.5)  # Math.round(0.5 * numOptional)
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}
    pt = _per_term(searcher, terms)
    exp = {}
    for d in set().union(*(set(v) for v in pt.values())):
        hits = [pt[t][d] for t in terms if d in pt[t]]
        if len(hits) >= need:
            exp[d] = sum(hits)
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-3


def test_common_terms_edges(searcher):
    """Empty → no hits; single term ≡ TermQuery; MUST_NOT rejected
    (constructor contract)."""
    assert searcher.matches(P.CommonTermsNode(terms=())).count() == 0
    one = P.CommonTermsNode(terms=("index",), max_term_frequency=0.5)
    got = {r["doc_id"]: r["score"] for r in searcher.matches(one).collect()}
    exp = {r["doc_id"]: r["score"] for r in searcher.matches("index").collect()}
    assert got == pytest.approx(exp)
    with pytest.raises(ValueError):
        P.CommonTermsNode(terms=("a",), low_freq_occur=P.Occur.MUST_NOT)


def test_common_terms_absent_terms_are_low(searcher):
    """A term missing from the index classifies low → with low=MUST the
    query matches nothing (a TermQuery over a missing term is empty)."""
    node = P.CommonTermsNode(
        terms=("index", "zzzmissingzzz"), max_term_frequency=0.99)
    assert searcher.matches(node).count() == 0
