"""TermAutomatonQuery (sandbox/search/TermAutomatonQuery.java:67-209,
TermAutomatonScorer.java:231-345).

Micro-index with hand-computed match counts; equivalence twins against
Phrase/MultiPhrase (the query generalizes both — javadoc:67-70).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import lucene_spark.search.plan as P
from lucene_spark.search.kernel import term_automaton_dfa, term_automaton_freq

K1, B = np.float32(1.2), np.float32(0.75)

DOCS = pd.DataFrame({
    "id": range(6),
    "content": [
        "a b c",            # 0
        "a x b",            # 1: 'a ANY b' matches
        "a b a b b",        # 2: phrase 'a b' twice
        "c c c",            # 3
        "a q q b",          # 4: gap of 2
        "b a",              # 5: reversed
    ],
})


@pytest.fixture(scope="module")
def ta_searcher(spark, tmp_path_factory):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    d = str(tmp_path_factory.mktemp("ta") / "idx")
    cfg = IndexConfig(key_cols=("id",), content_col="content", partitions=2,
                      num_buckets=4, analyzer="whitespace",
                      index_positions=True)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(DOCS), d,
                                   overwrite=True)
    s = IndexSearcher(IndexReader(spark, d))
    ids = {r["doc_id"]: r["id"] for r in
           s.reader.docstats().select("doc_id", "id").collect()}
    return s, ids


def _hits(s, ids, node):
    return {ids[r["doc_id"]]: r["score"]
            for r in s.matches(node).collect()}


def test_linear_chain_equals_phrase(ta_searcher):
    """0 -a-> 1 -b-> 2(accept) ≡ PhraseQuery 'a b' (rewrite:454-530
    documents the equivalence for a single-string automaton)."""
    s, ids = ta_searcher
    node = P.TermAutomatonNode(
        transitions=((0, 1, "a"), (1, 2, "b")), accepts=(2,))
    got = _hits(s, ids, node)
    exp = _hits(s, ids, P.PhraseNode(terms=("a", "b")))
    assert set(got) == set(exp) == {0, 2}
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-5


def test_alternation_equals_multiphrase(ta_searcher):
    """Two arcs between the same states ≡ a MultiPhrase slot."""
    s, ids = ta_searcher
    node = P.TermAutomatonNode(
        transitions=((0, 1, "a"), (0, 1, "c"), (1, 2, "b")), accepts=(2,))
    got = _hits(s, ids, node)
    exp = _hits(s, ids, P.MultiPhraseNode(positions=(("a", "c"), ("b",))))
    assert set(got) == set(exp) == {0, 2}
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-5


def test_any_transition(ta_searcher):
    """'a ANY b': exactly one arbitrary token between a and b —
    including positions holding no query term (scorer:277-303)."""
    s, ids = ta_searcher
    node = P.TermAutomatonNode(
        transitions=((0, 1, "a"), (1, 2, None), (2, 3, "b")), accepts=(3,))
    got = _hits(s, ids, node)
    # doc1 'a x b' (gap token) and doc2 'a b a b b' ('a b a' no... a at 0,
    # any at 1 (b), b at 2? positions: a@0 b@1 a@2 b@3 b@4 → a@0,any@1,b@2? pos2 is 'a' ≠ b.
    # a@2, any@3, b@4 → match. So doc2 matches once.
    assert set(got) == {1, 2}


def test_cycle_counts_multiset_freq(ta_searcher):
    """0 -a-> 1(accept) -b-> 1: 'a b*' accepts at 'a' and every
    following b — doc2 'a b a b b' = a(1)+b(1) + a(1)+b(1)+b(1) = 5;
    verified through the score: tf=5 at the doc's doclen."""
    s, ids = ta_searcher
    node = P.TermAutomatonNode(
        transitions=((0, 1, "a"), (1, 1, "b")), accepts=(1,))
    got = _hits(s, ids, node)
    assert set(got) == {0, 1, 2, 4, 5}  # every doc containing 'a'
    # recompute doc2's expected score from freq=5
    r = s.reader
    stats = r.term_stats([(r.default_field, "a"), (r.default_field, "b")])
    n = r.field_stats[r.default_field]["doc_count"]
    idf = float(s.sim.idf(stats[(r.default_field, "a")][0], n)) + \
        float(s.sim.idf(stats[(r.default_field, "b")][0], n))
    dl = {ids[x["doc_id"]]: x["doclen"] for x in
          r.docstats().select("doc_id", "doclen").collect()}
    avgdl = np.float32(r.field_stats[r.default_field]["sum_ttf"] / n)
    exp2 = float(s.sim.score(np.array([5.0]), np.array([dl[2]]),
                             np.float32(idf), avgdl)[0])
    assert abs(got[2] - exp2) < 1e-5


def test_freq_simulation_unit():
    """Driver-level unit check of the DFA + countMatches twins."""
    node = P.TermAutomatonNode(
        transitions=((0, 1, "a"), (1, 1, "b")), accepts=(1,))
    tid, step, accept, has_any, gap = term_automaton_dfa(node)
    # 'a b a b b' → tokens (pos, sym)
    toks = sorted([(0, tid["a"]), (1, tid["b"]), (2, tid["a"]),
                   (3, tid["b"]), (4, tid["b"])])
    assert term_automaton_freq(toks, step, accept, has_any, gap) == 5
    # 'b a' → only the trailing a accepts once
    toks = [(0, tid["b"]), (1, tid["a"])]
    assert term_automaton_freq(toks, step, accept, has_any, gap) == 1


def test_finish_constraints():
    with pytest.raises(ValueError):
        P.TermAutomatonNode(transitions=((0, 1, None), (1, 2, "a")),
                            accepts=(2,))
    with pytest.raises(ValueError):
        P.TermAutomatonNode(transitions=((0, 1, "a"), (1, 2, None)),
                            accepts=(2,))
    with pytest.raises(ValueError):
        P.TermAutomatonNode(transitions=((0, 1, "a"),), accepts=(0, 1))


def test_absent_terms_match_nothing(ta_searcher):
    s, ids = ta_searcher
    node = P.TermAutomatonNode(
        transitions=((0, 1, "zzz"), (1, 2, "qqq")), accepts=(2,))
    assert s.matches(node).count() == 0


def test_term_automaton_explain(ta_searcher):
    s, ids = ta_searcher
    node = P.TermAutomatonNode(
        transitions=((0, 1, "a"), (1, 1, "b")), accepts=(1,))
    rows = {ids[r["doc_id"]]: r for r in s.matches(node).collect()}
    r2 = rows[2]
    ex = s.explain(node, r2["doc_id"])
    assert ex["match"] and abs(ex["value"] - r2["score"]) < 1e-5
    assert ex["details"][0]["value"] == 5  # freq of 'a b a b b'
    miss = s.explain(node, [d for d, i in ids.items() if i == 3][0])
    assert not miss["match"]
