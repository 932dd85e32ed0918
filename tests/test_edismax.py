"""eDisMax parser — ExtendedDismaxQParser.java + SolrPluginUtils mm spec.

Structural tests pin the aliased tree shape (addAlias:151, the dismax-
over-qf expansion); mm tests mirror SolrPluginUtilsTest's
calculateMinShouldMatch cases; the execution tests run parsed trees
through the real searcher on a two-field index.
"""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_spark.analysis import get_analyzer
from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
from lucene_spark.index.builder import FieldSpec
from lucene_spark.search import IndexSearcher
from lucene_spark.search import plan as P
from lucene_spark.search.edismax import calculate_min_should_match, parse_edismax

WS = get_analyzer("whitespace")


# --- mm spec (SolrPluginUtils.calculateMinShouldMatch:670-711) -----------

@pytest.mark.parametrize("n,spec,want", [
    # SolrPluginUtilsTest.testMinShouldMatchCalculator:261-313, verbatim
    (5, "0", 0), (5, "0%", 0), (5, " -5 ", 0), (5, "\n -100% \n", 0),
    (5, " \n3\n ", 3), (5, "-3", 2), (3, "3", 3), (3, "-3", 0),
    (3, "5", 3), (3, "-5", 0),
    (3, " \n25% \n", 0), (4, "25%", 1), (5, " 25% ", 1), (10, "25%", 2),
    (3, " \n-25%\n ", 3), (4, "-25%", 3), (5, "-25%", 4), (10, "-25%", 8),
    (1, "3<0", 1), (2, "3<0", 2), (3, "3<0", 3), (4, "3<0", 0), (5, "3<0", 0),
    (1, "3<25%", 1), (2, " 3\n<\n25% ", 2), (3, "3<25%", 3),
    (4, "\n 3 < \n25%\n ", 1), (5, "3<25%", 1),
    (1, "\n3 < -25% 10 < -3 \n", 1), (2, " 3 < -25% 10 < -3\n", 2),
    (3, " 3 < -25% \n 10 < -3 \n", 3), (4, " 3 < -25% 10 < -3 ", 3),
    (5, " 3 < -25% 10 < -3", 4), (6, "3<-25% 10<-3", 5),
    (7, " 3 < -25% 10 < -3 ", 6), (8, " 3 < -25% 10 \n < -3\n", 6),
    (9, " 3 < -25% 10 < -3 \n", 7), (10, " 3 < -25% 10 < -3", 8),
    (11, "3<-25% 10<-3", 8), (12, "3<-25% 10<-3", 9),
    (100, "3<-25% 10<-3", 97),
    # local additions
    (5, "3", 3), (5, "75%", 3), (4, "100%", 4),
])
def test_mm_spec(n, spec, want):
    assert calculate_min_should_match(n, spec) == want


def test_mm_spec_invalid():
    with pytest.raises(ValueError):
        calculate_min_should_match(3, "2<")


# --- tree shape -----------------------------------------------------------

QF = {"title": 2.0, "body": 1.0}


def test_single_term_aliases_to_dismax():
    n = parse_edismax("lucene", QF, WS, tie=0.1)
    assert n == P.DisjunctionMaxNode(
        children=(P.TermNode(term="lucene", field="title", boost=2.0),
                  P.TermNode(term="lucene", field="body", boost=1.0)),
        tie_breaker=0.1)


def test_single_field_qf_skips_dismax_wrapper():
    assert parse_edismax("lucene", {"body": 3.0}, WS) == P.TermNode(
        term="lucene", field="body", boost=3.0)


def test_explicit_field_not_aliased():
    n = parse_edismax("body:lucene", QF, WS)
    assert n == P.TermNode(term="lucene", field="body")


def test_mm_applied_to_top_should_count():
    n = parse_edismax("a b c", QF, WS, mm="2")
    assert isinstance(n, P.BooleanNode)
    assert n.minimum_should_match == 2
    assert all(isinstance(c.node, P.DisjunctionMaxNode) for c in n.clauses)


def test_mm_ignores_non_should():
    # +a makes a MUST clause: only b and c count as optional
    n = parse_edismax("+a b c", QF, WS, mm="100%")
    assert n.minimum_should_match == 2


def test_phrase_boost_pf_pf2_pf3():
    n = parse_edismax(
        "a b c", {"body": 1.0}, WS, pf={"body": 1.0},
        pf2={"title": 1.5}, pf3={"body": 2.0}, ps=1)
    assert isinstance(n, P.BooleanNode)
    occurs = [c.occur for c in n.clauses]
    # MUST(user) + pf(1 whole) + pf2(2 bigrams) + pf3(1 trigram)
    assert occurs.count(P.Occur.MUST) == 1
    shoulds = [c.node for c in n.clauses if c.occur is P.Occur.SHOULD]
    phrases = [p for p in shoulds if isinstance(p, P.PhraseNode)]
    assert len(phrases) == 4
    assert P.PhraseNode(terms=("a", "b", "c"), slop=1, field="body") in phrases
    assert P.PhraseNode(terms=("a", "b"), slop=1, field="title",
                        boost=1.5) in phrases
    assert P.PhraseNode(terms=("b", "c"), slop=1, field="title",
                        boost=1.5) in phrases
    assert P.PhraseNode(terms=("a", "b", "c"), slop=1, field="body",
                        boost=2.0) in phrases


def test_pf_multi_field_group_is_dismax():
    n = parse_edismax("a b", {"body": 1.0}, WS,
                      pf={"title": 1.0, "body": 2.0}, tie=0.3)
    shoulds = [c.node for c in n.clauses if c.occur is P.Occur.SHOULD]
    assert len(shoulds) == 1
    dm = shoulds[0]
    assert isinstance(dm, P.DisjunctionMaxNode) and dm.tie_breaker == 0.3
    assert {(p.field, p.boost) for p in dm.children} == {("title", 1.0),
                                                         ("body", 2.0)}


def test_pf_skips_single_term_and_negated():
    # one normal term → no whole-query phrase; negated terms excluded
    n = parse_edismax("a -b", {"body": 1.0}, WS, pf={"body": 1.0})
    assert not any(isinstance(c.node, P.PhraseNode)
                   for c in n.clauses if isinstance(n, P.BooleanNode))


def test_bq_added_as_should():
    boost = P.TermNode(term="fast", field="body", boost=5.0)
    n = parse_edismax("a b", {"body": 1.0}, WS, bq=(boost,))
    assert isinstance(n, P.BooleanNode)
    assert P.Clause(P.Occur.SHOULD, boost) in n.clauses


def test_empty_query_is_match_none():
    assert parse_edismax("", QF, WS) == P.MatchNoneNode()


def test_requires_qf():
    with pytest.raises(ValueError):
        parse_edismax("a", {}, WS)


# --- execution over a real two-field index --------------------------------

DOCS = pd.DataFrame({
    "id": range(8),
    "title": ["apache lucene", "lucene search engine", "spark engine",
              "index merge", "lucene lucene", "other things",
              "search index", "apache spark"],
    "body": ["the lucene index", "fast search here", "cluster engine body",
             "merge policy", "nothing", "lucene search appears adjacent",
             "search comes then index", "apache text"],
})


@pytest.fixture(scope="module")
def ed_searcher(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edx") / "idx")
    cfg = IndexConfig(
        key_cols=("id",), content_col="title", partitions=2, num_buckets=4,
        fields=(FieldSpec(name="title", analyzer="whitespace",
                          index_positions=True),
                FieldSpec(name="body", analyzer="whitespace",
                          index_positions=True)))
    IndexBuilder(spark, cfg).build(spark.createDataFrame(DOCS), d,
                                   overwrite=True)
    return IndexSearcher(IndexReader(spark, d))


def _ids(searcher, node, scores=True):
    rows = searcher.matches(node, with_scores=scores).collect()
    ds = {r["doc_id"]: r["id"] for r in
          searcher.reader.docstats().select("doc_id", "id").collect()}
    return {ds[r["doc_id"]]: (r["score"] if scores else None) for r in rows}


def test_exec_dismax_match_set(ed_searcher):
    # 'lucene' in title or body
    got = _ids(ed_searcher, parse_edismax(
        "lucene", {"title": 1.0, "body": 1.0}, WS))
    assert set(got) == {0, 1, 4, 5}  # titles 0,1,4 + bodies 0,5


def test_exec_mm_filters(ed_searcher):
    qf = {"title": 1.0, "body": 1.0}
    loose = _ids(ed_searcher, parse_edismax("lucene search index", qf, WS))
    strict = _ids(ed_searcher, parse_edismax(
        "lucene search index", qf, WS, mm="2"))
    assert set(strict) < set(loose)
    # doc 6: search+index; doc 0: lucene+index; doc 1: lucene+search;
    # doc 5: lucene+search
    assert set(strict) == {0, 1, 5, 6}


def test_exec_pf2_boosts_adjacent(ed_searcher):
    qf = {"title": 1.0, "body": 1.0}
    base = _ids(ed_searcher, parse_edismax("lucene search", qf, WS))
    boosted = _ids(ed_searcher, parse_edismax(
        "lucene search", qf, WS, pf2={"body": 2.0}))
    # doc 5 has 'lucene search' adjacent in body — only its score moves up
    assert boosted[5] > base[5]
    for i in set(base) - {5, 1}:  # doc 1 adjacency is in TITLE, pf2 on body
        assert abs(boosted[i] - base[i]) < 1e-6
    assert set(boosted) == set(base)


def test_exec_tie_breaker_adds_weaker_leg(ed_searcher):
    qf = {"title": 1.0, "body": 1.0}
    # doc 0 matches 'lucene' in BOTH fields: tie>0 must add the weaker leg
    t0 = _ids(ed_searcher, parse_edismax("lucene", qf, WS, tie=0.0))
    t5 = _ids(ed_searcher, parse_edismax("lucene", qf, WS, tie=0.5))
    assert t5[0] > t0[0]
    # doc 4 matches in title only — tie must not change it
    assert abs(t5[4] - t0[4]) < 1e-6
