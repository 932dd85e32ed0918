"""PhraseWildcardQuery (sandbox/search/PhraseWildcardQuery.java:61-210).

Twins: the expansion must be equivalent to a hand-expanded
MultiPhraseQuery (the reference documents the equivalence); budget and
early-stop semantics checked explicitly.
"""

from __future__ import annotations

import pytest

import lucene_spark.search.plan as P


@pytest.fixture(scope="module")
def pw_reader(spark, corpus_pdf, tmp_path_factory):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader

    d = str(tmp_path_factory.mktemp("pwidx") / "index")
    cfg = IndexConfig(partitions=4, num_groups=2, num_buckets=8,
                      analyzer="code", index_positions=True)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(corpus_pdf), d,
                                   overwrite=True)
    return IndexReader(spark, d)


@pytest.fixture(scope="module")
def pw_searcher(pw_reader):
    from lucene_spark.search import IndexSearcher

    return IndexSearcher(pw_reader)


def test_phrase_wildcard_equals_manual_multiphrase(pw_searcher, pw_reader):
    """(in*) writer ≡ MultiPhrase((expand('in'), ('writer',)))."""
    node = P.PhraseWildcardNode(slots=(
        P.PrefixNode(prefix="in"), P.TermNode(term="writer")))
    got = {r["doc_id"]: r["score"] for r in pw_searcher.matches(node).collect()}

    terms = tuple(pw_reader.expand_prefix("in", 128, field=pw_reader.default_field))
    assert len(terms) > 1, "corpus degenerate: in* expands to one term"
    manual = P.MultiPhraseNode(positions=(terms, ("writer",)))
    exp = {r["doc_id"]: r["score"] for r in pw_searcher.matches(manual).collect()}
    assert got == pytest.approx(exp)
    assert got, "phrase-wildcard matched nothing — test corpus too small"


def test_phrase_wildcard_sloppy_and_fuzzy_slot(pw_searcher, pw_reader):
    """Slop carries through; a fuzzy slot expands like FuzzyQuery."""
    node = P.PhraseWildcardNode(
        slots=(P.FuzzyNode(term="index", max_edits=1),
               P.TermNode(term="writer")), slop=2)
    got = {r["doc_id"] for r in pw_searcher.matches(node).collect()}
    terms = tuple(pw_reader.expand_fuzzy("index", 1, max_terms=128,
                                      field=pw_reader.default_field))
    manual = P.MultiPhraseNode(positions=(terms, ("writer",)), slop=2)
    exp = {r["doc_id"] for r in pw_searcher.matches(manual).collect()}
    assert got == exp


def test_phrase_wildcard_budget_shared(pw_searcher, pw_reader):
    """The expansion budget is SHARED across multi-term slots: the
    second slot only gets what the first left over."""
    all_in = pw_reader.expand_prefix("in", 1024, field=pw_reader.default_field)
    assert len(all_in) >= 2
    # budget exactly len(first expansion): second multi-term slot gets 0
    node = P.PhraseWildcardNode(
        slots=(P.PrefixNode(prefix="in"), P.PrefixNode(prefix="wr")),
        max_multi_term_expansions=len(all_in))
    assert pw_searcher.matches(node).count() == 0
    # generous budget: matches the manual two-slot multiphrase
    node2 = P.PhraseWildcardNode(
        slots=(P.PrefixNode(prefix="in"), P.PrefixNode(prefix="wr")),
        max_multi_term_expansions=1024)
    wr = tuple(pw_reader.expand_prefix("wr", 1024, field=pw_reader.default_field))
    manual = P.MultiPhraseNode(positions=(tuple(all_in), wr))
    assert ({r["doc_id"] for r in pw_searcher.matches(node2).collect()}
            == {r["doc_id"] for r in pw_searcher.matches(manual).collect()})


def test_phrase_wildcard_early_stop(pw_searcher):
    """A dead single term or an empty expansion kills the phrase; an
    unsupported slot type raises."""
    assert pw_searcher.matches(P.PhraseWildcardNode(slots=(
        P.TermNode(term="zzzabsent"), P.PrefixNode(prefix="in")))).count() == 0
    assert pw_searcher.matches(P.PhraseWildcardNode(slots=(
        P.PrefixNode(prefix="zzzabsent"), P.TermNode(term="index")))).count() == 0
    assert pw_searcher.matches(P.PhraseWildcardNode(slots=())).count() == 0
    with pytest.raises(ValueError):
        pw_searcher.matches(P.PhraseWildcardNode(slots=(
            P.PhraseNode(terms=("a", "b")),)))
