"""NGramPhraseQuery (search/NGramPhraseQuery.java:30-76) over the
char_ngram tokenizer (analysis/ngram/NGramTokenizer.java role).

The optimized (gapped) phrase must match the same docs as the full
consecutive-gram phrase; the rewrite rule itself is unit-tested.
"""

from __future__ import annotations

import pytest

import lucene_spark.search.plan as P
from lucene_spark.analysis import get_analyzer


def _grams(s: str, n: int = 2) -> tuple[str, ...]:
    return tuple(s[i:i + n] for i in range(len(s) - n + 1))


def test_rewrite_rule():
    """Keep every n-th gram + last at ORIGINAL positions; short/sloppy/
    n<2 fall back to the plain phrase (rewrite:46-75)."""
    node = P.NGramPhraseNode(n=2, terms=_grams("abcde"))  # ab bc cd de
    r = P.rewrite(node)
    assert isinstance(r, P.PhraseNode)
    assert r.terms == ("ab", "cd", "de") and r.positions == (0, 2, 3)
    # 3 terms, n=2 → keep 0 and last
    r3 = P.rewrite(P.NGramPhraseNode(n=2, terms=_grams("abcd")))
    assert r3.terms == ("ab", "cd") and r3.positions == (0, 2)
    # not optimizable: <3 terms / slop>0 / n<2
    assert P.rewrite(P.NGramPhraseNode(n=2, terms=_grams("abc"))).positions == ()
    assert P.rewrite(P.NGramPhraseNode(n=2, terms=_grams("abcde"), slop=1)).slop == 1
    assert P.rewrite(P.NGramPhraseNode(n=1, terms=("a", "b", "c"))).positions == ()


def test_tokenizer_stream():
    a = get_analyzer("ngram2")
    assert a.tokenize_one("Table xY z") == ["ta", "ab", "bl", "le", "xy"]


@pytest.fixture(scope="module")
def ng_searcher(spark, corpus_pdf, tmp_path_factory):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    d = str(tmp_path_factory.mktemp("ng") / "idx")
    cfg = IndexConfig(partitions=2, num_buckets=4, analyzer="ngram2",
                      index_positions=True)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(corpus_pdf), d,
                                   overwrite=True)
    return IndexSearcher(IndexReader(spark, d))


def test_optimized_matches_full_phrase(ng_searcher):
    """Gapped rewrite ≡ full consecutive-gram phrase on the match set
    (scores differ by design: the rewritten phrase has fewer idf terms,
    exactly like the reference's rewritten PhraseQuery)."""
    for word in ("merge", "index", "writer", "search"):
        g = _grams(word)
        assert len(g) >= 3
        opt = {r["doc_id"] for r in ng_searcher.matches(
            P.NGramPhraseNode(n=2, terms=g), with_scores=False).collect()}
        full = {r["doc_id"] for r in ng_searcher.matches(
            P.PhraseNode(terms=g), with_scores=False).collect()}
        assert opt == full, word
        assert opt, word


def test_gapped_phrase_positions_semantics(ng_searcher):
    """A hand-built gapped phrase ('me'/0, 'rg'/2) matches wherever the
    full gram run does — the PhraseQuery.Builder add(term, position)
    contract the rewrite relies on."""
    gapped = {r["doc_id"] for r in ng_searcher.matches(
        P.PhraseNode(terms=("me", "rg"), positions=(0, 2)),
        with_scores=False).collect()}
    full = {r["doc_id"] for r in ng_searcher.matches(
        P.PhraseNode(terms=("me", "er", "rg")), with_scores=False).collect()}
    # gapped is a superset (middle gram unconstrained) and covers full
    assert full <= gapped
