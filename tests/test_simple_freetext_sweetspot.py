"""SimpleQueryParser dialect, FreeTextSuggester, SweetSpotSimilarity."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_spark.analysis import get_analyzer
from lucene_spark.search import plan as P
from lucene_spark.search.simpleparser import parse_simple


AN = get_analyzer("standard")


# --------------------------------------------------------------- simple parser


def test_simple_terms_default_or():
    n = parse_simple("index writer", AN)
    assert isinstance(n, P.BooleanNode)
    assert [c.occur for c in n.clauses] == [P.Occur.SHOULD, P.Occur.SHOULD]


def test_simple_plus_means_and():
    n = parse_simple("index + writer", AN)
    assert isinstance(n, P.BooleanNode)
    assert all(c.occur == P.Occur.MUST for c in n.clauses)


def test_simple_pipe_means_or():
    n = parse_simple("index | writer", AN)
    assert isinstance(n, P.BooleanNode)
    assert all(c.occur == P.Occur.SHOULD for c in n.clauses)


def test_simple_negation_phrase_prefix_fuzzy():
    n = parse_simple('index -"merge policy" writ* fuzz~1', AN)
    kinds = [(c.occur, type(c.node)) for c in n.clauses]
    assert (P.Occur.MUST_NOT, P.PhraseNode) in kinds
    assert any(t is P.PrefixNode for _, t in kinds)
    assert any(t is P.FuzzyNode for _, t in kinds)


def test_simple_phrase_slop():
    n = parse_simple('"index writer"~3', AN)
    assert isinstance(n, P.PhraseNode) and n.slop == 3


def test_simple_grouping():
    n = parse_simple("(index | writer) + merge", AN)
    assert isinstance(n, P.BooleanNode)
    assert any(isinstance(c.node, P.BooleanNode) for c in n.clauses)


def test_simple_mixed_operators_group_left():
    """`foo bar + baz` = ((foo OR bar) AND baz) — the reference's
    left-to-right buildQueryTree, not a flat clause list."""
    n = parse_simple("foo bar + baz", AN)
    assert isinstance(n, P.BooleanNode) and len(n.clauses) == 2
    assert all(c.occur == P.Occur.MUST for c in n.clauses)
    left = n.clauses[0].node
    assert isinstance(left, P.BooleanNode)
    assert all(c.occur == P.Occur.SHOULD for c in left.clauses)

    n2 = parse_simple("qq + ww | ee", AN)
    assert isinstance(n2, P.BooleanNode) and len(n2.clauses) == 2
    assert all(c.occur == P.Occur.SHOULD for c in n2.clauses)
    inner = n2.clauses[0].node
    assert isinstance(inner, P.BooleanNode)
    assert all(c.occur == P.Occur.MUST for c in inner.clauses)


def test_simple_same_operator_flattens():
    n = parse_simple("qq + ww + ee", AN)
    assert isinstance(n, P.BooleanNode) and len(n.clauses) == 3
    assert all(c.occur == P.Occur.MUST for c in n.clauses)


def test_simple_leading_negation_flattens():
    n = parse_simple("-qq ww", AN)
    assert isinstance(n, P.BooleanNode) and len(n.clauses) == 2
    assert {c.occur for c in n.clauses} == {P.Occur.MUST_NOT, P.Occur.SHOULD}


@pytest.mark.parametrize("garbage", [
    "", "   ", "(((", ")", '"unclosed', "+-|", "a )( b", '""', "-", "*",
    "((a | ) b", '( "x -', "~", "a~x",
])
def test_simple_never_raises(garbage):
    n = parse_simple(garbage, AN)     # the no-exception contract
    assert n is not None


def test_simple_searchable(searcher):
    """Parsed simple-dialect trees run through the normal searcher."""
    n = parse_simple("index + writer", AN)
    rows = searcher.search(n, k=5).collect()
    classic = searcher.search("index AND writer", k=5).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in classic]


# ------------------------------------------------------------ free-text suggest


@pytest.fixture(scope="module")
def shingle_reader(spark, corpus_pdf, tmp_path_factory):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader

    d = str(tmp_path_factory.mktemp("ft") / "idx")
    cfg = IndexConfig(partitions=2, num_groups=1, num_buckets=4,
                      analyzer="whitespace_shingle2")
    IndexBuilder(spark, cfg).build(spark.createDataFrame(corpus_pdf), d,
                                   overwrite=True)
    return IndexReader(spark, d)


def test_free_text_suggest_matches_brute_force(shingle_reader, corpus_pdf):
    from lucene_spark.search.suggest import suggest_free_text

    ctx = "the"
    out = suggest_free_text(shingle_reader, ctx, n=10, alpha=0.4).collect()
    assert out
    # brute-force the stupid-backoff model from the raw corpus
    uni: dict[str, int] = {}
    big: dict[str, int] = {}
    for content in corpus_pdf["content"]:
        toks = content.split()
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            if a == ctx:
                big[b] = big.get(b, 0) + 1
    tot = sum(uni.values())
    expect = {}
    for w, c in uni.items():
        expect[w] = 0.4 * c / tot
    for w, c in big.items():
        expect[w] = c / uni[ctx]
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["term"], r["score"]) for r in out]
    for (ew, es), (gw, gs) in zip(top, got):
        assert gw == ew and gs == pytest.approx(es, rel=1e-9)


def test_free_text_unseen_context_backoff(shingle_reader):
    from lucene_spark.search.suggest import suggest_free_text

    out = suggest_free_text(shingle_reader, "zzznosuchword", n=5).collect()
    assert out and all(r["score"] > 0 for r in out)


def test_free_text_context_analyzed(spark, corpus_pdf, tmp_path_factory):
    """The lookup key runs through the field's analyzer: a lowercasing
    shingle chain must map 'The' to the same model row as 'the'.

    Uses the module-registered whitespace_lc_shingle2 chain — a runtime
    register_analyzer() here would KeyError in executor workers (see the
    register_analyzer docstring)."""
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search.suggest import suggest_free_text

    d = str(tmp_path_factory.mktemp("ftlc") / "idx")
    cfg = IndexConfig(partitions=2, num_groups=1, num_buckets=4,
                      analyzer="whitespace_lc_shingle2")
    IndexBuilder(spark, cfg).build(spark.createDataFrame(corpus_pdf), d,
                                   overwrite=True)
    r = IndexReader(spark, d)
    lo = [(x["term"], x["score"]) for x in suggest_free_text(r, "the", n=5).collect()]
    hi = [(x["term"], x["score"]) for x in suggest_free_text(r, "The", n=5).collect()]
    assert lo == hi and lo


def test_free_text_empty_context(shingle_reader):
    from lucene_spark.search.suggest import suggest_free_text

    with pytest.raises(ValueError):
        suggest_free_text(shingle_reader, "   ")


# ------------------------------------------------------------------ sweet spot


def test_sweetspot_length_norm_plateau():
    from lucene_spark.search.similarity import SweetSpotSimilarity

    sim = SweetSpotSimilarity(ln_min=100, ln_max=400, steepness=0.5)
    dl = np.array([50.0, 100.0, 250.0, 400.0, 800.0])
    ln = sim._length_norm(dl)
    # flat 1.0 inside the band
    assert ln[1] == ln[2] == ln[3] == pytest.approx(1.0)
    # falls off outside, symmetric shape: 1/sqrt(s*excess+1)
    assert ln[0] == pytest.approx(1.0 / math.sqrt(0.5 * 2 * 50 + 1))
    assert ln[4] == pytest.approx(1.0 / math.sqrt(0.5 * 2 * 400 + 1))


def test_sweetspot_baseline_tf():
    from lucene_spark.search.similarity import SweetSpotSimilarity

    sim = SweetSpotSimilarity(tf_base=1.5, tf_min=2.0)
    tf = np.array([0.0, 1.0, 2.0, 3.0, 11.0])
    bt = sim._baseline_tf(tf)
    assert bt[0] == 0.0
    assert bt[1] == bt[2] == pytest.approx(1.5)        # at/below min → base
    assert bt[3] == pytest.approx(math.sqrt(1.5 ** 2 + 3 - 2))
    assert bt[4] == pytest.approx(math.sqrt(1.5 ** 2 + 11 - 2))
    # continuity at the knee: sqrt(base² + min − min) = base
    assert sim._baseline_tf(np.array([2.0 + 1e-12]))[0] == pytest.approx(1.5)


def test_sweetspot_max_score_admissible():
    from lucene_spark.search.similarity import SweetSpotSimilarity

    sim = SweetSpotSimilarity(ln_min=100, ln_max=400, tf_base=1.0, tf_min=1.0)
    w = sim.weight(10, 1000)
    tf = np.array([1.0, 3.0, 7.0])
    for dl in (50.0, 250.0, 900.0):
        sc = sim.score(tf, np.full(3, dl), w, np.float32(200.0))
        mx = sim.max_score(np.float64(7.0), np.float64(dl), w, np.float32(200.0))
        assert mx >= sc.max() - 1e-6


def test_sweetspot_engine(reader):
    from lucene_spark.search import IndexSearcher

    s = IndexSearcher(reader, similarity="sweetspot")
    rows = s.search("index", k=5).collect()
    assert len(rows) == 5
    assert all(np.isfinite(r["score"]) and r["score"] >= 0 for r in rows)
