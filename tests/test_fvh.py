"""FastVectorHighlighter: offset-exact fragments, phrase adjacency
(FieldPhraseList), margin windows, in-fragment multi-wrap."""

from __future__ import annotations

import pytest

from lucene_spark.analysis import get_analyzer
from lucene_spark.search.fvh import (_phrase_spans, fvh_highlight,
                                     tokens_with_offsets)


def test_offsets_index_original_text():
    an = get_analyzer("simple")          # lowercasing chain
    toks = tokens_with_offsets("Quick  brown FOX", an)
    # chain-identical terms, offsets over the RAW string
    assert toks == [("quick", 0, 5), ("brown", 7, 12), ("fox", 13, 16)]
    an2 = get_analyzer("whitespace")     # raw-case chain
    assert tokens_with_offsets("Quick FOX", an2) == [
        ("Quick", 0, 5), ("FOX", 6, 9)]


def test_phrase_requires_adjacency():
    an = get_analyzer("whitespace")
    toks = tokens_with_offsets("quick brown dog quick red brown", an)
    assert _phrase_spans(toks, ["quick", "brown"]) == [(0, 11)]
    assert _phrase_spans(toks, ["quick", "red", "brown"]) == [(16, 31)]
    assert _phrase_spans(toks, ["brown", "dog"]) == [(6, 15)]
    assert _phrase_spans(toks, ["dog", "red"]) == []   # not adjacent


def test_highlight_phrase_only(spark):
    rows = [
        (1, "alpha the quick brown fox jumped"),
        (2, "quick dog and a brown cat"),          # words present, not adjacent
        (3, "say quick brown twice: quick brown!"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["key"]: r["snippet"] for r in
           fvh_highlight(df, "text", "id", ["quick brown"],
                         analyzer="simple", margin=20).collect()}
    assert set(out) == {1, 3}                       # doc 2: no adjacency
    assert "<b>quick brown</b>" in out[1]
    # both in-fragment occurrences wrapped when within the margin window
    assert out[3].count("<b>quick brown</b>") == 2


def test_margin_window_exact(spark):
    text = "x" * 50 + " quick brown " + "y" * 50
    df = spark.createDataFrame([(1, text)], "id long, text string")
    snip = fvh_highlight(df, "text", "id", ["quick brown"],
                         margin=5).collect()[0]["snippet"]
    assert snip == "xxxx <b>quick brown</b> yyyy"


def test_multiple_phrases_and_no_match_rows(spark):
    df = spark.createDataFrame(
        [(1, "merge scan here"), (2, "nothing relevant")],
        "id long, text string")
    out = fvh_highlight(df, "text", "id", ["merge scan", "zz qq"]).collect()
    assert len(out) == 1 and out[0]["key"] == 1


def test_stopword_chain_shifts_positions_not_offsets():
    an = get_analyzer("standard")   # English stops dropped
    toks = tokens_with_offsets("the quick fox", an)
    assert toks == [("quick", 4, 9), ("fox", 10, 13)]


def test_term_rewriting_chains_rejected():
    from lucene_spark.analysis.analyzers import Analyzer

    for an in (Analyzer(name="_fvh_stem", stemmer="porter"),
               Analyzer(name="_fvh_shingle", shingle_size=2),
               Analyzer(name="_fvh_cg", common_grams=frozenset({"the"}))):
        with pytest.raises(ValueError):
            tokens_with_offsets("quick brown", an)


def test_multiple_fragments(spark):
    text = ("quick brown " + "x" * 120 + " quick brown " + "y" * 120 +
            " quick brown end")
    df = spark.createDataFrame([(1, text)], "id long, text string")
    out = fvh_highlight(df, "text", "id", ["quick brown"], margin=10,
                        max_fragments=3).collect()
    assert [r["fragment"] for r in out] == [0, 1, 2]
    assert all(r["snippet"].count("<b>quick brown</b>") == 1 for r in out)
    # default stays single-fragment
    one = fvh_highlight(df, "text", "id", ["quick brown"],
                        margin=10).collect()
    assert len(one) == 1 and one[0]["fragment"] == 0


def test_fragment_swallows_close_hits(spark):
    text = "quick brown and quick brown far " + "z" * 200 + " quick brown"
    df = spark.createDataFrame([(1, text)], "id long, text string")
    out = fvh_highlight(df, "text", "id", ["quick brown"], margin=30,
                        max_fragments=5).collect()
    # first two hits share fragment 0; the far one is fragment 1
    assert len(out) == 2
    assert out[0]["snippet"].count("<b>") == 2
    assert out[1]["snippet"].count("<b>") == 1


def test_straddling_hit_opens_next_fragment(spark):
    # review regression: a hit starting inside the window but ending
    # beyond it must open the NEXT fragment, never vanish
    df = spark.createDataFrame([(1, "quick brown xx quick brown")],
                               "id long, text string")
    out = fvh_highlight(df, "text", "id", ["quick brown"], margin=5,
                        max_fragments=5).collect()
    total = sum(r["snippet"].count("<b>quick brown</b>") for r in out)
    assert total == 2


def test_fvh_from_stored_vectors_matches_reanalysis(spark):
    """The stored-vector path (FieldTermStack contract) must produce
    byte-identical output to the re-analysis path."""
    from lucene_spark.index.termvectors import term_vectors_with_offsets
    from lucene_spark.search.fvh import (fvh_highlight,
                                         fvh_highlight_from_vectors)

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the quick brown dog"),
         (2, "nothing to see here"),
         (3, "quick brown at the start and quick brown at the end "
             "quick brown")],
        "id long, text string")
    tv = term_vectors_with_offsets(docs, "text", "id")
    joined = docs.join(tv.withColumnRenamed("key", "id"), "id")
    a = sorted((r["key"], r["fragment"], r["snippet"]) for r in
               fvh_highlight(docs, "text", "id", ["quick brown"],
                             max_fragments=3).collect())
    b = sorted((r["key"], r["fragment"], r["snippet"]) for r in
               fvh_highlight_from_vectors(
                   joined, "text", "id", "tv_terms", "tv_starts",
                   "tv_ends", ["quick brown"], max_fragments=3).collect())
    assert a == b and len(a) > 0
    assert all(k != 2 for k, _, _ in a)
