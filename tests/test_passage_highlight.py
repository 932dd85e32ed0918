"""Passage highlighter (UnifiedHighlighter passage formation +
PassageScorer ranking — uhighlight/PassageScorer.java:78-134,
FieldHighlighter passage loop) against hand-computed expectations."""

from __future__ import annotations

import math

from lucene_spark.search.highlight import SENTENCE_RE, highlight_passages


def _score(freqs: dict[str, int], ttf: dict[str, int], plen: int,
           clen: int, start: int, k1=1.2, b=0.75, pivot=87.0) -> float:
    """The PassageScorer formula, recomputed independently."""
    s = 0.0
    for t, f in freqs.items():
        w = (k1 + 1.0) * math.log(
            1.0 + ((1.0 + clen / pivot) + 0.5) / (ttf[t] + 0.5))
        s += (f / (f + k1 * ((1.0 - b) + b * (plen / pivot)))) * w
    return s * (1.0 + 1.0 / math.log(pivot + start))


def test_sentence_re_tiles_the_string():
    import re

    for text in ["a b. c d! e", "x.. y", "no terminator at all",
                 "ends clean. ", "", "a.b.c", ". leading", "multi  space. x"]:
        pieces = re.findall(SENTENCE_RE, text)
        assert "".join(pieces) == text  # segmentation loses nothing


def test_selects_hit_sentence_and_tags(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma words here. the merge path wins here. tail words.")],
        "doc_id long, text string")
    out = highlight_passages(df, "text", ["merge"],
                             analyzer="whitespace").collect()[0]
    assert out["snippet"] == "the <b>merge</b> path wins here."
    assert out["passage_score"] > 0.0


def test_score_matches_hand_formula(spark):
    text = "merge merge scan stays"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = highlight_passages(df, "text", ["merge", "scan"],
                             analyzer="whitespace").collect()[0]
    exp = _score({"merge": 2, "scan": 1}, {"merge": 2, "scan": 1},
                 plen=len(text), clen=len(text), start=0)
    assert out["passage_score"] == exp
    assert out["snippet"] == "<b>merge</b> <b>merge</b> <b>scan</b> stays"


def test_two_passages_emitted_in_document_order(spark):
    # the SECOND sentence scores higher (two distinct terms beat one),
    # but with max_passages=2 the fragments join in document order
    df = spark.createDataFrame(
        [(0, "one merge here with padding words. merge scan together. "
             "nothing relevant in the tail sentence.")],
        "doc_id long, text string")
    out = highlight_passages(df, "text", ["merge", "scan"],
                             analyzer="whitespace",
                             max_passages=2).collect()[0]
    first, second = out["snippet"].split("... ")
    assert first.startswith("one <b>merge</b> here")
    assert second == "<b>merge</b> <b>scan</b> together."
    # best-passage score is the two-term sentence's score
    two_term = "merge scan together."
    clen = len("one merge here with padding words. merge scan together. "
               "nothing relevant in the tail sentence.")
    exp = _score({"merge": 1, "scan": 1}, {"merge": 2, "scan": 1},
                 plen=len(two_term), clen=clen,
                 start=len("one merge here with padding words. "))
    assert abs(out["passage_score"] - exp) < 1e-12


def test_no_match_falls_back_to_first_sentence(spark):
    df = spark.createDataFrame(
        [(0, "nothing to see here. second sentence."), (1, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in highlight_passages(
        df, "text", ["merge"], analyzer="whitespace").collect()}
    assert rows[0]["snippet"] == "nothing to see here."
    assert rows[0]["passage_score"] == 0.0
    assert rows[1]["snippet"] == "" and rows[1]["passage_score"] == 0.0


def test_non_whitespace_analyzer_scores_but_does_not_tag(spark):
    # standard analyzer lowercases: 'Merge' still matches the analyzed
    # query term, the fragment is emitted verbatim (offset-free tagging
    # is whitespace-only — see docstring)
    df = spark.createDataFrame(
        [(0, "padding sentence first. the Merge path. ")],
        "doc_id long, text string")
    out = highlight_passages(df, "text", ["merge"],
                             analyzer="standard").collect()[0]
    assert out["snippet"] == "the Merge path."
    assert out["passage_score"] > 0.0
