"""suggest/document completion: SuggestField/ContextSuggestField +
PrefixCompletionQuery/RegexCompletionQuery/ContextQuery semantics
(weight*boost scoring, exact/prefix contexts, match-all, context-less
exclusion)."""

from __future__ import annotations

import pytest

from lucene_spark.search.completion import complete


@pytest.fixture(scope="module")
def sugg(spark):
    rows = [
        ("timer", 10, ["java", "go"]),
        ("timestamp", 30, ["java"]),
        ("timezone", 20, ["python"]),
        ("title", 40, None),             # plain SuggestField: no contexts
        ("token", 50, ["golang"]),
        ("index", 99, ["java"]),
    ]
    return spark.createDataFrame(
        rows, "suggestion string, weight long, contexts array<string>")


def rows(df):
    return [(r["suggestion"], r["score"]) for r in df.collect()]


def test_prefix_no_contexts_matches_all(sugg):
    # "When no context is added, the default behaviour is to suggest
    # across all contexts" — context-less suggestions included, boost 1
    out = rows(complete(sugg, "ti"))
    assert out == [("title", 40.0), ("timestamp", 30.0),
                   ("timezone", 20.0), ("timer", 10.0)]


def test_context_filter_and_boost(sugg):
    out = rows(complete(sugg, "ti", contexts={"java": 2.0, "python": 1.0}))
    # timestamp 30*2, timer 10*2, timezone 20*1; title has NO contexts →
    # excluded under a context query; 20.0 tie breaks suggestion-asc
    assert out == [("timestamp", 60.0), ("timer", 20.0), ("timezone", 20.0)]


def test_max_boost_across_matched_contexts(sugg):
    out = rows(complete(sugg, "timer", contexts={"java": 3.0, "go": 1.0}))
    assert out == [("timer", 30.0)]  # max path wins, not sum


def test_prefix_context_entry(sugg):
    # addContext("go", boost, exact=false) matches "go" AND "golang"
    out = rows(complete(sugg, "t", contexts=[("go", 2.0, False)]))
    assert out == [("token", 100.0), ("timer", 20.0)]


def test_match_all_contexts(sugg):
    out = rows(complete(sugg, "ti", contexts={"java": 9.0},
                        match_all_contexts=True))
    # addAllContexts: boost 1 everywhere, context-less included
    assert out == [("title", 40.0), ("timestamp", 30.0),
                   ("timezone", 20.0), ("timer", 10.0)]


def test_regex_mode_full_match(sugg):
    out = rows(complete(sugg, "tim.r|token", mode="regex"))
    assert out == [("token", 50.0), ("timer", 10.0)]
    # full-match semantics: the automaton anchors both ends
    assert rows(complete(sugg, "im", mode="regex")) == []


def test_topn_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("aa", 5, None), ("ab", 5, None), ("ac", 5, None)],
        "suggestion string, weight long, contexts array<string>")
    out = rows(complete(df, "a", n=2))
    assert out == [("aa", 5.0), ("ab", 5.0)]  # suggestion asc on ties


def test_zero_boost_keeps_but_zeroes(sugg):
    # reference allows boost 0 (>= 0 check); path matches, scores 0
    out = rows(complete(sugg, "timer", contexts={"java": 0.0}))
    assert out == [("timer", 0.0)]
