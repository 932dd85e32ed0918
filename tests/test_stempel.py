"""Stempel Polish stemmer (Egothor trie over the reference's trained
table) — TestPolishAnalyzer vectors + algorithm invariants."""

from __future__ import annotations

import pandas as pd

from lucene_spark.analysis.stempel import StempelStemmer, stempel_stem


def test_polish_analyzer_reference_vectors():
    # TestPolishAnalyzer.java:33-36: checkOneTerm(a,"studenta","student"),
    # checkOneTerm(a,"studenci","student")
    assert stempel_stem("studenta") == "student"
    assert stempel_stem("studenci") == "student"


def test_min_length_passthrough():
    # StempelFilter.java:69: only words LONGER than minLength (3) stem
    assert stempel_stem("ala") == "ala"
    assert stempel_stem("abc") == "abc"


def test_known_inflections():
    # common stempel behaviors (trained-table lemmatization)
    assert stempel_stem("studentom") == "student"
    assert stempel_stem("komputerze") == "komputer"
    assert stempel_stem("polskiego") == "polski"
    assert stempel_stem("najlepszych") == "najlepszy"


def test_unstemmables_pass_through():
    # non-Polish garbage: stem() may return None → word unchanged
    for w in ["qqqq", "0042", "xyzxyzxyz"]:
        assert isinstance(stempel_stem(w), str) and stempel_stem(w)


def test_diff_apply_opcodes():
    ap = StempelStemmer.apply_patch
    # R: replace at end; D: delete run; I: insert; -: seek backwards
    assert ap("abc", "Rd") == "abd"
    assert ap("abcd", "Da") == "abc"      # delete last char
    assert ap("abc", "") == "abc"
    # out-of-bounds patches abort silently (Diff.java:143-147)
    assert isinstance(ap("a", "Dz"), str)


def test_analyzer_chain(spark):
    from lucene_spark.analysis import get_analyzer

    a = get_analyzer("polish")
    toks = a.tokenize_series(pd.Series(["Studenci byli najlepsi"])).iloc[0]
    # 'byli' is a stopword; studenci → student
    assert "student" in toks
    assert "byli" not in toks
