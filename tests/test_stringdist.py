"""StringDistance parity — every vector from the reference's
TestLevenshteinDistance, TestJaroWinklerDistance and TestNGramDistance
(n=1,2,3), plus the LuceneLevenshtein quirk semantics."""

from __future__ import annotations

import pytest

from lucene_spark.search.stringdist import (jaro_winkler_distance,
                                            levenshtein_distance,
                                            lucene_levenshtein_distance,
                                            ngram_distance, osa_distance)

A = 0.001


# ------------------------------------------ TestLevenshteinDistance
@pytest.mark.parametrize("a,b,want", [
    ("al", "al", 1.0), ("martha", "marhta", 0.6666),
    ("jones", "johnson", 0.4285), ("abcvwxyz", "cabvwxyz", 0.75),
    ("dwayne", "duane", 0.666), ("dixon", "dicksonx", 0.5),
    ("six", "ten", 0.0), ("", "al", 0.0),
])
def test_levenshtein_vectors(a, b, want):
    assert levenshtein_distance(a, b) == pytest.approx(want, abs=A)


def test_levenshtein_relations():
    assert (levenshtein_distance("zac ephron", "zac efron")
            == pytest.approx(levenshtein_distance("zac ephron",
                                                  "kai ephron"), abs=A))
    assert (levenshtein_distance("brittney spears", "britney spears")
            > levenshtein_distance("brittney spears", "brittney startzman"))
    assert levenshtein_distance("", "") == 1.0


# ------------------------------------------ TestJaroWinklerDistance
def test_jaro_winkler_vectors():
    jw = jaro_winkler_distance
    assert jw("al", "al") == 1.0
    assert 0.961 < jw("martha", "marhta") < 0.962
    assert 0.832 < jw("jones", "johnson") < 0.833
    assert 0.958 < jw("abcvwxyz", "cabvwxyz") < 0.959
    assert 0.84 < jw("dwayne", "duane") < 0.841
    assert 0.813 < jw("dixon", "dicksonx") < 0.814
    assert jw("fvie", "ten") == 0.0
    assert jw("zac ephron", "zac efron") > jw("zac ephron", "kai ephron")
    assert (jw("brittney spears", "britney spears")
            > jw("brittney spears", "brittney startzman"))


def test_jaro_threshold_negative_disables_bonus():
    # setThreshold(-1) → pure Jaro (bonus branch never taken)
    j = jaro_winkler_distance("dixon", "dicksonx", threshold=2.0)
    jw = jaro_winkler_distance("dixon", "dicksonx")
    assert jw > j            # default threshold applies the bonus here


# ------------------------------------------------ TestNGramDistance
@pytest.mark.parametrize("n,a,b,want", [
    (1, "al", "al", 1.0), (1, "a", "a", 1.0), (1, "b", "a", 0.0),
    (1, "martha", "marhta", 0.6666), (1, "jones", "johnson", 0.4285),
    (1, "natural", "contrary", 0.25), (1, "abcvwxyz", "cabvwxyz", 0.75),
    (1, "dwayne", "duane", 0.666), (1, "dixon", "dicksonx", 0.5),
    (1, "six", "ten", 0.0),
    (2, "al", "al", 1.0), (2, "a", "a", 1.0), (2, "b", "a", 0.0),
    (2, "a", "aa", 0.5), (2, "martha", "marhta", 0.6666),
    (2, "jones", "johnson", 0.4285), (2, "natural", "contrary", 0.25),
    (2, "abcvwxyz", "cabvwxyz", 0.625), (2, "dwayne", "duane", 0.5833),
    (2, "dixon", "dicksonx", 0.5), (2, "six", "ten", 0.0),
    (3, "al", "al", 1.0), (3, "a", "a", 1.0), (3, "b", "a", 0.0),
    (3, "martha", "marhta", 0.7222), (3, "jones", "johnson", 0.4762),
    (3, "natural", "contrary", 0.2083), (3, "abcvwxyz", "cabvwxyz", 0.5625),
    (3, "dwayne", "duane", 0.5277), (3, "dixon", "dicksonx", 0.4583),
    (3, "six", "ten", 0.0),
])
def test_ngram_vectors(n, a, b, want):
    assert ngram_distance(a, b, n=n) == pytest.approx(want, abs=A)


def test_ngram_relations():
    for n in (1, 2, 3):
        d1 = ngram_distance("brittney spears", "britney spears", n=n)
        d2 = ngram_distance("brittney spears", "brittney startzman", n=n)
        assert d1 > d2
    assert (ngram_distance("12345678", "12890678", n=1)
            == pytest.approx(ngram_distance("12345678", "72385698", n=1),
                             abs=A))
    assert (ngram_distance("0012345678", "0012890678", n=2)
            == pytest.approx(ngram_distance("0012345678", "0072385698", n=2),
                             abs=A))


# --------------------------------------- LuceneLevenshteinDistance
def test_lucene_levenshtein_damerau_and_quirks():
    # transposition costs 1 (not 2): martha→marhta is ONE transposition
    assert (lucene_levenshtein_distance("martha", "marhta")
            == pytest.approx(1.0 - 1 / 6))
    # plain levenshtein of the same pair is 2 edits
    assert levenshtein_distance("martha", "marhta") == pytest.approx(1 - 2 / 6)
    # min-normalization (reference divides by min length)
    assert (lucene_levenshtein_distance("ab", "abcd")
            == pytest.approx(1.0 - 2 / 2))
    # empty-side quirk: returns max(n, m), not a [0,1] similarity
    assert lucene_levenshtein_distance("", "abc") == 3.0
    assert lucene_levenshtein_distance("", "") == 0.0


def test_spellcheck_distance_measure_option(reader):
    from lucene_spark.search.spellcheck import suggest_similar

    base = suggest_similar(reader, "mrege", n=5).collect()
    jw = suggest_similar(reader, "mrege", n=5,
                         distance="jaro_winkler").collect()
    assert base and jw
    # rescoring really applied: similarities are the JW values
    for r in jw:
        assert r["similarity"] == pytest.approx(
            round(jaro_winkler_distance(r["term"], "mrege"), 4))
    # candidate GENERATION unchanged (same ed bound): every suggested
    # term stays within 2 edits
    assert all(r["ed"] <= 2 for r in jw)
    with pytest.raises(ValueError):
        suggest_similar(reader, "mrege", distance="nope").collect()


def test_damerau_vs_osa_distinction():
    from lucene_spark.search.stringdist import damerau_distance

    # edits inside a transposed pair: Damerau 2, OSA 3
    assert damerau_distance("xabc", "xca") == 2
    assert osa_distance("xabc", "xca") == 3
    # simple swaps agree
    assert damerau_distance("emrge", "merge") == osa_distance(
        "emrge", "merge") == 1
    assert damerau_distance("", "ab") == 2
