"""Hunspell stemmer vectors — the reference's own fixture dictionaries
and every assertStemsTo in TestStemmer, TestCondition,
TestOptionalCondition, TestFullStrip, TestNeedAffix, TestCircumfix,
TestFlagLong, TestFlagNum, TestIgnore, TestEscaped, TestHomonyms, and
the TestHunspellStemFilter stream cases."""

import pytest

from lucene_spark.analysis.hunspell import (HunspellDictionary,
                                            hunspell_stem_tokens)

SIMPLE_AFF = """\
SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

SFX A Y 3
SFX A   0     e         n
SFX A   0     e         t
SFX A   0     e         h

SFX C Y 2
SFX C   0     d/C       c
SFX C   0     c         b

SFX D Y 1
SFX D   0     s         o

SFX E Y 1
SFX E   0     d         o

PFX B Y 1
PFX B   0     s         o
"""
SIMPLE_DIC = """\
9
ab/C
apach/A
foo/D
foo/E
lucen/A
lucene
mahout/A
moo/E
olr/B
"""


@pytest.fixture(scope="module")
def simple():
    return HunspellDictionary(SIMPLE_AFF, SIMPLE_DIC)


def assert_stems(d, word, *expected):
    assert sorted(d.stems(word)) == sorted(expected), word


def test_simple_suffix(simple):
    assert_stems(simple, "lucene", "lucene", "lucen")
    assert_stems(simple, "mahoute", "mahout")


def test_simple_prefix(simple):
    assert_stems(simple, "solr", "olr")


def test_recursive_suffix(simple):
    # we should not recurse here, as the suffix has no continuation
    assert_stems(simple, "abcd")


def test_all_stems(simple):
    assert_stems(simple, "ab", "ab")
    assert_stems(simple, "abc", "ab")
    assert_stems(simple, "apach", "apach")
    assert_stems(simple, "apache", "apach")
    assert_stems(simple, "foo", "foo", "foo")
    assert_stems(simple, "food", "foo")
    assert_stems(simple, "foos", "foo")
    assert_stems(simple, "lucen", "lucen")
    assert_stems(simple, "lucene", "lucen", "lucene")
    assert_stems(simple, "mahout", "mahout")
    assert_stems(simple, "mahoute", "mahout")
    assert_stems(simple, "moo", "moo")
    assert_stems(simple, "mood", "moo")
    assert_stems(simple, "olr", "olr")
    assert_stems(simple, "solr", "olr")


def test_bogus_stems(simple):
    for w in ("abs", "abe", "sab", "sapach", "sapache", "apachee",
              "sfoo", "sfoos", "fooss", "lucenee", "solre"):
        assert_stems(simple, w)


CONDITION_AFF = """\
SET UTF-8

PFX A Y 1
PFX A 0 re .

SFX B Y 2
SFX B 0 ed [^y]
SFX B y ied y
"""
OPTIONAL_CONDITION_AFF = """\
SET UTF-8

# has no condition
PFX A Y 1
PFX A 0 re

SFX B Y 2
SFX B 0 ed [^y]
SFX B y ied y
"""
CONDITION_DIC = "3\nhello\ntry/B\nwork/AB\n"


@pytest.mark.parametrize("aff", [CONDITION_AFF, OPTIONAL_CONDITION_AFF],
                         ids=["condition", "optional-condition"])
def test_conditions(aff):
    d = HunspellDictionary(aff, CONDITION_DIC)
    assert_stems(d, "hello", "hello")
    assert_stems(d, "try", "try")
    assert_stems(d, "tried", "try")
    assert_stems(d, "work", "work")
    assert_stems(d, "worked", "work")
    assert_stems(d, "rework", "work")
    assert_stems(d, "reworked", "work")
    for w in ("retried", "workied", "tryed", "tryied", "helloed"):
        assert_stems(d, w)


def test_full_strip():
    d = HunspellDictionary(
        "SET UTF-8\n\nFULLSTRIP\n\nSFX A Y 1\nSFX A   beer   tasty  .\n",
        "1\nbeer/A\n")
    assert_stems(d, "tasty", "beer")


def test_need_affix():
    d = HunspellDictionary(
        "SET UTF-8\n\nNEEDAFFIX Z\n\nPFX Y Y 1\nPFX Y 0 pre . pre+\n\n"
        "SFX X Y 1\nSFX X 0 s . +s\n",
        "3\ndrink/X\nwalk/XYZ\ntest/Z\n")
    assert_stems(d, "drink", "drink")
    assert_stems(d, "drinks", "drink")
    assert_stems(d, "walk")
    assert_stems(d, "walks", "walk")
    assert_stems(d, "prewalk", "walk")
    assert_stems(d, "prewalks", "walk")
    for w in ("test", "pretest", "tests", "pretests"):
        assert_stems(d, w)


def test_circumfix():
    d = HunspellDictionary(
        "SET UTF-8\n\nCIRCUMFIX X\n\nPFX A Y 1\nPFX A 0 leg/X .\n\n"
        "PFX B Y 1\nPFX B 0 legesleg/X .\n\n"
        "SFX C Y 3\nSFX C 0 obb . +COMPARATIVE\n"
        "SFX C 0 obb/AX . +SUPERLATIVE\n"
        "SFX C 0 obb/BX . +SUPERSUPERLATIVE\n",
        "1\nnagy/C\t[MN]\n")
    assert_stems(d, "nagy", "nagy")
    assert_stems(d, "nagyobb", "nagy")
    assert_stems(d, "legnagyobb", "nagy")
    assert_stems(d, "legeslegnagyobb", "nagy")
    for w in ("nagyobbobb", "legnagy", "legeslegnagy"):
        assert_stems(d, w)


def test_flag_long():
    d = HunspellDictionary(
        "SET UTF-8\nFLAG long\nSFX Y1 Y 1\nSFX Y1 0 s .\n\n"
        "SFX 1Y Y 1\nSFX 1Y 0 bogus .\n",
        "1\nfoo/Y1Z3F?\n")
    assert_stems(d, "foo", "foo")
    assert_stems(d, "foos", "foo")
    assert_stems(d, "fooss")
    assert_stems(d, "foobogus")


def test_flag_num():
    d = HunspellDictionary(
        "SET UTF-8\nFLAG num\nSFX 65000 Y 1\nSFX 65000 0 s .\n",
        "1\nfoo/65000,12,2756\n")
    assert_stems(d, "foo", "foo")
    assert_stems(d, "foos", "foo")
    assert_stems(d, "fooss")


def test_ignore():
    d = HunspellDictionary(
        "SET UTF-8\n\nIGNORE '-\n\nSFX X Y 1\nSFX X 0 able . +ABLE\n",
        "2\ndrink/X\t[VERB]\ndr-ank/X\t[VERB]\n")
    assert_stems(d, "drink", "drink")
    assert_stems(d, "drinkable", "drink")
    assert_stems(d, "dr'ink-able", "drink")
    assert_stems(d, "drank-able", "drank")
    assert_stems(d, "'-'-'-")


def test_escaped():
    d = HunspellDictionary(
        "SET UTF-8\nWORDCHARS \\/0123456789\n\n"
        "SFX A Y 1\nSFX A 0 s . +PLUR\n",
        "5\n/\n/a\nwork/A\nR2\\/D2/A\nN\\/A\n")
    assert_stems(d, "/", "/")
    assert_stems(d, "/a", "/a")
    assert_stems(d, "works", "work")
    assert_stems(d, "work", "work")
    assert_stems(d, "R2/D2", "R2/D2", "R2/d2")
    assert_stems(d, "R2/D2s", "R2/D2")
    assert_stems(d, "N/A", "N/A")
    assert_stems(d, "N/As")
    assert_stems(d, "//")


def test_homonyms():
    d = HunspellDictionary(
        "SET UTF-8\n\nSFX A Y 1\nSFX A 0 s . +SG3\n\n"
        "SFX B Y 1\nSFX B 0 s . +PLUR\n",
        "2\nwork/A\t[VERB]\nwork/B\t[NOUN]\n")
    assert_stems(d, "works", "work", "work")


@pytest.fixture(scope="module")
def simple_d(simple):
    return simple


def test_stem_filter(simple_d):
    # TestHunspellStemFilter.testKeywordAttribute
    toks = hunspell_stem_tokens(["lucene", "is", "awesome"], simple_d)
    assert [(t.text, t.position_increment) for t in toks] == [
        ("lucene", 1), ("lucen", 0), ("is", 1), ("awesome", 1)]
    # with keyword marker
    toks = hunspell_stem_tokens(["lucene", "is", "awesome"], simple_d,
                                keywords=frozenset(["lucene"]))
    assert [(t.text, t.position_increment) for t in toks] == [
        ("lucene", 1), ("is", 1), ("awesome", 1)]


def test_stem_filter_longest_only(simple_d):
    toks = hunspell_stem_tokens(["lucene", "is", "awesome"], simple_d,
                                dedup=False, longest_only=True)
    assert [(t.text, t.position_increment) for t in toks] == [
        ("lucene", 1), ("is", 1), ("awesome", 1)]


def test_empty_term(simple_d):
    assert simple_d.stems("") == []


def test_keep_case():
    d = HunspellDictionary(
        "SET UTF-8\n\nKEEPCASE Z\n\nSFX X Y 1\nSFX X 0 s . +s\n",
        "7\ndrink/X\nwalk/XZ\ntest/Z\nfoo/Z\nBar/Z\nbaz./Z\nQuux./Z\n")
    assert_stems(d, "drink", "drink")
    assert_stems(d, "Drink", "drink")
    assert_stems(d, "DRINK", "drink")
    assert_stems(d, "drinks", "drink")
    assert_stems(d, "Drinks", "drink")
    assert_stems(d, "DRINKS", "drink")
    assert_stems(d, "walk", "walk")
    assert_stems(d, "walks", "walk")
    for w in ("Walk", "Walks", "WALKS", "Test", "TEST", "Baz.", "QUUX."):
        assert_stems(d, w)
    assert_stems(d, "test", "test")
    assert_stems(d, "baz.", "baz.")
    assert_stems(d, "Quux.", "Quux.")
