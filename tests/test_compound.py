"""Compound decomposition vectors — every TestCompoundWordTokenFilter
case: Swedish dictionary brute-force, longest-match, minimum-length
edge cases, and the Danish hyphenation grammar (da_UTF8.xml)."""

import os

import pytest

from lucene_spark.analysis.compound import (dictionary_decompound,
                                            hyphenation_decompound,
                                            parse_hyphenation_xml)

SE_DICT = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
           "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
           "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad"]


def texts(ts):
    return [t.text for t in ts]


def incs(ts):
    return [t.position_increment for t in ts]


def test_dictionary_se():
    toks = ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
            "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
            "Skomakare Vindrutetorkare Vindrutetorkarblad abba").split()
    out = dictionary_decompound(toks, SE_DICT)
    assert texts(out) == [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor",
        "Biltak", "Bil", "tak", "Slagborr", "Slag", "borr",
        "Hammarborr", "Hammar", "borr", "Pelarborr", "Pelar", "borr",
        "Glasögonfodral", "Glas", "ögon", "fodral",
        "Basfiolsfodral", "Bas", "fiol", "fodral",
        "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral",
        "makare", "gesäll",
        "Skomakare", "Sko", "makare",
        "Vindrutetorkare", "Vind", "rute", "torkare",
        "Vindrutetorkarblad", "Vind", "rute", "blad", "abba"]
    assert incs(out) == [
        1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0,
        1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0,
        1, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1]


def test_dictionary_se_longest_match():
    dic = SE_DICT[:12] + ["Fiols", "Makare", "Gesäll", "Sko", "Vind",
                          "Rute", "Torkare", "Blad", "Fiolsfodral"]
    out = dictionary_decompound(["Basfiolsfodralmakaregesäll"], dic,
                                only_longest_match=True)
    assert texts(out) == ["Basfiolsfodralmakaregesäll", "Bas",
                          "fiolsfodral", "fodral", "makare", "gesäll"]


def test_token_ending_with_minimum_length_component():
    out = dictionary_decompound(["abcdef"], ["ab", "cd", "ef"])
    assert texts(out) == ["abcdef", "ab", "cd", "ef"]
    assert incs(out) == [1, 0, 0, 0]


def test_component_below_minimum_length_dropped():
    out = dictionary_decompound(["abcdefg"], ["abc", "d", "efg"])
    assert texts(out) == ["abcdefg", "abc", "efg"]


def test_short_token_not_processed():
    # below min_word_size (5) the token passes through untouched
    out = dictionary_decompound(["abcd"], ["ab", "cd"])
    assert texts(out) == ["abcd"]


@pytest.fixture(scope="module")
def da_tree():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lucene_spark", "analysis", "data",
        "hyph_da.xml")
    with open(path, encoding="utf-8") as f:
        return parse_hyphenation_xml(f.read())


def test_hyphenation_da(da_tree):
    toks = "min veninde som er lidt af en læsehest".split()
    out = hyphenation_decompound(toks, da_tree, ["læse", "hest"])
    assert texts(out) == ["min", "veninde", "som", "er", "lidt", "af",
                          "en", "læsehest", "læse", "hest"]
    assert incs(out) == [1, 1, 1, 1, 1, 1, 1, 1, 0, 0]


def test_hyphenation_longest_match(da_tree):
    out = hyphenation_decompound(
        ["basketballkurv"], da_tree,
        ["basketball", "basket", "ball", "kurv"],
        max_subword_size=40, only_longest_match=True)
    assert texts(out) == ["basketballkurv", "basketball", "ball",
                          "kurv"]


def test_hyphenation_only(da_tree):
    # no dictionary: every hyphen-bounded span within size limits
    out = hyphenation_decompound(["basketballkurv"], da_tree,
                                 min_subword_size=2, max_subword_size=4)
    assert texts(out) == ["basketballkurv", "ba", "sket", "bal",
                          "ball", "kurv"]
    out = hyphenation_decompound(["basketballkurv"], da_tree,
                                 min_subword_size=4, max_subword_size=6)
    assert texts(out) == ["basketballkurv", "basket", "sket", "ball",
                          "lkurv", "kurv"]
    out = hyphenation_decompound(["basketballkurv"], da_tree,
                                 min_subword_size=4,
                                 max_subword_size=10)
    assert texts(out) == ["basketballkurv", "basket", "basketbal",
                          "basketball", "sket", "sketbal", "sketball",
                          "ball", "ballkurv", "lkurv", "kurv"]


def test_hyphenation_points(da_tree):
    assert da_tree.hyphenate("basketballkurv") == [0, 2, 6, 9, 10, 14]
    # too-short words and embedded non-letters reject
    assert da_tree.hyphenate("a") is None
    assert da_tree.hyphenate("ab1cd") is None
