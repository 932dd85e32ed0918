"""CustomAnalyzer builder — factory-name-driven chains
(custom/CustomAnalyzer.java + TestCustomAnalyzer patterns)."""

import pytest

from lucene_spark.analysis.custom import (CustomAnalyzerBuilder,
                                          custom_analyzer)


def test_whitespace_with_folding():
    # testWhitespaceWithFolding: folded first, original stacked
    a = (CustomAnalyzerBuilder()
         .with_tokenizer("whitespace")
         .add_token_filter("asciifolding", preserveOriginal="true")
         .add_token_filter("lowercase")
         .build())
    assert a("Fächer") == ["facher", "fächer"]
    assert a("plain") == ["plain"]


def test_htmlstrip_classic_folding():
    # testFactoryHtmlStripClassicFolding shape
    a = custom_analyzer(
        "classic", char_filters=["htmlstrip"],
        token_filters=[("asciifolding", {"preserveOriginal": "true"}),
                       "lowercase"])
    assert a("<b>Résumé</b> of U.S.A. work") == \
        ["resume", "résumé", "of", "usa", "work"]


def test_stop_words_param():
    a = custom_analyzer(
        "whitespace",
        token_filters=[("stop", {"words": "a the",
                                 "ignoreCase": "true"}),
                       "porterstem"])
    assert a("The running foxes a jumped") == ["run", "fox", "jump"]


def test_pattern_tokenizer_param():
    a = custom_analyzer("pattern", token_filters=["lowercase"],
                        pattern=":")
    assert a("AAA:BBB:CCC") == ["aaa", "bbb", "ccc"]


def test_snowball_language_param():
    a = custom_analyzer(
        "whitespace",
        token_filters=[("snowballporter", {"language": "German"})])
    assert a("aufeinander") == ["aufeinand"]
    a = custom_analyzer(
        "whitespace",
        token_filters=["lowercase",
                       ("snowballporter", {"language": "English"})])
    assert a("Conspicuous") == ["conspicu"]


def test_kstem_and_misc_filters():
    a = custom_analyzer("whitespace",
                        token_filters=["lowercase", "kstem"])
    assert a("indexes searching") == ["index", "searching"]
    a = custom_analyzer("whitespace",
                        token_filters=[("truncate",
                                        {"prefixLength": "3"})])
    assert a("abcdef gh") == ["abc", "gh"]
    a = custom_analyzer("whitespace", token_filters=["fingerprint"])
    assert a("B A B E") == ["A B E"]
    a = custom_analyzer("whitespace",
                        token_filters=[("length", {"min": "2",
                                                   "max": "3"})])
    assert a("a ab abc abcd") == ["ab", "abc"]


def test_pathhierarchy_tokenizer():
    a = custom_analyzer("pathhierarchy")
    assert a("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
    a = custom_analyzer("pathhierarchy", reverse="true")
    assert a("/a/b/c") == ["/a/b/c", "a/b/c", "b/c", "c"]


def test_hunspell_filter_param():
    from lucene_spark.analysis.hunspell import HunspellDictionary

    d = HunspellDictionary(
        "SFX S Y 1\nSFX S 0 s .\n", "2\nfoo/S\nbar\n")
    a = custom_analyzer("whitespace",
                        token_filters=[("hunspellstem",
                                        {"dictionary": d})])
    assert a("foos bar") == ["foo", "bar"]


def test_unknown_factories_raise():
    with pytest.raises(ValueError, match="unknown tokenizer"):
        custom_analyzer("nosuch")
    with pytest.raises(ValueError, match="unknown token filter"):
        custom_analyzer("whitespace", token_filters=["nosuch"])
    with pytest.raises(ValueError, match="unknown char filter"):
        custom_analyzer("whitespace", char_filters=["nosuch"])
    with pytest.raises(ValueError, match="tokenizer is required"):
        CustomAnalyzerBuilder().build()


def test_series_hook():
    import pandas as pd

    from lucene_spark.analysis.custom import as_series_tokenizer

    a = custom_analyzer("whitespace", token_filters=["lowercase"])
    hook = as_series_tokenizer(a)
    assert hook(pd.Series(["A B", None])).tolist() == [["a", "b"], []]
