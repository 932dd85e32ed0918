"""WordDelimiterGraphFilter (analysis/worddelimiter.py) against the
expected token/position vectors published in the reference's
TestWordDelimiterGraphFilter.java, plus chain integration."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_spark.analysis.analyzers import Analyzer, get_analyzer
from lucene_spark.analysis.worddelimiter import (
    CATENATE_ALL, CATENATE_NUMBERS, CATENATE_WORDS, GENERATE_NUMBER_PARTS,
    GENERATE_WORD_PARTS, PRESERVE_ORIGINAL, SPLIT_ON_CASE_CHANGE,
    SPLIT_ON_NUMERICS, STEM_ENGLISH_POSSESSIVE, expand_tokens, token_parts)

SPLIT = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE
         | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE)
EVERYTHING = (SPLIT | CATENATE_WORDS | CATENATE_NUMBERS | CATENATE_ALL
              | PRESERVE_ORIGINAL)

# (input whitespace tokens, flags, protected, expected terms,
#  expected absolute positions or None) — every row is an expectation
# asserted by the reference's own test suite (terms in emission order,
# positions derived from its posInc vectors)
REFERENCE_VECTORS = [
    # TestWordDelimiterGraphFilter.testSplits
    (["basic-split"], SPLIT, (), ["basic", "split"], [0, 1]),
    (["camelCase"], SPLIT, (), ["camel", "Case"], [0, 1]),
    (["บ้าน"], SPLIT, (),
     ["บ้าน"], [0]),          # Thai NSM: no split
    (["test's'"], SPLIT, (), ["test"], [0]),
    (["Роберт"], SPLIT, (), ["Роберт"], [0]),
    (["РобЕрт"], SPLIT, (), ["Роб", "Ерт"], [0, 1]),
    (["aǅungla"], SPLIT, (), ["aǅungla"], [0]),   # titlecase char
    (["हिन्दी"], SPLIT, (), ["हिन्दी"], [0]),        # virama: no split
    (["١٢٣٤"], SPLIT, (), ["١٢٣٤"], [0]),          # non-ascii digits
    (["𠀀𠀀"], SPLIT, (), ["𠀀𠀀"], [0]),            # surrogate pairs
    # testPossessives
    (["ra's"], SPLIT, (), ["ra"], [0]),
    (["ra's"], SPLIT & ~STEM_ENGLISH_POSSESSIVE, (), ["ra", "s"], [0, 1]),
    # testTokenType (offsets case): catenate-all before parts
    (["foo-bar"], SPLIT | CATENATE_ALL, (),
     ["foobar", "foo", "bar"], [0, 0, 1]),
    # testPositionIncrements "SAL_S8371 - SAL" posInc {1,0,1,1,1,1}
    (["SAL_S8371", "-", "SAL"],
     GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE
     | SPLIT_ON_NUMERICS | PRESERVE_ORIGINAL, (),
     ["SAL_S8371", "SAL", "S", "8371", "-", "SAL"], [0, 0, 1, 2, 3, 4]),
    # testLotsOfConcatenating posInc {1,0,0,1,1,0,1}
    (["abc-def-123-456"], SPLIT | CATENATE_WORDS | CATENATE_NUMBERS
     | CATENATE_ALL, (),
     ["abcdef123456", "abcdef", "abc", "def", "123456", "123", "456"],
     [0, 0, 0, 1, 2, 2, 3]),
    # testLotsOfConcatenating2 (+PRESERVE) posInc {1,0,0,0,1,1,0,1}
    (["abc-def-123-456"], EVERYTHING, (),
     ["abc-def-123-456", "abcdef123456", "abcdef", "abc", "def",
      "123456", "123", "456"],
     [0, 0, 0, 0, 1, 2, 2, 3]),
    # testCatenateAllEmittedBeforeParts (LUCENE-9006)
    (["8-other"], PRESERVE_ORIGINAL | GENERATE_WORD_PARTS | CATENATE_ALL,
     (), ["8-other", "8other", "other"], [0, 0, 0]),
    (["other-9"], PRESERVE_ORIGINAL | GENERATE_WORD_PARTS | CATENATE_ALL,
     (), ["other-9", "other9", "other"], [0, 0, 0]),
    # testOriginalTokenEmittedFirst
    (["abc-def", "abcDEF", "abc123"], EVERYTHING, (),
     ["abc-def", "abcdef", "abc", "def", "abcDEF", "abcDEF", "abc", "DEF",
      "abc123", "abc123", "abc", "123"], None),
    # catenation at the FIRST subword's position (graph semantics;
    # "lucene.solr" case, posInc {1,0,1})
    (["lucene.solr"], GENERATE_WORD_PARTS | CATENATE_WORDS
     | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
     | STEM_ENGLISH_POSSESSIVE, (),
     ["lucenesolr", "lucene", "solr"], [0, 0, 1]),
    # protected words pass through (testKeywordFilter shape)
    (["abc-def", "klm-nop", "kpop"], GENERATE_WORD_PARTS, ("klm-nop",),
     ["abc", "def", "klm-nop", "kpop"], [0, 1, 2, 3]),
    # possessive inside delimiters
    (["O'Neil's"], SPLIT, (), ["O", "Neil"], [0, 1]),
    (["PowerShot"], GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE, (),
     ["Power", "Shot"], [0, 1]),
    # position accumulation across input tokens
    (["wi-fi", "SD500"], SPLIT, (), ["wi", "fi", "SD", "500"],
     [0, 1, 2, 3]),
    # swallowed all-delimiter token leaves a hole
    (["wi-fi", "---", "foo"], GENERATE_WORD_PARTS, (),
     ["wi", "fi", "foo"], [0, 1, 3]),
    # single subword surrounded by delimiters: trimmed, not passthrough
    (["(foo)"], GENERATE_WORD_PARTS, (), ["foo"], [0]),
]


@pytest.mark.parametrize(
    "tokens,flags,protected,exp_terms,exp_pos", REFERENCE_VECTORS)
def test_reference_vectors(tokens, flags, protected, exp_terms, exp_pos):
    t, p = expand_tokens(tokens, flags, frozenset(protected))
    assert t == exp_terms
    if exp_pos is not None:
        assert p == exp_pos


def test_token_parts_sentinels():
    assert token_parts("plain", SPLIT) is None          # passthrough
    assert token_parts("---", GENERATE_WORD_PARTS) == []  # swallowed
    with pytest.raises(ValueError):
        token_parts("x-y", 1 << 12)


def test_chain_series_scalar_identity():
    a = get_analyzer("wdgf")
    texts = ["Wi-Fi PowerShot SD500", "O'Neil's j2se", "--- (foo)",
             "", "Super-Duper-XL500-42-AutoCoder!"]
    series = a.tokenize_series(pd.Series(texts))
    for text, from_series in zip(texts, series):
        assert a.tokenize_one(text) == list(from_series)


def test_chain_lowercases_after_split():
    a = get_analyzer("wdgf")
    # case split happens on raw text, THEN lowercase
    assert a.tokenize_one("PowerShot") == ["powershot", "power", "shot"]


def test_chain_positions_flow_to_phrase_channel():
    a = get_analyzer("wdgf")
    toks, pos = a.tokenize_with_positions(pd.Series(["Wi-Fi SD500 x"]))
    assert list(toks[0]) == ["wifi", "wi", "fi", "sd", "500", "x"]
    assert list(pos[0]) == [0, 0, 1, 2, 3, 4]


def test_chain_stopwords_keep_wd_positions():
    a = Analyzer(name="_wd_stop_test",
                 word_delimiter=GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE,
                 stopwords=frozenset({"the"}))
    toks, pos = a.tokenize_with_positions(pd.Series(["the Wi-Fi theRouter"]))
    # 'the' dropped post-split, leaving its position hole at 0; and the
    # case-split 'the' inside 'theRouter' drops too
    assert list(toks[0]) == ["wi", "fi", "router"]
    assert list(pos[0]) == [1, 2, 4]


def test_payload_wd_combo_rejected():
    a = Analyzer(name="_wd_pay_test", word_delimiter=GENERATE_WORD_PARTS,
                 payload_delimiter="|")
    with pytest.raises(ValueError):
        a.tokenize_with_positions(pd.Series(["x-y|1.5"]))
