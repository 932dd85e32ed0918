"""CJK analyzer golden tests.

Token vectors transcribed from the reference's
analysis/common/src/test/.../cjk/TestCJKAnalyzer.java and
TestCJKWidthFilter.java (chain: width fold → lowercase → CJK bigrams →
stop filter with cjk/stopwords.txt).
"""
from __future__ import annotations

import pandas as pd
import pytest

from lucene_spark.analysis.analyzers import get_analyzer, tokenize_pandas
from lucene_spark.analysis.cjk import cjk_width_fold


def toks(text: str) -> list[str]:
    return tokenize_pandas(pd.Series([text]), get_analyzer("cjk")).iloc[0]


# (input, expected tokens) — TestCJKAnalyzer.java:51-300
CJK_VECTORS = [
    # testJa1
    ("一二三四五六七八九十",
     ["一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九", "九十"]),
    # testJa2 — whitespace breaks runs; lone CJK char → unigram
    ("一 二三四 五六七八九 十",
     ["一", "二三", "三四", "五六", "六七", "七八", "八九", "十"]),
    # testC — plain English passthrough
    ("abc defgh ijklmn opqrstu vwxy z",
     ["abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z"]),
    # testFinalOffset
    ("あい", ["あい"]),
    ("あい   ", ["あい"]),
    ("test", ["test"]),
    ("test   ", ["test"]),
    ("あいtest", ["あい", "test"]),
    ("testあい    ", ["test", "あい"]),
    # testMix
    ("あいうえおabcかきくけこ",
     ["あい", "いう", "うえ", "えお", "abc", "かき", "きく", "くけ", "けこ"]),
    # testMix2 — single CJK char splits the latin run
    ("あいうえおabんcかきくけ こ",
     ["あい", "いう", "うえ", "えお", "ab", "ん", "c", "かき", "きく", "くけ", "こ"]),
    # testNonIdeographic — Arabic passes through untouched
    ("一 روبرت موير", ["一", "روبرت", "موير"]),
    # testNonIdeographicNonLetter — nonspacing mark stays token-internal
    ("一 رُوبرت موير", ["一", "رُوبرت", "موير"]),
    # testSurrogates — ext-B ideograph bigrams with its neighbor
    ("𩬅艱鍟䇹愯瀛", ["𩬅艱", "艱鍟", "鍟䇹", "䇹愯", "愯瀛"]),
    # testSingleChar
    ("一", ["一"]),
    # testTokenStream
    ("一丁丂", ["一丁", "丁丂"]),
]


@pytest.mark.parametrize("text,expected", CJK_VECTORS,
                         ids=[f"v{i}" for i in range(len(CJK_VECTORS))])
def test_cjk_analyzer_vectors(text, expected):
    assert toks(text) == expected


def test_cjk_stopwords_filter_english():
    # stop set is cjk/stopwords.txt (English function words)
    assert toks("the quick 一二 and brown") == ["quick", "一二", "brown"]


# TestCJKWidthFilter.java:50-63 — width folding incl. voiced-mark compose
WIDTH_VECTORS = [
    ("Ｔｅｓｔ １２３４", "Test 1234"),
    ("ｶﾀｶﾅ", "カタカナ"),
    ("ｳﾞｨｯﾂ", "ヴィッツ"),
    ("ﾊﾟﾅｿﾆｯｸ", "パナソニック"),
]


@pytest.mark.parametrize("text,expected", WIDTH_VECTORS)
def test_cjk_width_fold(text, expected):
    assert cjk_width_fold(text) == expected


def test_cjk_width_fold_through_analyzer():
    # fullwidth ASCII folds then lowercases; halfwidth kana folds then bigrams
    assert toks("Ｔｅｓｔ ｶﾀｶﾅ") == ["test", "カタ", "タカ", "カナ"]
