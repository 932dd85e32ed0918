"""Thai maximal-matching segmenter (ThaiAnalyzer role) — the reference's
own test vectors (TestThaiAnalyzer.java:38-60) incl. offsets, mixed
scripts, the DecimalDigitFilter, and the registered chain."""

from __future__ import annotations

import pandas as pd

from lucene_spark.analysis.th import (
    ThaiSegmenter,
    fold_decimal_digits,
    th_token_lists,
)


def test_reference_vector_with_offsets():
    # TestThaiAnalyzer.testOffsets (java:38-47)
    seg = ThaiSegmenter()
    got = seg.tokenize("การที่ได้ต้องแสดงว่างานดี")
    assert got == [("การ", 0, 3), ("ที่", 3, 6), ("ได้", 6, 9),
                   ("ต้อง", 9, 13), ("แสดง", 13, 17), ("ว่า", 17, 20),
                   ("งาน", 20, 23), ("ดี", 23, 25)]


def test_reference_stopword_vector(spark):
    # TestThaiAnalyzer.testStopWords (java:50-60): การ/ที่/ได้/ต้อง/ว่า
    # are in the reference's th stop list → แสดง, งาน, ดี survive
    from lucene_spark.analysis import get_analyzer

    a = get_analyzer("thai")
    toks = a.tokenize_series(pd.Series(["การที่ได้ต้องแสดงว่างานดี"])).iloc[0]
    assert toks == ["แสดง", "งาน", "ดี"]


def test_mixed_script_no_space():
    # TestThaiAnalyzer.java:76-79: latin embedded WITHOUT a space still
    # splits at the script boundary
    seg = ThaiSegmenter()
    toks = [t for t, _, _ in seg.tokenize("การที่ได้ต้องthe แสดงว่างานดี")]
    assert toks == ["การ", "ที่", "ได้", "ต้อง", "the",
                    "แสดง", "ว่า", "งาน", "ดี"]


def test_unknown_thai_falls_to_single_chars():
    seg = ThaiSegmenter(lexicon={"ดี"})
    toks = [t for t, _, _ in seg.tokenize("งานดี")]
    assert toks == ["ง", "า", "น", "ดี"]


def test_decimal_digit_fold():
    # DecimalDigitFilter.java: Thai digits ๑๒๓ → 123
    assert fold_decimal_digits("๑๒๓abc45") == "123abc45"
    lists = th_token_lists(pd.Series(["๑๒๓ งานดี"]))
    assert lists.iloc[0][0] == "123"
