"""JapaneseNumberFilter + JapaneseKatakanaStemFilter roles
(analysis/janumber.py) — every vector below is from the reference's
TestJapaneseNumberFilter.java / TestJapaneseKatakanaStemFilter.java."""

from __future__ import annotations

import pytest

from lucene_spark.analysis.janumber import (
    is_numeral,
    ja_number_tokens,
    katakana_stem,
    normalize_number,
)


# TestJapaneseNumberFilter.java:86-167
@pytest.mark.parametrize("text,want", [
    ("3", "3"), ("３", "3"), ("三", "3"),
    ("03", "3"), ("０３", "3"), ("〇三", "3"),
    ("003", "3"), ("００３", "3"), ("〇〇三", "3"),
    ("千", "1000"), ("1千", "1000"), ("１千", "1000"),
    ("一千", "1000"), ("一〇〇〇", "1000"), ("１０百", "1000"),
    ("三五七八九", "35789"), ("六百二万五千一", "6025001"),
    ("兆六百万五千一", "1000006005001"),
    ("十兆六百万五千一", "10000006005001"),
    ("一京一", "10000000000000001"),
    ("十京十", "100000000000000010"),
    ("垓京兆億万千百十一", "100010001000100011111"),
    ("三千2百２十三", "3223"), ("３２二三", "3223"),
    ("十十", "20"), ("百百百", "300"), ("千千千千", "4000"),
    ("〇一二三四五六七八九九八七六五四三二一〇",
     "1234567899876543210"),
    ("〇〇七", "7"), ("〇〇", "0"),
    ("京一", "10000000000000001"),
])
def test_reference_number_vectors(text, want):
    assert normalize_number(text) == want


def test_decimal_and_separator():
    assert normalize_number("3,000") == "3000"
    assert normalize_number("３，０００") == "3000"
    assert normalize_number("3.2千") == "3200"


def test_token_stream_merge_and_passthrough():
    # TestJapaneseNumberFilter testNegative / testNininsankyaku
    assert ja_number_tokens(["-", "100", "万"]) == ["-", "1000000"]
    assert ja_number_tokens(["二"]) == ["2"]
    assert ja_number_tokens(["二", "人", "三"]) == ["2", "人", "3"]
    assert ja_number_tokens(["田中", "京一"]) == \
        ["田中", "10000000000000001"]
    assert not is_numeral("人") and is_numeral("１千")


# TestJapaneseKatakanaStemFilter.java expectations
@pytest.mark.parametrize("token,want", [
    ("コーヒー", "コーヒ"),          # stemmed (len 4)
    ("タクシー", "タクシ"),
    ("パーティー", "パーティ"),
    ("コピー", "コピー"),            # len 3 < minimum: kept
    ("ター", "ター"),
    ("サッカー", "サッカ"),
    ("latte", "latte"),              # non-katakana: kept
    ("パーテ", "パーテ"),            # no trailing mark: kept
])
def test_katakana_stem_vectors(token, want):
    assert katakana_stem(token) == want


def test_katakana_stem_minimum_override():
    assert katakana_stem("ター", minimum=2) == "タ"
