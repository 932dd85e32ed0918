"""KoreanNumberFilter vectors — every assertAnalyzesTo normalization in
the reference's TestKoreanNumberFilter.java, plus grammar-reject cases
and ja/ko grammar-sharing checks."""

import pytest

from lucene_spark.analysis.konumber import (is_numeral, ko_number_tokens,
                                            normalize_number)

VECTORS = [
    # testVariants
    ("3", "3"), ("３", "3"), ("삼", "3"),
    ("03", "3"), ("０３", "3"), ("영삼", "3"),
    ("003", "3"), ("００３", "3"), ("영영삼", "3"),
    ("3.0", "3"), ("３．０", "3"),
    # testLargeVariants
    ("삼오칠팔구", "35789"),
    ("육백이만오천일", "6025001"),
    ("조육백만오천일", "1000006005001"),
    ("십조육백만오천일", "10000006005001"),
    ("일경일", "10000000000000001"),
    ("십경십", "100000000000000010"),
    ("해경조억만천백십일", "100010001000100011111"),
    # testMixed
    ("삼천2백２십삼", "3223"), ("３２이삼", "3223"),
    # testFunny — the reference's documented additive oddities
    ("십십", "20"), ("백백백", "300"), ("천천천천", "4000"),
    # testHangulArabic
    ("영일이삼사오육칠팔구구팔칠육오사삼이일영", "1234567899876543210"),
    ("영영칠", "7"),
    # testDoubleZero
    ("영영", "0"),
    # testDecimal / separators
    ("１．２만３４５．６７", "12345.67"),
    ("３．２천", "3200"),
    ("4,647", "4647"),
    ("4,647.0010", "4647.001"),
    # testBasics core
    ("십만이천오백", "102500"),
]


@pytest.mark.parametrize("raw,want", VECTORS)
def test_normalize(raw, want):
    assert normalize_number(raw) == want


def test_rejects():
    assert normalize_number("원") is None           # not a numeral
    assert normalize_number("") is None
    assert not is_numeral("오늘")
    assert is_numeral("십만이천오백")


def test_token_run_merge():
    # the filter's adjacent-token concatenation: the tokenizer splits
    # 십만이천오백원 as 십만이천오백 + 원; the number run normalizes,
    # the rest passes through (TestKoreanNumberFilter.testBasics)
    toks = ["오늘", "십만", "이천오백", "원", "의", "와인", "구입"]
    assert ko_number_tokens(toks) == [
        "오늘", "102500", "원", "의", "와인", "구입"]
    # -백만 → the minus is not numeral punctuation (testNegative)
    assert ko_number_tokens(["-", "백만"]) == ["-", "1000000"]


def test_grammars_disjoint():
    # ja tables reject hangul and vice versa — the grammar is shared,
    # the tables are not
    from lucene_spark.analysis.janumber import normalize_number as ja_norm

    assert ja_norm("삼천이백") is None
    assert normalize_number("三千二百") is None
    assert ja_norm("三千二百") == "3200"
    assert normalize_number("삼천이백") == "3200"
