"""Korean number normalization — the nori KoreanNumberFilter role.

KoreanNumberFilter.java is table-for-table the same recursive-descent
grammar as kuromoji's JapaneseNumberFilter (see
`lucene_spark.analysis.janumber.NumberGrammar`), with hangul numerals
영일이삼사오육칠팔구 → 0-9 (KoreanNumberFilter.java:99-110) and the
exponent ladder 십 10¹ / 백 10² / 천 10³ / 만 10⁴ / 억 10⁸ / 조 10¹² /
경 10¹⁶ / 해 10²⁰ (:112-121). Shares the ./．decimal points and
,/，thousand separators (:568-582). All TestKoreanNumberFilter vectors
(the 오늘 십만이천오백원 split, 천천천천 → 4000 additive oddity,
mixed 삼천2백２십삼, decimals １．２만３４５．６７) are pinned in
tests/test_konumber.py.
"""

from __future__ import annotations

from lucene_spark.analysis.janumber import NumberGrammar

KO_GRAMMAR = NumberGrammar(
    digits={"영": 0, "일": 1, "이": 2, "삼": 3, "사": 4,
            "오": 5, "육": 6, "칠": 7, "팔": 8, "구": 9},
    exps={"십": 1, "백": 2, "천": 3, "만": 4, "억": 8, "조": 12,
          "경": 16, "해": 20})


def is_numeral(s: str) -> bool:
    return KO_GRAMMAR.is_numeral(s)


def normalize_number(text: str) -> str | None:
    """Normalized decimal string for a hangul/Arabic numeral run, or
    None when the grammar rejects it or trailing characters remain."""
    return KO_GRAMMAR.normalize(text)


def ko_number_tokens(tokens: list[str]) -> list[str]:
    """KoreanNumberFilter over a flat token list: each maximal run of
    numeral tokens merges and normalizes (the filter's adjacent-token
    concatenation, KoreanNumberFilter.java:169-196); a failed parse
    falls back to the raw tokens."""
    return KO_GRAMMAR.number_tokens(tokens)
