"""UAX29URLEmailTokenizer parity — vectors from the reference's
TestUAX29URLEmailTokenizer.java (word-break SA suite, testMid's full
MidLetter/MidNum/MidNumLet/ExtendNumLet matrix, scripts, CJK typing,
LUCENE-1545 combining marks) plus URL/email recognition."""

from __future__ import annotations

import pytest

from lucene_spark.analysis.uax29 import tokenize_uax29, uax29_tokens as tok


# ------------------------------------------------- testMid (full matrix)
@pytest.mark.parametrize("inp,want", [
    ("A:B", ["A:B"]), ("A::B", ["A", "B"]),
    ("1.2", ["1.2"]), ("A.B", ["A.B"]),
    ("1..2", ["1", "2"]), ("A..B", ["A", "B"]),
    ("1,2", ["1,2"]), ("1,,2", ["1", "2"]),
    ("A.:B", ["A", "B"]), ("A:.B", ["A", "B"]),
    ("1,.2", ["1", "2"]), ("1.,2", ["1", "2"]),
    ("A:B_A:B", ["A:B_A:B"]), ("A:B_A::B", ["A:B_A", "B"]),
    ("1.2_1.2", ["1.2_1.2"]), ("A.B_A.B", ["A.B_A.B"]),
    ("1.2_1..2", ["1.2_1", "2"]), ("A.B_A..B", ["A.B_A", "B"]),
    ("1,2_1,2", ["1,2_1,2"]), ("1,2_1,,2", ["1,2_1", "2"]),
    ("C_A.:B", ["C_A", "B"]), ("C_A:.B", ["C_A", "B"]),
    ("3_1,.2", ["3_1", "2"]), ("3_1.,2", ["3_1", "2"]),
    # ':' is MidLetter: no join between digits; ',' no join between letters
    ("1:2", ["1", "2"]), ("A,B", ["A", "B"]),
])
def test_mid_matrix(inp, want):
    assert tok(inp) == want


# -------------------------------------------------- StandardAnalyzer suite
@pytest.mark.parametrize("inp,want", [
    ("B2B", ["B2B"]), ("2B", ["2B"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["O'Reilly"]), ("you're", ["you're"]),
    ("she's", ["she's"]), ("Jim's", ["Jim's"]),
    ("21.35", ["21.35"]), ("R2D2 C3PO", ["R2D2", "C3PO"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("David has 5000 bones", ["David", "has", "5000", "bones"]),
    ("C embedded developers wanted",
     ["C", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "FOO", "BAR"]),
    ("foo      bar .  FOO <> BAR", ["foo", "bar", "FOO", "BAR"]),
    ('"QUOTED" word', ["QUOTED", "word"]),
    ("", []), (".", []), (" ", []),
])
def test_standard_analyzer_suite(inp, want):
    assert tok(inp) == want


def test_lucene_1545_combining_mark():
    assert tok("moͤchte") == ["moͤchte"]


# ------------------------------------------------------------- scripts
def test_armenian_with_midnum():
    assert tok("(4,600` հայերեն վիքիպեդիայում)") == \
        ["4,600", "հայերեն", "վիքիպեդիայում"]


def test_greek():
    assert tok("με το λογισμικό wiki, κάτι") == \
        ["με", "το", "λογισμικό", "wiki", "κάτι"]


def test_arabic_mixed_latin():
    assert tok("ويكيبيديا يسمى Truth in Numbers") == \
        ["ويكيبيديا", "يسمى", "Truth", "in", "Numbers"]


def test_korean_hangul_type():
    assert tokenize_uax29("훈민정음") == [("훈민정음", "<HANGUL>")]
    assert tok("안녕하세요 한글입니다") == ["안녕하세요", "한글입니다"]


def test_chinese_per_ideograph_and_fullwidth():
    assert tok("我是中国人。 １２３４ Ｔｅｓｔｓ ") == \
        ["我", "是", "中", "国", "人", "１２３４", "Ｔｅｓｔｓ"]


def test_japanese_types():
    assert tokenize_uax29("仮名遣い カタカナ") == [
        ("仮", "<IDEOGRAPHIC>"), ("名", "<IDEOGRAPHIC>"),
        ("遣", "<IDEOGRAPHIC>"), ("い", "<HIRAGANA>"),
        ("カタカナ", "<KATAKANA>")]


# ----------------------------------------------------------- URL / EMAIL
def test_emails_recognized_whole():
    out = tokenize_uax29("contact dev@example.com or bob.smith+tag@sub.example.org today")
    emails = [t for t, ty in out if ty == "<EMAIL>"]
    assert emails == ["dev@example.com", "bob.smith+tag@sub.example.org"]
    words = [t for t, ty in out if ty == "<ALPHANUM>"]
    assert words == ["contact", "or", "today"]


def test_urls_recognized_whole():
    out = tokenize_uax29(
        "see https://example.com/a-b/c?d=e&f=g#h and www.foo-bar.org/x, thanks")
    urls = [t for t, ty in out if ty == "<URL>"]
    assert urls == ["https://example.com/a-b/c?d=e&f=g#h",
                    "www.foo-bar.org/x"]


def test_url_trailing_punctuation_excluded():
    out = tokenize_uax29("(at http://example.com/path.) end")
    urls = [t for t, ty in out if ty == "<URL>"]
    assert urls == ["http://example.com/path"]


def test_num_vs_alphanum_types():
    out = dict(tokenize_uax29("abc 123 a1 1.2"))
    assert out["123"] == "<NUM>" and out["1.2"] == "<NUM>"
    assert out["abc"] == "<ALPHANUM>" and out["a1"] == "<ALPHANUM>"


def test_lone_extendnumlet_types_alphanum():
    assert tokenize_uax29("_ _a a_") == [
        ("_", "<ALPHANUM>"), ("_a", "<ALPHANUM>"), ("a_", "<ALPHANUM>")]


def test_combining_mark_in_kana_block_attaches():
    # U+3099 (combining voiced mark, hiragana block) is WB Extend
    assert tok("ガki") == ["ガ", "ki"]


def test_katakana_middle_dot_splits():
    assert tok("ア・イ") == ["ア", "イ"]   # U+30FB is MidLetter, not Katakana


def test_uppercase_url_scheme():
    out = tokenize_uax29("see HTTPS://EXAMPLE.COM now")
    assert [t for t, ty in out if ty == "<URL>"] == ["HTTPS://EXAMPLE.COM"]
    out2 = tokenize_uax29("WWW.EXAMPLE.COM rocks")
    assert [t for t, ty in out2 if ty == "<URL>"] == ["WWW.EXAMPLE.COM"]
