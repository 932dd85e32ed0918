"""ClassicAnalyzer vectors — every TestClassicAnalyzer
assertAnalyzesTo (the pre-3.1 StandardAnalyzer contract), including
the JavaCC-compliance rows and the LUCENE-1068 trailing-dot host."""

import pytest

from lucene_spark.analysis.classic import (ACRONYM, ALPHANUM, HOST, NUM,
                                           classic_analyzer_tokens,
                                           classic_tokens)

CASES = [
    ("B2B", ["b2b"]), ("2B", ["2b"]),
    ("word_having_underscore", ["word", "having", "underscore"]),
    ("word_with_underscore_and_stopwords",
     ["word", "underscore", "stopwords"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["o'reilly"]), ("you're", ["you're"]),
    ("she's", ["she"]), ("Jim's", ["jim"]), ("don't", ["don't"]),
    ("O'Reilly's", ["o'reilly"]),
    ("s-class", ["s", "class"]), ("t-com", ["t", "com"]),
    ("a-class", ["class"]),
    ("AT&T", ["at&t"]), ("Excite@Home", ["excite@home"]),
    ("www.nutch.org", ["www.nutch.org"]),
    ("www.nutch.org.", ["www.nutch.org"]),
    ("test@example.com", ["test@example.com"]),
    ("first.lastname@example.com", ["first.lastname@example.com"]),
    ("first_lastname@example.com", ["first_lastname@example.com"]),
    ("21.35", ["21.35"]), ("R2D2 C3PO", ["r2d2", "c3po"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("1-2-3", ["1-2-3"]), ("a1-b2-c3", ["a1-b2-c3"]),
    ("a1-b-c3", ["a1-b-c3"]),
    ("David has 5000 bones", ["david", "has", "5000", "bones"]),
    ("C embedded developers wanted",
     ["c", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "foo", "bar"]),
    ("foo      bar .  FOO <> BAR", ["foo", "bar", "foo", "bar"]),
    ('"QUOTED" word', ["quoted", "word"]),
    ("U.S.A.", ["usa"]), ("C++", ["c"]), ("C#", ["c"]),
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
    ("2004.jpg", ["2004.jpg"]),
    ("62.46", ["62.46"]),
    ("978-0-94045043-1", ["978-0-94045043-1"]),
    ("78academyawards/rules/rule02.html",
     ["78academyawards/rules/rule02.html"]),
    ("2006-03-11t082958z_01_ban130523_rtridst_0_ozabs",
     ["2006-03-11t082958z_01_ban130523_rtridst_0_ozabs"]),
    ("mid-20th", ["mid-20th"]),
    ("testˆtest", ["test", "test"]),
]


@pytest.mark.parametrize("text,want", CASES,
                         ids=[c[0][:25] for c in CASES])
def test_vectors(text, want):
    assert [t.text for t in classic_analyzer_tokens(text)] == want


def test_types():
    assert [(t.text, t.type) for t in classic_tokens("www.nutch.org.")] \
        == [("www.nutch.org", HOST)]
    assert classic_tokens("2004.jpg")[0].type == HOST
    assert classic_tokens("62.46")[0].type == HOST        # pre-NUM rule
    assert classic_tokens("978-0-94045043-1")[0].type == NUM
    assert classic_tokens("mid-20th")[0].type == NUM
    assert classic_tokens("U.S.A.")[0].type == ACRONYM
    assert classic_tokens("B2B")[0].type == ALPHANUM


def test_max_token_length():
    out = classic_analyzer_tokens("ab cd toolong xy z",
                                  max_token_length=5)
    assert [(t.text, t.position_increment) for t in out] == [
        ("ab", 1), ("cd", 1), ("xy", 2), ("z", 1)]


def test_max_token_length_255():
    long_term = "a" * 255
    out = classic_analyzer_tokens(f"ab cd {long_term} xy z")
    assert [t.text for t in out] == ["ab", "cd", long_term, "xy", "z"]
    out = classic_analyzer_tokens(f"ab cd {long_term}a xy z")
    assert [t.text for t in out] == ["ab", "cd", "xy", "z"]
