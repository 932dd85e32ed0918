"""Pattern-family vectors — TestPatternTokenizer,
TestPatternReplaceFilter, TestPatternCaptureGroupTokenFilter."""

import pytest

from lucene_spark.analysis.patterns import (CaptureToken,
                                            pattern_capture_tokens,
                                            pattern_replace,
                                            pattern_replace_text,
                                            pattern_tokenize)

QPATTERN = r"\'([^\']+)\'"

SPLIT_TESTS = [
    (-1, "--", "aaa--bbb--ccc", ["aaa", "bbb", "ccc"]),
    (-1, ":", "aaa:bbb:ccc", ["aaa", "bbb", "ccc"]),
    (-1, r"\s", "aaa   bbb \t\tccc  ", ["aaa", "bbb", "ccc"]),
    (-1, ":", "boo:and:foo", ["boo", "and", "foo"]),
    (-1, "o", "boo:and:foo", ["b", ":and:f"]),
    (0, ":", "boo:and:foo", [":", ":"]),
    (0, QPATTERN, "aaa 'bbb' 'ccc'", ["'bbb'", "'ccc'"]),
    (1, QPATTERN, "aaa 'bbb' 'ccc'", ["bbb", "ccc"]),
]


@pytest.mark.parametrize("group,pattern,text,want", SPLIT_TESTS)
def test_pattern_tokenizer(group, pattern, text, want):
    assert pattern_tokenize(text, pattern, group) == want


REPL_IN = "aabfooaabfooabfoob ab caaaaaaaaab".split()


def test_replace_all():
    assert pattern_replace(REPL_IN, "a*b", "-", True) == \
        ["-foo-foo-foo-", "-", "c-"]


def test_replace_first():
    assert pattern_replace(REPL_IN, "a*b", "-", False) == \
        ["-fooaabfooabfoob", "-", "c-"]


def test_strip_first():
    assert pattern_replace(REPL_IN, "a*b", None, False) == \
        ["fooaabfooabfoob", "", "c"]


def test_strip_all():
    assert pattern_replace(REPL_IN, "a*b", None, True) == \
        ["foofoofoo", "", "c"]


def test_replace_with_backref():
    assert pattern_replace(REPL_IN, "(a*)b", r"\1$", True) == \
        ["aa$fooaa$fooa$foo$", "a$", "caaaaaaaaa$"]


def test_replace_char_filter():
    assert pattern_replace_text("aa bb aa", "aa", "x") == "x bb x"


def cap(tokens, patterns, preserve=False):
    out = pattern_capture_tokens(tokens, patterns, preserve)
    return [t.text for t in out], [t.position_increment for t in out]


def test_capture_no_pattern():
    assert cap(["foobarbaz"], []) == (["foobarbaz"], [1])
    assert cap(["foobarbaz"], [], True) == (["foobarbaz"], [1])


def test_capture_no_match():
    assert cap(["foo", "bar", "baz"], ["xx"]) == \
        (["foo", "bar", "baz"], [1, 1, 1])


def test_capture_no_capture_group():
    # a match without groups contributes nothing
    assert cap(["foobarbaz"], [".."]) == (["foobarbaz"], [1])


def test_capture_empty_capture():
    assert cap(["foobarbaz"], [".(y*)"]) == (["foobarbaz"], [1])


def test_capture_all():
    assert cap(["foobarbaz"], ["(.+)"]) == (["foobarbaz"], [1])
    # preserveOriginal skips the duplicate whole-token capture
    assert cap(["foobarbaz"], ["(.+)"], True) == (["foobarbaz"], [1])


def test_capture_start():
    assert cap(["foobarbaz"], ["^(.)"]) == (["f"], [1])
    assert cap(["foobarbaz"], ["^(.)"], True) == \
        (["foobarbaz", "f"], [1, 0])
    assert cap(["foo", "bar", "baz"], ["^(.)"], True) == \
        (["foo", "f", "bar", "b", "baz", "b"], [1, 0, 1, 0, 1, 0])


def test_capture_middle():
    assert cap(["foobarbaz"], ["^.(.)."]) == (["o"], [1])


def test_capture_camel_case():
    pats = ["([A-Z]{2,})", "(?<![A-Z])([A-Z][a-z]+)",
            r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)", "([0-9]+)"]
    assert cap(["letsPartyLIKEits1999_dude"], pats) == \
        (["lets", "Party", "LIKE", "its", "1999", "dude"],
         [1, 0, 0, 0, 0, 0])
    assert cap(["letsPartyLIKEits1999_dude"], pats, True) == \
        (["letsPartyLIKEits1999_dude", "lets", "Party", "LIKE", "its",
          "1999", "dude"], [1, 0, 0, 0, 0, 0, 0])


def test_capture_url_example():
    # the class javadoc example
    toks, _ = cap(["http://www.foo.com/index"],
                  [r"(https?://([a-zA-Z\-_0-9.]+))"])
    assert toks == ["http://www.foo.com", "www.foo.com"]


def test_capture_triplets():
    # "(...)" repeatedly: abcdefghi -> abc def ghi
    assert cap(["abcdefghi"], ["(...)"]) == \
        (["abc", "def", "ghi"], [1, 0, 0])
