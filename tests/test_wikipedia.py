"""WikipediaTokenizer vectors — every TestWikipediaTokenizer case:
testSimple, testHandwritten (98 tokens + types), testLinkPhrases
(posInc-0 link description), testLinks, testLucene1133 (UNTOKENIZED
collapse with offsets), testBoth (collapsed + individual tokens with
flags)."""

from lucene_spark.analysis.wikipedia import (ALPHANUM, APOSTROPHE, BOLD,
                                             BOLD_ITALICS, BOTH, CATEGORY,
                                             CITATION, EXTERNAL_LINK,
                                             EXTERNAL_LINK_URL, HEADING,
                                             INTERNAL_LINK, ITALICS, NUM,
                                             SUB_HEADING, TOKENS_ONLY,
                                             UNTOKENIZED_ONLY,
                                             UNTOKENIZED_TOKEN_FLAG,
                                             wikipedia_tokens)

LINK_PHRASES = ("click [[link here again]] click "
                "[http://lucene.apache.org here again] "
                "[[Category:a b c d]]")


def test_simple():
    toks = wikipedia_tokens("This is a [[Category:foo]]")
    assert [(t.text, t.type, t.start, t.end, t.position_increment)
            for t in toks] == [
        ("This", ALPHANUM, 0, 4, 1), ("is", ALPHANUM, 5, 7, 1),
        ("a", ALPHANUM, 8, 9, 1), ("foo", CATEGORY, 21, 24, 1)]


HANDWRITTEN = (
    "[[link]] This is a [[Category:foo]] Category  This is a linked "
    "[[:Category:bar none withstanding]] "
    "Category This is (parens) This is a [[link]]  This is an external "
    "URL [http://lucene.apache.org] "
    "Here is ''italics'' and ''more italics'', '''bold''' and "
    "'''''five quotes''''' "
    " This is a [[link|display info]]  This is a period.  Here is "
    "$3.25 and here is 3.50.  Here's Johnny.  "
    "==heading== ===sub head=== followed by some text  "
    "[[Category:blah| ]] "
    "''[[Category:ital_cat]]''  here is some that is ''italics "
    "[[Category:foo]] but is never closed."
    "'''same [[Category:foo]] goes for this '''''and2 "
    "[[Category:foo]] and this"
    " [http://foo.boo.com/test/test/ Test Test] "
    "[http://foo.boo.com/test/test/test.html Test Test]"
    " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] "
    "<ref>Citation</ref> <sup>martian</sup> "
    "<span class=\"glue\">code</span>")

HANDWRITTEN_TEXTS = [
    "link", "This", "is", "a", "foo", "Category", "This", "is", "a",
    "linked", "bar", "none", "withstanding", "Category", "This", "is",
    "parens", "This", "is", "a", "link", "This", "is", "an",
    "external", "URL", "http://lucene.apache.org", "Here", "is",
    "italics", "and", "more", "italics", "bold", "and", "five",
    "quotes", "This", "is", "a", "link", "display", "info", "This",
    "is", "a", "period", "Here", "is", "3.25", "and", "here", "is",
    "3.50", "Here's", "Johnny", "heading", "sub", "head", "followed",
    "by", "some", "text", "blah", "ital", "cat", "here", "is", "some",
    "that", "is", "italics", "foo", "but", "is", "never", "closed",
    "same", "foo", "goes", "for", "this", "and2", "foo", "and",
    "this", "http://foo.boo.com/test/test/", "Test", "Test",
    "http://foo.boo.com/test/test/test.html", "Test", "Test",
    "http://foo.boo.com/test/test/test.html?g=b&c=d", "Test", "Test",
    "Citation", "martian", "code"]

A = ALPHANUM
HANDWRITTEN_TYPES = [
    INTERNAL_LINK, A, A, A, CATEGORY, A, A, A, A, A,
    CATEGORY, CATEGORY, CATEGORY, A, A, A, A, A, A, A,
    INTERNAL_LINK, A, A, A, A, A, EXTERNAL_LINK_URL, A, A, ITALICS,
    A, ITALICS, ITALICS, BOLD, A, BOLD_ITALICS, BOLD_ITALICS, A, A,
    A, INTERNAL_LINK, INTERNAL_LINK, INTERNAL_LINK, A, A, A, A, A, A,
    NUM, A, A, A, NUM, APOSTROPHE, A, HEADING, SUB_HEADING,
    SUB_HEADING, A, A, A, A, CATEGORY, CATEGORY, CATEGORY, A, A, A,
    A, A, ITALICS, CATEGORY, A, A, A, A, BOLD, CATEGORY, A, A, A,
    BOLD_ITALICS, CATEGORY, A, A, EXTERNAL_LINK_URL, EXTERNAL_LINK,
    EXTERNAL_LINK, EXTERNAL_LINK_URL, EXTERNAL_LINK, EXTERNAL_LINK,
    EXTERNAL_LINK_URL, EXTERNAL_LINK, EXTERNAL_LINK, CITATION, A, A]


def test_handwritten():
    toks = wikipedia_tokens(HANDWRITTEN)
    assert [t.text for t in toks] == HANDWRITTEN_TEXTS
    assert [t.type for t in toks] == HANDWRITTEN_TYPES


def check_link_phrases(untoks=frozenset()):
    toks = wikipedia_tokens(LINK_PHRASES, TOKENS_ONLY, untoks)
    assert [t.text for t in toks] == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c",
        "d"]
    assert [t.position_increment for t in toks] == \
        [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]


def test_link_phrases():
    check_link_phrases()


def test_links():
    test = ("[http://lucene.apache.org/java/docs/index.html#news here]"
            " [http://lucene.apache.org/java/docs/index.html?b=c here]"
            " [https://lucene.apache.org/java/docs/index.html?b=c"
            " here]")
    toks = wikipedia_tokens(test)
    assert [(t.text, t.type) for t in toks] == [
        ("http://lucene.apache.org/java/docs/index.html#news",
         EXTERNAL_LINK_URL),
        ("here", EXTERNAL_LINK),
        ("http://lucene.apache.org/java/docs/index.html?b=c",
         EXTERNAL_LINK_URL),
        ("here", EXTERNAL_LINK),
        ("https://lucene.apache.org/java/docs/index.html?b=c",
         EXTERNAL_LINK_URL),
        ("here", EXTERNAL_LINK)]


UNTOKS = frozenset([CATEGORY, ITALICS])
LUCENE1133 = ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
              "[[link there]] ''italics here'' something "
              "''more italics'' [[Category:h   i   j]]")


def test_lucene1133():
    # TOKENS_ONLY is identical regardless of untokenized types
    check_link_phrases(UNTOKS)
    toks = wikipedia_tokens(LUCENE1133, UNTOKENIZED_ONLY, UNTOKS)
    assert [t.text for t in toks] == [
        "a b c d", "e f g", "link", "here", "link", "there",
        "italics here", "something", "more italics", "h   i   j"]
    assert [t.start for t in toks] == \
        [11, 32, 42, 47, 56, 61, 71, 86, 98, 124]
    assert [t.end for t in toks] == \
        [18, 37, 46, 51, 60, 66, 83, 95, 110, 133]
    assert [t.position_increment for t in toks] == [1] * 10


def test_both():
    toks = wikipedia_tokens(LUCENE1133, BOTH, UNTOKS)
    assert [t.text for t in toks] == [
        "a b c d", "a", "b", "c", "d", "e f g", "e", "f", "g",
        "link", "here", "link", "there", "italics here", "italics",
        "here", "something", "more italics", "more", "italics",
        "h   i   j", "h", "i", "j"]
    assert [t.start for t in toks] == [
        11, 11, 13, 15, 17, 32, 32, 34, 36, 42, 47, 56, 61, 71, 71,
        79, 86, 98, 98, 103, 124, 124, 128, 132]
    assert [t.end for t in toks] == [
        18, 12, 14, 16, 18, 37, 33, 35, 37, 46, 51, 60, 66, 83, 78,
        83, 95, 110, 102, 110, 133, 125, 129, 133]
    assert [t.position_increment for t in toks] == [
        1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1,
        1, 0, 1, 1]
    assert [t.flags for t in toks] == [
        UNTOKENIZED_TOKEN_FLAG, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG,
        0, 0, 0, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0,
        UNTOKENIZED_TOKEN_FLAG, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0,
        0]
